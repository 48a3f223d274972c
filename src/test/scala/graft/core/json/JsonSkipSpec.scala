package graft.core.json

import graft.core._
import graft.testkit.ParserHarness._
import org.scalatest.funsuite.AnyFunSuite

import Event._

/** SkipColumn / SkipRow / BreakBatch / Terminate pushdown behavior,
  * including suspension mid-skip across chunk boundaries (semantics of
  * reference ParserSpecs.scala:273-368, 405-507; byte counts are this
  * implementation's own accounting: value bytes incl. leading whitespace,
  * excl. delimiters).
  */
class JsonSkipSpec extends AnyFunSuite {

  private def keep(key: String): EventPlate => EventPlate = targetMask(Right(key))
  private def keepIdx(i: Int): EventPlate => EventPlate = targetMask(Left(i))

  test("skip .a and .c in {a, b, c}") {
    val events = jsonEvents("""{ "a": 42, "b": "hi", "c": true }""", wrap = keep("b"))
    assert(events == List(
      Skipped(3), NestMap("b"), Str("hi"), Unnest, Skipped(5), FinishRow))
  }

  test("skip nested structure wholesale") {
    val events = jsonEvents(
      """{ "a": { "c": [1, 2, 3], "d": { "e": null } }, "b": "hi" }""",
      wrap = keep("b"))
    assert(events == List(
      Skipped(39), NestMap("b"), Str("hi"), Unnest, FinishRow))
  }

  test("structure inside skipped strings is ignored") {
    val events = jsonEvents("""{ "a": "foo}", "b": "hi" }""", wrap = keep("b"))
    assert(events == List(
      Skipped(7), NestMap("b"), Str("hi"), Unnest, FinishRow))
  }

  test("mismatched brackets inside skipped columns are not errors") {
    // error-check elision: the skipped value only balances bracket COUNT —
    // "[1, 2}" closes the skipped array with a brace and still parses
    val events = jsonEvents("""{ "a": [1, 2}, "b": 3 }""", wrap = keep("b"))
    assert(events == List(
      Skipped(7), NestMap("b"), Num("3", -1, -1), Unnest, FinishRow))
  }

  test("retain only index 1 of an array") {
    val events = jsonEvents("""[42, "hi", true, null]""", wrap = keepIdx(1))
    // whitespace after ',' is consumed before nestArr fires, so the skip
    // accounting covers exactly the value bytes here
    assert(events == List(
      Skipped(2), NestArr, Str("hi"), Unnest, Skipped(4), Skipped(4), FinishRow))
  }

  test("skip suspends and resumes across a chunk boundary") {
    val plate = targetMask(Right("b"))(new ReifiedPlate)
    val p = new JsonParser(plate, JsonParser.ValueStream)
    val first = p.absorb("""{ "a": 4""").unsafeGet
    val second = p.absorb("""2, "b": "hi" }""").unsafeGet
    val third = p.finish().unsafeGet
    assert(first == List(Skipped(2)))  // " 4" consumed inside the skip
    assert(second == List(Skipped(1), NestMap("b"), Str("hi"), Unnest, FinishRow))
    assert(third == Nil)
  }

  test("every split point yields identical total skip accounting") {
    val input = """{ "a": { "x": [1, {"y": "}"}] }, "b": 7, "c": "z" }"""
    val whole = jsonEvents(input, wrap = keep("b"))
    val wholeSkipped = whole.collect { case Skipped(n) => n }.sum
    val wholeClean = whole.filterNot(_.isInstanceOf[Skipped])
    val bytes = input.getBytes("UTF-8")
    (0 to bytes.length).foreach { i =>
      val p = new JsonParser(targetMask(Right("b"))(new ReifiedPlate), JsonParser.ValueStream)
      val merged =
        p.absorb(bytes.slice(0, i)).unsafeGet ++
        p.absorb(bytes.slice(i, bytes.length)).unsafeGet ++
        p.finish().unsafeGet
      assert(merged.filterNot(_.isInstanceOf[Skipped]) == wholeClean, s"split $i")
      assert(merged.collect { case Skipped(n) => n }.sum == wholeSkipped, s"split $i")
    }
  }

  // ------------------------------------------------------------- SkipRow

  /** Keep only rows whose "k" field is not 0 (predicate pushdown shape). */
  private def rowFilter(delegate: EventPlate): EventPlate =
    new DelegatingPlate[List[Event]](delegate) {
      override def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
        val sig = super.num(s, decIdx, expIdx)
        if (s.toString == "0") Signal.SkipRow else sig
      }
    }

  test("SkipRow skips to the end of the row and suppresses finishRow") {
    val events = jsonEvents(
      """{"k": 1, "v": "a"} {"k": 0, "v": "b"} {"k": 2, "v": "c"}""",
      wrap = rowFilter)
    // row 2's events stop at its k=0; its finishRow is suppressed
    assert(events == List(
      NestMap("k"), Num("1", -1, -1), Unnest, NestMap("v"), Str("a"), Unnest, FinishRow,
      NestMap("k"), Num("0", -1, -1), Skipped(11),
      NestMap("k"), Num("2", -1, -1), Unnest, NestMap("v"), Str("c"), Unnest, FinishRow))
  }

  test("SkipRow works for UnwrapArray elements") {
    val events = jsonEvents(
      """[{"k": 1}, {"k": 0}, {"k": 3}]""",
      JsonParser.UnwrapArray,
      wrap = rowFilter)
    assert(events == List(
      NestMap("k"), Num("1", -1, -1), Unnest, FinishRow,
      NestMap("k"), Num("0", -1, -1), Skipped(1),
      NestMap("k"), Num("3", -1, -1), Unnest, FinishRow))
  }

  test("SkipRow across a chunk boundary (mid-string suspension)") {
    val plate = rowFilter(new ReifiedPlate)
    val p = new JsonParser(plate, JsonParser.ValueStream)
    val a = p.absorb("""{"k": 0, "tail""").unsafeGet
    val b = p.absorb(""" end": ["structure"]} {"k": 5}""").unsafeGet
    val c = p.finish().unsafeGet
    assert((a ++ b ++ c).filterNot(_.isInstanceOf[Skipped]) == List(
      NestMap("k"), Num("0", -1, -1),
      NestMap("k"), Num("5", -1, -1), Unnest, FinishRow))
  }

  test("SkipRow on a bare top-level scalar suppresses finishRow") {
    // the scalar IS the row: no skipping needed, but finishRow must not fire
    val events = jsonEvents("1 0 2", wrap = rowFilter)
    assert(events == List(
      Num("1", -1, -1), FinishRow,
      Num("0", -1, -1),
      Num("2", -1, -1), FinishRow))
  }

  test("SkipRow on a bare scalar UnwrapArray element suppresses finishRow") {
    val events = jsonEvents("[1, 0, 3]", JsonParser.UnwrapArray, wrap = rowFilter)
    assert(events == List(
      Num("1", -1, -1), FinishRow,
      Num("0", -1, -1),
      Num("3", -1, -1), FinishRow))
  }

  test("SkipRow on a bare string row suppresses finishRow") {
    val dropB = (delegate: EventPlate) =>
      new DelegatingPlate[List[Event]](delegate) {
        override def str(s: CharSequence): Signal = {
          super.str(s)
          if (s.toString == "b") Signal.SkipRow else Signal.Continue
        }
      }
    val events = jsonEvents("\"a\" \"b\" \"c\"", wrap = dropB)
    assert(events == List(Str("a"), FinishRow, Str("b"), Str("c"), FinishRow))
  }

  // ---------------------------------------------------------- BreakBatch

  /** Break the batch after every row (element-by-element abbreviation). */
  private class BreakEveryRow(delegate: EventPlate) extends DelegatingPlate[List[Event]](delegate) {
    override def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
      super.num(s, decIdx, expIdx)
      Signal.BreakBatch
    }
  }

  test("BreakBatch yields Partial at each row boundary, then continueParse resumes") {
    val p = new JsonParser(new BreakEveryRow(new ReifiedPlate), JsonParser.ValueStream)
    val r1 = p.absorb("1 2 3")
    assert(r1 == ParseResult.Partial(List(Num("1", -1, -1), FinishRow), 4))
    val r2 = p.continueParse()
    assert(r2 == ParseResult.Partial(List(Num("2", -1, -1), FinishRow), 2))
    val r3 = p.continueParse()
    // trailing "3" may still continue (more digits could follow)
    assert(r3 == ParseResult.Complete(Nil))
    val r4 = p.finish()
    assert(r4 == ParseResult.Partial(List(Num("3", -1, -1), FinishRow), 0))
    assert(p.continueParse() == ParseResult.Complete(Nil))
  }

  test("UnwrapArray BreakBatch element by element") {
    val p = new JsonParser(new BreakEveryRow(new ReifiedPlate), JsonParser.UnwrapArray)
    val r1 = p.absorb("[10, 20]")
    assert(r1 == ParseResult.Partial(List(Num("10", -1, -1), FinishRow), 5))
    val r2 = p.continueParse()
    assert(r2 == ParseResult.Partial(List(Num("20", -1, -1), FinishRow), 1))
    val r3 = p.continueParse()
    assert(r3 == ParseResult.Complete(Nil))
    assert(p.finish() == ParseResult.Complete(Nil))
  }

  // ----------------------------------------------------------- Terminate

  test("Terminate halts the parse with an error") {
    val plate = new DelegatingPlate[List[Event]](new ReifiedPlate) {
      override def str(s: CharSequence): Signal = Signal.Terminate
    }
    val p = new JsonParser(plate, JsonParser.ValueStream)
    val r = p.absorb("""{"a": "boom", "b": 1}""")
    assert(r.isInstanceOf[ParseResult.Failure])
  }
}
