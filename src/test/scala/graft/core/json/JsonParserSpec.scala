package graft.core.json

import graft.core._
import graft.testkit.ParserHarness._
import org.scalatest.funsuite.AnyFunSuite

import Event._

/** Golden event-stream tests for the incremental JSON parser — semantics
  * mirror the reference's ParserSpecs (scalars, nesting, modes, async
  * chunking, errors); expectations re-derived for this implementation.
  */
class JsonParserSpec extends AnyFunSuite {

  // ----------------------------------------------------------- scalars

  test("null")  { assert(jsonEvents("null") == List(Nul, FinishRow)) }
  test("false") { assert(jsonEvents("false") == List(Fls, FinishRow)) }
  test("true")  { assert(jsonEvents("true") == List(Tru, FinishRow)) }
  test("empty object is the map() scalar") {
    assert(jsonEvents("{}") == List(Map, FinishRow))
  }
  test("empty array is the arr() scalar") {
    assert(jsonEvents("[]") == List(Arr, FinishRow))
  }

  test("integral number: no dec/exp indices") {
    assert(jsonEvents("42") == List(Num("42", -1, -1), FinishRow))
  }
  test("decimal number records decIdx") {
    assert(jsonEvents("3.1415") == List(Num("3.1415", 1, -1), FinishRow))
  }
  test("exponential number records decIdx and expIdx") {
    assert(jsonEvents("2.99792458e8") == List(Num("2.99792458e8", 1, 10), FinishRow))
  }
  test("negative exponent and capital E") {
    assert(jsonEvents("-1.5E-3") == List(Num("-1.5E-3", 2, 4), FinishRow))
  }
  test("zero and negative zero") {
    assert(jsonEvents("0") == List(Num("0", -1, -1), FinishRow))
    assert(jsonEvents("-0.5") == List(Num("-0.5", 2, -1), FinishRow))
  }

  test("string") {
    assert(jsonEvents("\"quick brown fox\"") == List(Str("quick brown fox"), FinishRow))
  }
  test("string escapes") {
    assert(jsonEvents("\"a\\n\\t\\\"b\\\\c\\/d\"") == List(Str("a\n\t\"b\\c/d"), FinishRow))
  }
  test("unicode escape and surrogate pair") {
    assert(jsonEvents("\"\\u00e9\"") == List(Str("\u00e9"), FinishRow))
    assert(jsonEvents("\"\\ud83d\\ude00\"") == List(Str("\ud83d\ude00"), FinishRow))
  }
  test("raw UTF-8 multibyte content") {
    assert(jsonEvents("\"caf\u00e9 \u65e5\u672c\u8a9e \ud83d\ude00\"") ==
      List(Str("caf\u00e9 \u65e5\u672c\u8a9e \ud83d\ude00"), FinishRow))
  }

  // ----------------------------------------------------------- structure

  test("map with two keys") {
    assert(jsonEvents("""{"a":123, "b": false}""") == List(
      NestMap("a"), Num("123", -1, -1), Unnest,
      NestMap("b"), Fls, Unnest, FinishRow))
  }

  test("map within a map") {
    assert(jsonEvents("""{"a": {"b": null }   }""") == List(
      NestMap("a"), NestMap("b"), Nul, Unnest, Unnest, FinishRow))
  }

  test("array with four values") {
    assert(jsonEvents("""["a", 123, "b", false]""") == List(
      NestArr, Str("a"), Unnest,
      NestArr, Num("123", -1, -1), Unnest,
      NestArr, Str("b"), Unnest,
      NestArr, Fls, Unnest, FinishRow))
  }

  test("heterogeneous nesting") {
    assert(jsonEvents("""{"a": [1, {"b": []}], "c": {}}""") == List(
      NestMap("a"),
      NestArr, Num("1", -1, -1), Unnest,
      NestArr, NestMap("b"), Arr, Unnest, Unnest,
      Unnest, // closes the "a" entry
      NestMap("c"), Map, Unnest,
      FinishRow))
  }

  // ------------------------------------------------------------- framing

  test("two rows of scalars (ValueStream)") {
    assert(jsonEvents("12 true") == List(Num("12", -1, -1), FinishRow, Tru, FinishRow))
  }

  test("two rows of objects (ValueStream)") {
    assert(jsonEvents("""{"a": 3.14} {"b": false}""") == List(
      NestMap("a"), Num("3.14", 1, -1), Unnest, FinishRow,
      NestMap("b"), Fls, Unnest, FinishRow))
  }

  test("newline-delimited rows") {
    assert(jsonEvents("{\"a\":1}\n{\"a\":2}\n") == List(
      NestMap("a"), Num("1", -1, -1), Unnest, FinishRow,
      NestMap("a"), Num("2", -1, -1), Unnest, FinishRow))
  }

  test("empty input is zero rows (ValueStream)") {
    assert(jsonEvents("") == Nil)
    assert(jsonEvents("   \n  ") == Nil)
  }

  test("UnwrapArray: elements become rows") {
    assert(jsonEvents("""[1, "two", {"c": 3}]""", JsonParser.UnwrapArray) == List(
      Num("1", -1, -1), FinishRow,
      Str("two"), FinishRow,
      NestMap("c"), Num("3", -1, -1), Unnest, FinishRow))
  }

  test("UnwrapArray: empty array is zero rows") {
    assert(jsonEvents("[]", JsonParser.UnwrapArray) == Nil)
    assert(jsonEvents("  [  ]  ", JsonParser.UnwrapArray) == Nil)
  }

  test("SingleValue: one value, one row") {
    assert(jsonEvents("""{"a": 1}""", JsonParser.SingleValue) == List(
      NestMap("a"), Num("1", -1, -1), Unnest, FinishRow))
  }

  test("byte-order mark is stripped once") {
    val bytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "{}".getBytes("UTF-8")
    val p = new JsonParser(new ReifiedPlate, JsonParser.ValueStream)
    val a = p.absorb(bytes).unsafeGet
    val b = p.finish().unsafeGet
    assert((a ++ b) == List(Map, FinishRow))
  }

  // -------------------------------------------------------------- errors

  test("second byte-order mark fails") {
    val bytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte, '{'.toByte,
      0xEF.toByte, 0xBB.toByte, 0xBF.toByte, '}'.toByte)
    val p = new JsonParser(new ReifiedPlate, JsonParser.ValueStream)
    val r = ParseResult.combine(p.absorb(bytes), p.finish())(
      (_: List[Event]) ++ (_: List[Event]))
    assert(r.isInstanceOf[ParseResult.Failure])
  }

  test("invalid literal fails") {
    assert(jsonError("treu").isInstanceOf[ParseException])
    assert(jsonError("nully").isInstanceOf[ParseException])
  }

  test("unclosed structures fail at finish") {
    assert(jsonError("""{"a": 1""").isInstanceOf[IncompleteParseException])
    assert(jsonError("[1, 2").isInstanceOf[IncompleteParseException])
    assert(jsonError("\"abc").isInstanceOf[IncompleteParseException])
  }

  test("SingleValue rejects trailing input and empty input") {
    assert(jsonError("1 2", JsonParser.SingleValue).isInstanceOf[ParseException])
    assert(jsonError("", JsonParser.SingleValue).isInstanceOf[IncompleteParseException])
  }

  test("UnwrapArray rejects trailing input after close") {
    assert(jsonError("[1] 2", JsonParser.UnwrapArray).isInstanceOf[ParseException])
  }

  test("mismatched container close fails (outside skips)") {
    assert(jsonError("""{"a": 1]""").isInstanceOf[ParseException])
    assert(jsonError("[1}").isInstanceOf[ParseException])
  }

  test("bad numbers fail") {
    assert(jsonError("[01]").isInstanceOf[ParseException]) // leading zero
    assert(jsonError("[1.]").isInstanceOf[ParseException])
    assert(jsonError("[1e]").isInstanceOf[ParseException])
    assert(jsonError("[-]").isInstanceOf[ParseException])
  }

  test("error positions carry line and column") {
    val e = jsonError("{\"a\": 1,\n  !}").asInstanceOf[ParseException]
    assert(e.line == 2)
    assert(e.col == 3)
  }

  test("error positions stay exact across zero-copy whole-array absorbs") {
    // each absorb(arr) is drained at a row boundary -> every chunk takes
    // the borrowed (zero-copy) path; line/col bases must advance exactly
    val plate = new ReifiedPlate
    val p = new JsonParser(plate, JsonParser.ValueStream)
    p.absorb("{\"a\": 1}\n{\"b\": 2}\n".getBytes("UTF-8")).unsafeGet
    p.absorb("{\"c\": 3}\n".getBytes("UTF-8")).unsafeGet
    val r = p.absorb("{\"d\":\n  !}".getBytes("UTF-8"))
    val e = r.asInstanceOf[ParseResult.Failure].error.asInstanceOf[ParseException]
    assert(e.line == 5, s"line ${e.line}")
    assert(e.col == 3, s"col ${e.col}")
    assert(e.index == 9 + 9 + 9 + 8, s"index ${e.index}")
  }

  test("zero-copy absorb keeps a partial-token tail across chunks") {
    val plate = new ReifiedPlate
    val p = new JsonParser(plate, JsonParser.ValueStream)
    // first chunk ends mid-string: the tail must be copied out of the
    // borrowed array before absorb returns (the caller may reuse it)
    val chunk1 = "{\"k\": \"par".getBytes("UTF-8")
    val b1 = p.absorb(chunk1).unsafeGet
    java.util.Arrays.fill(chunk1, 'Z'.toByte) // caller clobbers its buffer
    val b2 = p.absorb("tial\"}".getBytes("UTF-8")).unsafeGet
    val events = b1 ++ b2 ++ p.finish().unsafeGet
    import graft.core.Event._
    assert(events.contains(Str("partial")), events.toString)
  }

  // ----------------------------------------------------------- chunking

  test("every split point yields identical events (object row)") {
    everySplitMatches("""{"a": 3.14, "bb": [true, null, "x\ny"], "c": {"d": 1e-2}}""")
  }

  test("every split point yields identical events (scalar stream)") {
    everySplitMatches("12 true \"s\" null 3.5e2")
  }

  test("every split point yields identical events (UnwrapArray)") {
    everySplitMatches("""[{"a": 1}, 2, "three", [4]]""", JsonParser.UnwrapArray)
  }

  test("every split point yields identical events (unicode string)") {
    everySplitMatches("\"caf\u00e9 \\u00e9 \ud83d\ude00\" 1")
  }

  test("per-chunk batches surface incrementally") {
    val chunks = jsonChunked(Seq("""{"a": 1""", """2, "b": 3}"""))
    assert(chunks(0) == List(NestMap("a")))
    assert(chunks(1) == List(Num("12", -1, -1), Unnest, NestMap("b"),
      Num("3", -1, -1), Unnest, FinishRow))
    assert(chunks(2) == Nil)
  }

  test("number completing exactly at EOF") {
    val p = new JsonParser(new ReifiedPlate, JsonParser.ValueStream)
    assert(p.absorb("42").unsafeGet == Nil) // might continue: not yet emitted
    assert(p.finish().unsafeGet == List(Num("42", -1, -1), FinishRow))
  }

  // ------------------------------------------------------ memory bounds

  test("a long stream of small rows parses in bounded memory") {
    val p = new JsonParser(new NullPlate().mapDelegate(_ => ()), JsonParser.ValueStream)
    val row = """{"abc": 123, "def": "ghijklmnop"}""" + "\n"
    val chunk = row * 64
    var i = 0
    while (i < 2048) { p.absorb(chunk); i += 1 } // ~4.3 MB total
    p.finish()
    // compaction keeps the buffer near the 1 MiB threshold, not input-sized
    assert(p.bufferCapacity <= (4 << 20), s"buffer grew to ${p.bufferCapacity}")
  }
}
