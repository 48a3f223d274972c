package graft.core

import graft.core.Event._
import graft.testkit.{EventGens, ParserHarness}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** The published test kit (graft.testkit — the reference's
  * `tectonic-test` counterpart) consumed exactly as a downstream Plate
  * author would: golden `parsesAs` matchers, the `drivesTo` law harness
  * over [[EventGens]] streams, and the framework-agnostic Left-diff
  * contract.
  */
class TestkitSpec extends AnyFunSuite {

  test("parsesAs: golden match passes, divergence reports the first index") {
    assert(ParserHarness.parsesAs("""{"a": 1}""")(
      NestMap("a"), Num("1", -1, -1), Unnest, FinishRow).isRight)
    val miss = ParserHarness.parsesAs("""{"a": 1}""")(
      NestMap("a"), Num("2", -1, -1), Unnest, FinishRow)
    assert(miss.isLeft)
    assert(miss.swap.getOrElse("").contains("diverge at index 1"), miss)
  }

  test("parsesAs: parse failures surface as Left, not a thrown error") {
    val r = ParserHarness.parsesAs("""{"a": """)()
    assert(r.isLeft && r.swap.getOrElse("").contains("parse"), r)
  }

  test("csvParsesAs: golden match over a csv row") {
    assert(ParserHarness.csvParsesAs("a,b\r\n1,x\r\n")(
      NestMap("a"), Str("1"), Unnest, NestMap("b"), Str("x"), Unnest,
      FinishRow).isRight)
  }

  test("drivesTo + EventGens: a custom counting plate obeys its law on arbitrary streams") {
    // the downstream-author shape: a tiny custom plate, law-checked over
    // generated streams instead of hand fixtures
    final class RowCounter extends Plate[Long] {
      private var n = 0L
      def nul() = Signal.Continue
      def fls() = Signal.Continue
      def tru() = Signal.Continue
      def map() = Signal.Continue
      def arr() = Signal.Continue
      def num(s: CharSequence, decIdx: Int, expIdx: Int) = Signal.Continue
      def str(s: CharSequence) = Signal.Continue
      def nestMap(p: CharSequence) = Signal.Continue
      def nestArr() = Signal.Continue
      def nestMeta(p: CharSequence) = Signal.Continue
      def unnest() = Signal.Continue
      def finishRow(): Unit = n += 1
      def skipped(bytes: Int): Unit = ()
      def finishBatch(terminal: Boolean): Long = n
    }
    val streams = Gen.listOfN(50, EventGens.genStream()).sample.get
    streams.foreach { events =>
      val want = events.count(_ == FinishRow).toLong
      assert(ParserHarness.drivesTo(events, () => new RowCounter)(want).isRight,
        s"row count law failed for $events")
    }
  }

  test("EventGens streams are structurally balanced (nest/unnest pair)") {
    val streams = Gen.listOfN(100, EventGens.genStream()).sample.get
    streams.foreach { events =>
      val depth = events.foldLeft(0) {
        case (d, NestMap(_) | NestArr | NestMeta(_)) => d + 1
        case (d, Unnest) => { assert(d > 0, s"unnest at depth 0 in $events"); d - 1 }
        case (d, _) => d
      }
      assert(depth == 0, s"unbalanced stream: $events")
    }
  }
}
