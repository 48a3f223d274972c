package graft.core

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import Event._

/** Property-based round-trip: arbitrary well-formed event streams recorded
  * through ReplayPlate and replayed through EventCursor reproduce the
  * original stream exactly (10k cases, as reference ReplayPlateSpecs:56).
  */
object ReplayProps extends Properties("ReplayPlate") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10000)

  private val genKey: Gen[String] = Gen.alphaNumStr.map(_.take(8))

  private val genScalar: Gen[List[Event]] = Gen.frequency(
    2 -> Gen.const(List(Nul)),
    2 -> Gen.const(List(Fls)),
    2 -> Gen.const(List(Tru)),
    1 -> Gen.const(List(Map)),
    1 -> Gen.const(List(Arr)),
    3 -> Gen.choose(-1000000L, 1000000L).map(n => List(Num(n.toString, -1, -1))),
    2 -> Gen.choose(0, 9999).map(n => List(Num(s"$n.5", n.toString.length, -1))),
    3 -> Gen.asciiPrintableStr.map(s => List(Str(s.take(16)))),
    1 -> Gen.choose(1, 500).map(n => List(Skipped(n))))

  private def genValue(depth: Int): Gen[List[Event]] =
    if (depth >= 3) genScalar
    else Gen.frequency(
      5 -> genScalar,
      1 -> (for {
        n <- Gen.choose(1, 3)
        entries <- Gen.listOfN(n, for {
          k <- genKey
          v <- genValue(depth + 1)
        } yield NestMap(k) :: v ::: List(Unnest))
      } yield entries.flatten),
      1 -> (for {
        n <- Gen.choose(1, 3)
        elems <- Gen.listOfN(n, genValue(depth + 1).map(v => NestArr :: v ::: List(Unnest)))
      } yield elems.flatten),
      1 -> (for {
        k <- genKey
        v <- genValue(depth + 1)
      } yield NestMeta(k) :: v ::: List(Unnest)))

  private val genRow: Gen[List[Event]] = genValue(0).map(_ :+ FinishRow)

  private val genStream: Gen[List[Event]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, genRow).map(_.flatten))

  property("record/replay round-trips any event stream") = forAll(genStream) { events =>
    val cursor = Event.drive(events, new ReplayPlate(retainSkips = true)).get
    val out = new ReifiedPlate
    cursor.drive(out)
    out.finishBatch(true) == events
  }

  property("replay after copy is independent and identical") = forAll(genStream) { events =>
    val cursor = Event.drive(events, new ReplayPlate(retainSkips = true)).get
    val out1 = new ReifiedPlate
    cursor.drive(out1)
    val out2 = new ReifiedPlate
    cursor.copy().drive(out2)
    out1.finishBatch(true) == out2.finishBatch(true)
  }

  property("length equals event count") = forAll(genStream) { events =>
    Event.drive(events, new ReplayPlate(retainSkips = true)).get.length == events.size
  }

  property("rewind to start replays identically") = forAll(genStream) { events =>
    val cursor = Event.drive(events, new ReplayPlate(retainSkips = true)).get
    val out1 = new ReifiedPlate
    cursor.drive(out1)
    val first = out1.finishBatch(false)
    cursor.rewind()
    val out2 = new ReifiedPlate
    cursor.drive(out2)
    first == out2.finishBatch(false)
  }
}
