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

  // generators come from the published test kit, consumed here exactly
  // as a downstream Plate author would (graft.testkit.EventGens)
  private val genStream: Gen[List[Event]] = graft.testkit.EventGens.genStream()

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
