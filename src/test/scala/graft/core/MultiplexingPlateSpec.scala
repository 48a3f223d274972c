package graft.core

import org.scalatest.funsuite.AnyFunSuite

import Event._

/** MultiplexingPlate tee semantics + Signal.and combination (reference
  * MultiplexingPlateSpecs.scala:27-182).
  */
class MultiplexingPlateSpec extends AnyFunSuite {

  private class SignallingPlate(sig: Signal) extends Plate[Unit] {
    val seen = scala.collection.mutable.ListBuffer[Event]()
    var batches = 0
    var skippedBytes = 0
    def nul(): Signal = { seen += Nul; sig }
    def fls(): Signal = { seen += Fls; sig }
    def tru(): Signal = { seen += Tru; sig }
    def map(): Signal = { seen += Map; sig }
    def arr(): Signal = { seen += Arr; sig }
    def num(s: CharSequence, d: Int, e: Int): Signal = { seen += Num(s.toString, d, e); sig }
    def str(s: CharSequence): Signal = { seen += Str(s.toString); sig }
    def nestMap(p: CharSequence): Signal = { seen += NestMap(p.toString); sig }
    def nestArr(): Signal = { seen += NestArr; sig }
    def nestMeta(p: CharSequence): Signal = { seen += NestMeta(p.toString); sig }
    def unnest(): Signal = { seen += Unnest; sig }
    def finishRow(): Unit = seen += FinishRow
    def finishBatch(terminal: Boolean): Unit = batches += 1
    def skipped(bytes: Int): Unit = skippedBytes += bytes
  }

  private val events = List(
    NestMap("k"), Num("1", -1, -1), Unnest, NestArr, Str("s"), Unnest,
    NestMeta("m"), Tru, Unnest, Nul, Fls, Map, Arr, FinishRow)

  test("both plates observe every event; main's batch result survives") {
    val main = new ReifiedPlate
    val side = new SignallingPlate(Signal.Continue)
    val mux = new MultiplexingPlate[List[Event]](main, side)
    val got = Event.drive(events, mux)
    assert(got == events)
    assert(side.seen.toList == events)
    assert(side.batches == 1)
  }

  test("skipped bytes reach both plates") {
    val main = new SignallingPlate(Signal.Continue)
    val side = new SignallingPlate(Signal.Continue)
    val mux = new MultiplexingPlate[Unit](
      new DelegatingPlate[Unit](main), side)
    mux.skipped(42)
    assert(main.skippedBytes == 42)
    assert(side.skippedBytes == 42)
  }

  test("signals combine with Signal.and") {
    def mux(m: Signal, s: Signal): Signal = {
      val plate = new MultiplexingPlate[Unit](new SignallingPlate(m), new SignallingPlate(s))
      plate.str("x")
    }
    assert(mux(Signal.Continue, Signal.Continue) == Signal.Continue)
    assert(mux(Signal.SkipColumn, Signal.SkipColumn) == Signal.SkipColumn)
    assert(mux(Signal.SkipColumn, Signal.SkipRow) == Signal.SkipColumn)
    assert(mux(Signal.SkipColumn, Signal.Continue) == Signal.Continue)
    assert(mux(Signal.BreakBatch, Signal.Continue) == Signal.Continue)
    assert(mux(Signal.Terminate, Signal.Terminate) == Signal.Terminate)
  }

  test("a pushdown side plate cannot force a skip on an unwilling main") {
    // main wants the data (Continue), side wants SkipColumn -> Continue wins
    val main = new ReifiedPlate
    val side = new SignallingPlate(Signal.SkipColumn)
    val mux = new MultiplexingPlate[List[Event]](main, side)
    assert(mux.nestMap("a") == Signal.Continue)
  }
}
