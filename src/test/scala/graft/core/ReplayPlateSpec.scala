package graft.core

import org.scalatest.funsuite.AnyFunSuite

import Event._

/** ReplayPlate / EventCursor behavior: record-replay identity, per-row
  * iteration statuses, mark/rewind, batch windows, copy (semantics of
  * reference ReplayPlateSpecs / EventCursor.scala:59-236).
  */
class ReplayPlateSpec extends AnyFunSuite {

  private val twoRows = List(
    NestMap("a"), Num("1", -1, -1), Unnest, FinishRow,
    NestMap("b"), Str("x"), Unnest, FinishRow)

  private def record(events: Seq[Event], retainSkips: Boolean = false): EventCursor =
    Event.drive(events, new ReplayPlate(retainSkips = retainSkips)).get

  test("record and replay a two-row stream") {
    val cursor = record(twoRows)
    assert(Event.drive(Nil, new ReifiedPlate) == Nil) // sanity
    val out = new ReifiedPlate
    cursor.drive(out)
    assert(out.finishBatch(true) == twoRows)
  }

  test("length counts events") {
    assert(record(twoRows).length == 8)
    assert(record(Nil).length == 0)
  }

  test("nextRow replays one row at a time with statuses") {
    // nextRow does NOT forward finishRow — drive() adds it per row
    val cursor = record(twoRows)
    val out = new ReifiedPlate
    assert(cursor.nextRow(out) == EventCursor.NextRow)
    assert(out.finishBatch(false) == twoRows.take(3))
    assert(cursor.nextRow(out) == EventCursor.NextRowAndBatch)
    assert(out.finishBatch(false) == twoRows.slice(4, 7))
    assert(cursor.nextRow(out) == EventCursor.NextBatch)
  }

  test("skipped events replay only when retained") {
    val events = List(Skipped(7), NestMap("b"), Tru, Unnest, FinishRow)
    val without = new ReifiedPlate
    record(events).drive(without)
    assert(without.finishBatch(true) == events.filterNot(_.isInstanceOf[Skipped]))

    val retained = new ReifiedPlate
    record(events, retainSkips = true).drive(retained)
    assert(retained.finishBatch(true) == events)
  }

  test("mark and rewind re-read a row") {
    val cursor = record(twoRows)
    val out = new ReifiedPlate
    cursor.mark()
    cursor.nextRow(out)
    assert(cursor.rewind() == 4) // incl. the row-boundary tag
    cursor.nextRow(out)
    assert(out.finishBatch(false) == twoRows.take(3) ++ twoRows.take(3))
  }

  test("rewind with no mark returns to stream start") {
    val cursor = record(twoRows)
    val out = new NullPlate().mapDelegate(_ => ())
    cursor.nextRow(out)
    cursor.nextRow(out)
    assert(cursor.rewind() == 8)
  }

  test("establishBatch slides the window; reset returns to it") {
    val cursor = record(twoRows)
    val out = new ReifiedPlate
    cursor.nextRow(out)
    out.finishBatch(false)
    assert(cursor.establishBatch())
    cursor.nextRow(out)
    assert(out.finishBatch(false) == twoRows.slice(4, 7))
    cursor.reset()
    cursor.nextRow(out)
    assert(out.finishBatch(false) == twoRows.slice(4, 7))
    assert(!cursor.establishBatch()) // at EOF
  }

  test("copy shares data but not cursors") {
    val cursor = record(twoRows)
    val out1 = new ReifiedPlate
    cursor.nextRow(out1)
    val dup = cursor.copy()
    val out2 = new ReifiedPlate
    dup.nextRow(out2)
    assert(out2.finishBatch(false) == twoRows.take(3)) // copy starts at offset
  }

  test("appendBatchBoundary splits replay into batches") {
    val p2 = new ReplayPlate
    Event.drive(twoRows.take(4), new DelegatingPlate[Option[EventCursor]](p2) {
      override def finishBatch(terminal: Boolean): Option[EventCursor] = None
    })
    p2.appendBatchBoundary()
    val cursor = Event.drive(twoRows.drop(4), p2).get
    val out = new ReifiedPlate
    assert(cursor.nextRow(out) == EventCursor.NextRowAndBatch)
    assert(out.finishBatch(false) == twoRows.take(3))
    assert(cursor.nextRow(out) == EventCursor.NextRowAndBatch)
    assert(out.finishBatch(false) == twoRows.slice(4, 7))
    assert(cursor.nextRow(out) == EventCursor.NextBatch)
  }

  test("growth limit throws IllegalStateException") {
    val plate = new ReplayPlate(limit = 32)
    intercept[IllegalStateException] {
      var i = 0
      while (i < 1000) { plate.nul(); i += 1 }
    }
  }

  test("nestMeta round-trips (protocol-only event)") {
    val events = List(NestMeta("m"), Str("v"), Unnest, Nul, FinishRow)
    val out = new ReifiedPlate
    record(events).drive(out)
    assert(out.finishBatch(true) == events)
  }
}
