package graft.core

import scala.annotation.switch

/** Materialized event batch: 4-bit event tags packed 16-per-Long, with side
  * arrays for strings and ints (num indices / skip byte counts) — the
  * SoA-style "columnar" batch representation (behavioral counterpart of
  * reference EventCursor.scala:27-236, re-derived; positions here are a
  * single flat event index rather than a (word, shift) pair).
  *
  * Produced by [[ReplayPlate]]; re-drives any downstream [[Plate]] with
  * per-row iteration, mark/rewind, and batch windows.
  */
final class EventCursor private[core] (
    tags: Array[Long],
    strs: Array[CharSequence],
    ints: Array[Int],
    offset: Int,
    limit: Int,
    strsOffset: Int,
    intsOffset: Int) {

  import EventCursor._

  private[this] var cursor: Int = offset
  private[this] var strsCursor: Int = strsOffset
  private[this] var intsCursor: Int = intsOffset

  private[this] var cursorMark: Int = offset
  private[this] var strsMark: Int = strsOffset
  private[this] var intsMark: Int = intsOffset

  private[this] var cursorBatch: Int = offset
  private[this] var strsBatch: Int = strsOffset
  private[this] var intsBatch: Int = intsOffset

  /** Total number of events in this cursor's window. */
  def length: Int = limit - offset

  private[this] def hasNext: Boolean = cursor < limit

  private[this] def tagAt(idx: Int): Int =
    ((tags(idx >> 4) >>> ((idx & 15) << 2)) & 0xFL).toInt

  private[this] def nextStr(): CharSequence = {
    val s = strs(strsCursor); strsCursor += 1; s
  }
  private[this] def nextInt(): Int = {
    val i = ints(intsCursor); intsCursor += 1; i
  }

  /** Replay events up to (and including) the next row boundary into `plate`.
    * Does NOT call `plate.finishRow()` — [[drive]] does that. Returns
    * whether a row boundary, a batch boundary, or both were reached.
    */
  def nextRow(plate: Plate[_]): Int = {
    var sawRow = false
    var more = hasNext
    var looping = more
    while (looping && more) {
      val tag = tagAt(cursor)
      cursor += 1
      (tag: @switch) match {
        case TNul      => plate.nul()
        case TFls      => plate.fls()
        case TTru      => plate.tru()
        case TMap      => plate.map()
        case TArr      => plate.arr()
        case TNum      => plate.num(nextStr(), nextInt(), nextInt())
        case TStr      => plate.str(nextStr())
        case TNestMap  => plate.nestMap(nextStr())
        case TNestArr  => plate.nestArr()
        case TNestMeta => plate.nestMeta(nextStr())
        case TUnnest   => plate.unnest()
        case TSkipped  => plate.skipped(nextInt())
        case TFinishRow =>
          sawRow = true
          looping = false
          // a row boundary immediately followed by a batch boundary: consume both
          if (hasNext && tagAt(cursor) == TEndBatch) {
            cursor += 1
            more = false
          }
        case TEndBatch =>
          more = false
        case other =>
          throw new IllegalStateException(s"unrecognized event tag $other")
      }
      more = more && hasNext
    }
    if (sawRow && more) NextRow
    else if (!sawRow) NextBatch
    else NextRowAndBatch
  }

  /** Replay every remaining row in the current batch into `plate`, calling
    * `finishRow` after each complete row.
    */
  def drive(plate: Plate[_]): Unit = {
    if (length > 0) {
      var status = NextRow
      while (status == NextRow) {
        status = nextRow(plate)
        if (status != NextBatch) plate.finishRow()
      }
    }
  }

  /** Slide the batch window start to the cursor (also resets the mark).
    * Returns false at EOF.
    */
  def establishBatch(): Boolean =
    if (hasNext) {
      cursorBatch = cursor; strsBatch = strsCursor; intsBatch = intsCursor
      cursorMark = cursor; strsMark = strsCursor; intsMark = intsCursor
      true
    } else false

  /** Mark the cursor location for subsequent [[rewind]]. */
  def mark(): Unit = {
    cursorMark = cursor; strsMark = strsCursor; intsMark = intsCursor
  }

  /** Rewind to the last mark (stream start if never marked). Returns the
    * number of events rewound.
    */
  def rewind(): Int = {
    val d = cursor - cursorMark
    cursor = cursorMark; strsCursor = strsMark; intsCursor = intsMark
    d
  }

  /** Rewind to the start of the current batch window. */
  def reset(): Unit = {
    cursor = cursorBatch; strsCursor = strsBatch; intsCursor = intsBatch
  }

  /** Cheap copy sharing the underlying buffers; independent cursors. */
  def copy(): EventCursor =
    new EventCursor(tags, strs, ints, offset, limit, strsOffset, intsOffset)
}

object EventCursor {
  // 4-bit event tags
  final val TNul = 0x0
  final val TFls = 0x1
  final val TTru = 0x2
  final val TMap = 0x3
  final val TArr = 0x4
  final val TNum = 0x5
  final val TStr = 0x6
  final val TNestMap = 0x7
  final val TNestArr = 0x8
  final val TNestMeta = 0x9
  final val TUnnest = 0xA
  final val TFinishRow = 0xB
  final val TSkipped = 0xC
  final val TEndBatch = 0xD

  // nextRow statuses
  final val NextRow = 0
  final val NextBatch = 1
  final val NextRowAndBatch = 2
}

/** Record all plate events into packed buffers; `finishBatch(true)` yields
  * the [[EventCursor]] (reference ReplayPlate.scala:28-222). Buffers double
  * on demand; growing the tag buffer past `limit` longs throws
  * `IllegalStateException` (hard memory cap).
  *
  * @param limit       max size of the packed tag buffer, in Longs
  * @param retainSkips record `skipped(bytes)` events for replay
  */
final class ReplayPlate(limit: Int = Int.MaxValue, retainSkips: Boolean = false)
    extends Plate[Option[EventCursor]] {

  import EventCursor._

  private[this] var tags = new Array[Long](32)
  private[this] var eventCount = 0
  private[this] var strs = new Array[CharSequence](32)
  private[this] var strCount = 0
  private[this] var ints = new Array[Int](32)
  private[this] var intCount = 0

  private[this] def appendTag(tag: Int): Unit = {
    val word = eventCount >> 4
    if (word >= tags.length) {
      if (tags.length >= limit)
        throw new IllegalStateException(
          s"ReplayPlate growth limit exceeded: $limit longs")
      val next = new Array[Long](math.min(math.max(tags.length * 2, word + 1), math.max(limit, word + 1)))
      System.arraycopy(tags, 0, next, 0, tags.length)
      tags = next
    }
    val shift = (eventCount & 15) << 2
    tags(word) = tags(word) | (tag.toLong << shift)
    eventCount += 1
  }

  private[this] def appendStr(s: CharSequence): Unit = {
    if (strCount >= strs.length) {
      val next = new Array[CharSequence](strs.length * 2)
      System.arraycopy(strs, 0, next, 0, strs.length)
      strs = next
    }
    strs(strCount) = s.toString // defensive: parser may reuse its CharSequence
    strCount += 1
  }

  private[this] def appendInt(i: Int): Unit = {
    if (intCount >= ints.length) {
      val next = new Array[Int](ints.length * 2)
      System.arraycopy(ints, 0, next, 0, ints.length)
      ints = next
    }
    ints(intCount) = i
    intCount += 1
  }

  def nul(): Signal = { appendTag(TNul); Signal.Continue }
  def fls(): Signal = { appendTag(TFls); Signal.Continue }
  def tru(): Signal = { appendTag(TTru); Signal.Continue }
  def map(): Signal = { appendTag(TMap); Signal.Continue }
  def arr(): Signal = { appendTag(TArr); Signal.Continue }
  def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
    appendTag(TNum); appendStr(s); appendInt(decIdx); appendInt(expIdx); Signal.Continue
  }
  def str(s: CharSequence): Signal = { appendTag(TStr); appendStr(s); Signal.Continue }
  def nestMap(pathComponent: CharSequence): Signal = {
    appendTag(TNestMap); appendStr(pathComponent); Signal.Continue
  }
  def nestArr(): Signal = { appendTag(TNestArr); Signal.Continue }
  def nestMeta(pathComponent: CharSequence): Signal = {
    appendTag(TNestMeta); appendStr(pathComponent); Signal.Continue
  }
  def unnest(): Signal = { appendTag(TUnnest); Signal.Continue }
  def finishRow(): Unit = appendTag(TFinishRow)
  def skipped(bytes: Int): Unit =
    if (retainSkips) { appendTag(TSkipped); appendInt(bytes) }

  /** Inject an explicit batch boundary (micro-batch edge) into the stream. */
  def appendBatchBoundary(): Unit = appendTag(TEndBatch)

  def finishBatch(terminal: Boolean): Option[EventCursor] =
    if (terminal)
      Some(new EventCursor(tags, strs, ints, 0, eventCount, 0, 0))
    else
      None
}
