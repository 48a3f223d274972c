package graft.core

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

private[core] object ParserControl {
  /** Control-flow sentinel: out of input mid-token (state checkpointed;
    * `curr` is rewound to the token start so the token re-parses when more
    * bytes arrive).
    */
  object NeedsInput extends Exception with scala.util.control.NoStackTrace
  /** Control-flow sentinel: BreakBatch honored at a row boundary. */
  object BatchBroken extends Exception with scala.util.control.NoStackTrace
}

/** Chunked byte intake shared by the incremental parsers (behavioral
  * counterpart of reference BaseParser.scala:57-181): a growable input
  * buffer with sliding-window compaction, UTF-8 BOM stripping, and the
  * absorb / continueParse / finish lifecycle. Subclasses implement
  * [[churnLoop]] (consume bytes, push plate events, throw
  * `ParserControl.NeedsInput` when starved mid-token) and [[endOk]]
  * (is the current state a legal end-of-input?).
  */
abstract class BaseParser[A](protected val plate: Plate[A]) {

  import ParserControl._

  protected var data = new Array[Byte](BaseParser.InitialBufferSize)
  protected var len = 0
  protected var curr = 0
  protected var consumedBase: Long = 0L // absolute offset of data(0)
  private[this] var linesBase = 0       // newlines discarded by compaction
  private[this] var colBase = 0         // col of data(0) if no newline since
  protected var done = false
  protected var finished = false
  private[this] var bomChecked = false

  /** Rewind point when input runs dry mid-token. */
  protected var tokenStart = 0

  /** Consume buffered bytes from `curr`, pushing plate events. Returns
    * normally when input is exhausted at a token boundary.
    */
  protected def churnLoop(): Unit

  /** Is the current parse state a legal end of input? */
  protected def endOk: Boolean

  // ================================================================== API

  /** Absorb one chunk of input; returns the plate's (non-terminal) batch. */
  def absorb(bytes: Array[Byte], off: Int, n: Int): ParseResult[A] = {
    if (finished) return alreadyFinished
    // zero-copy fast path: nothing buffered and the chunk starts at the
    // array base — parse straight from the caller's array (never retained
    // past this call; only the unconsumed tail is copied back in). Saves
    // the allocate-zero-copy cycle entirely for whole-buffer callers.
    if (off == 0 && curr == len) absorbBorrowed(bytes, n)
    else {
      append(bytes, off, n)
      churn()
    }
  }

  private[this] def absorbBorrowed(bytes: Array[Byte], n: Int): ParseResult[A] = {
    // retire the fully-consumed owned content (compaction bookkeeping,
    // no copy: curr == len means nothing remains)
    advanceBases(data, curr)
    consumedBase += curr
    len = 0; curr = 0; tokenStart = 0
    val owned = data
    data = bytes
    len = n
    try churn()
    finally {
      // keep only the unconsumed tail (partial token / undrained rows)
      val rem = len - curr
      advanceBases(data, curr)
      consumedBase += curr
      val dst =
        if (owned.length >= rem) owned
        else {
          var size = owned.length
          while (size < rem) size =
            if (size >= (Int.MaxValue >> 1)) Int.MaxValue else size << 1
          new Array[Byte](size)
        }
      System.arraycopy(data, curr, dst, 0, rem)
      data = dst
      len = rem
      curr = 0
      tokenStart = 0
    }
  }

  /** Advance the line/column bases past `to` consumed bytes of `b` —
    * the bookkeeping half of compaction, shared with the zero-copy path.
    */
  private[this] def advanceBases(b: Array[Byte], to: Int): Unit = {
    // SWAR newline count, 8 byte-lanes per step (this is a full re-walk of
    // every consumed byte purely for error-position bookkeeping — at
    // GB/s parse rates the byte-at-a-time loop was ~20% of the PRUNED
    // path's profile), then one short backward scan for the last newline
    var count = 0
    var i = 0
    val n8 = to - 7
    while (i < n8) {
      count += java.lang.Long.bitCount(
        Swar.zeros(Swar.readLongLE(b, i) ^ 0x0A0A0A0A0A0A0A0AL))
      i += 8
    }
    while (i < to) {
      if (b(i) == '\n') count += 1
      i += 1
    }
    linesBase += count
    if (count > 0) {
      var j = to - 1
      while (b(j) != '\n') j -= 1
      colBase = to - j - 1
    } else colBase += to
  }

  def absorb(bytes: Array[Byte]): ParseResult[A] = absorb(bytes, 0, bytes.length)
  def absorb(s: String): ParseResult[A] = absorb(s.getBytes(UTF_8))
  def absorb(buf: ByteBuffer): ParseResult[A] = {
    val arr = new Array[Byte](buf.remaining())
    buf.get(arr)
    absorb(arr)
  }

  /** Keep draining buffered bytes after a `Partial` result (BreakBatch). */
  def continueParse(): ParseResult[A] =
    if (finished) alreadyFinished else churn()

  /** Signal end of input and drain. The terminal batch is produced exactly
    * once; input ending mid-value yields `Failure(IncompleteParseException)`.
    */
  def finish(): ParseResult[A] = {
    done = true
    if (finished) alreadyFinished else churn()
  }

  private[this] def alreadyFinished: ParseResult[A] =
    ParseResult.Failure(new ParseException(
      "parser already finished", absAt(curr).toInt, lineAt(curr), colAt(curr)))

  // ============================================================ internals

  private[this] def churn(): ParseResult[A] =
    try {
      if (!bomChecked) checkBom()
      churnLoop()
      if (done) terminalResult()
      else ParseResult.Complete(plate.finishBatch(false))
    } catch {
      case NeedsInput =>
        if (done)
          ParseResult.Failure(new IncompleteParseException(
            s"unexpected end of input at offset ${absAt(len)}"))
        else {
          curr = tokenStart
          ParseResult.Complete(plate.finishBatch(false))
        }
      case BatchBroken =>
        ParseResult.Partial(plate.finishBatch(false), len - curr)
      case e: ParseException =>
        finished = true
        ParseResult.Failure(e)
    }

  private[this] def terminalResult(): ParseResult[A] =
    if (endOk) {
      finished = true
      ParseResult.Complete(plate.finishBatch(true))
    } else
      ParseResult.Failure(new IncompleteParseException(
        s"unexpected end of input at offset ${absAt(len)} (open structure)"))

  private[this] def append(bytes: Array[Byte], off: Int, n: Int): Unit = {
    // sliding-window compaction: discard the consumed prefix once it passes
    // the threshold, so unbounded streams parse in bounded memory
    if (curr >= BaseParser.CompactionThreshold) {
      var i = 0
      var nl = -1
      while (i < curr) {
        if (data(i) == '\n') { linesBase += 1; nl = i }
        i += 1
      }
      colBase = if (nl >= 0) curr - nl - 1 else colBase + curr
      System.arraycopy(data, curr, data, 0, len - curr)
      consumedBase += curr
      len -= curr
      tokenStart -= curr
      curr = 0
    }
    if (len + n > data.length) {
      var size = data.length
      while (size < len + n) size =
        if (size >= (Int.MaxValue >> 1)) Int.MaxValue else size << 1
      val next = new Array[Byte](size)
      System.arraycopy(data, 0, next, 0, len)
      data = next
    }
    System.arraycopy(bytes, off, data, len, n)
    len += n
  }

  private[this] def checkBom(): Unit = {
    if (consumedBase == 0 && curr == 0) {
      if (len >= 3) {
        if ((data(0) & 0xFF) == 0xEF) {
          if ((data(1) & 0xFF) == 0xBB && (data(2) & 0xFF) == 0xBF) curr = 3
          else die(0, "invalid UTF-8 BOM prefix")
        }
        bomChecked = true
      } else if (len > 0 && (data(0) & 0xFF) != 0xEF) {
        bomChecked = true
      } else if (len > 0 && done) {
        die(0, "truncated UTF-8 BOM")
      } else if (len > 0) {
        // 1-2 buffered bytes that might be a BOM prefix: wait for more input
        tokenStart = 0
        throw ParserControl.NeedsInput
      }
    } else bomChecked = true
  }

  // ------------------------------------------------------ error positions

  protected def absAt(i: Int): Long = consumedBase + i

  protected def lineAt(i: Int): Int = {
    var line = linesBase + 1
    var j = 0
    val limit = math.min(i, len)
    while (j < limit) { if (data(j) == '\n') line += 1; j += 1 }
    line
  }

  protected def colAt(i: Int): Int = {
    var j = math.min(i, len) - 1
    while (j >= 0 && data(j) != '\n') j -= 1
    if (j >= 0) i - j else colBase + i + 1
  }

  protected def die(i: Int, msg: String): Nothing =
    throw new ParseException(msg, absAt(i).toInt, lineAt(i), colAt(i))

  /** Current capacity of the internal byte buffer (memory-bound tests). */
  private[graft] def bufferCapacity: Int = data.length
}

object BaseParser {
  final val InitialBufferSize = 131072
  final val CompactionThreshold = 1 << 20
}
