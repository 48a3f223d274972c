package graft.core

/** Control signal returned by every event-carrying [[Plate]] method; the
  * consumer steers the producer (parser) with it. Signals are *hints* — a
  * producer may ignore them (cf. reference README "All signals are hints";
  * ordinals per reference core/src/main/scala/tectonic/Signal.scala:21-28).
  *
  *  - [[Signal.Continue]]   keep going
  *  - [[Signal.SkipColumn]] projection pushdown: byte-skip the value that
  *                          the triggering `nest*` introduced
  *  - [[Signal.SkipRow]]    predicate pushdown: efficiently scan to the end
  *                          of the current row
  *  - [[Signal.Terminate]]  halt the parse immediately with an error
  *  - [[Signal.BreakBatch]] abbreviate the current batch at the next row
  *                          boundary (backpressure / partial results)
  *  - [[Signal.FinishRow]]  saturation pushdown (beyond the reference's
  *                          signal set): every value the consumer needs
  *                          from this row has arrived — byte-skip the
  *                          remainder, then finish (KEEP) the row. A
  *                          consumer may only return it when its own frame
  *                          state is back at the row root. Note: fields
  *                          repeated AFTER saturation keep the first
  *                          occurrence (RFC 8259 leaves duplicate-name
  *                          behavior undefined; signals are hints).
  */
sealed abstract class Signal(final val ordinal: Int)

object Signal {
  case object Continue extends Signal(1)
  case object SkipColumn extends Signal(2)
  case object SkipRow extends Signal(-2)
  case object Terminate extends Signal(3)
  case object BreakBatch extends Signal(4)
  case object FinishRow extends Signal(5)

  /** Commutative meet of two consumers' wishes (used when one event stream
    * feeds several plates, cf. [[MultiplexingPlate]]): equal signals agree;
    * SkipColumn + SkipRow (the only ordinal pair summing to 0) degrade to
    * the narrower SkipColumn; any other disagreement degrades to Continue.
    * Semantics per reference Signal.scala:33-43 and its 16-pair spec.
    */
  def and(s1: Signal, s2: Signal): Signal =
    if (s1.ordinal == s2.ordinal) s1
    else if (s1.ordinal + s2.ordinal == 0) SkipColumn
    else Continue
}
