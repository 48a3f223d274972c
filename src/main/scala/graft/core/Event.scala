package graft.core

import scala.collection.mutable.ListBuffer

/** Reified event — the golden-test / debugging representation of one Plate
  * call (reference test/Event.scala:26-44).
  */
sealed trait Event

object Event {
  case object Nul extends Event
  case object Fls extends Event
  case object Tru extends Event
  case object Map extends Event
  case object Arr extends Event
  final case class Num(s: String, decIdx: Int, expIdx: Int) extends Event
  final case class Str(s: String) extends Event
  final case class NestMap(pathComponent: String) extends Event
  case object NestArr extends Event
  final case class NestMeta(pathComponent: String) extends Event
  case object Unnest extends Event
  case object FinishRow extends Event
  final case class Skipped(bytes: Int) extends Event

  /** Replay a reified event list into any plate (test oracle helper,
    * reference ReifiedTerminalPlate.scala:117-135). Returns the plate's
    * terminal batch.
    */
  def drive[A](events: Seq[Event], plate: Plate[A]): A = {
    events.foreach {
      case Nul               => plate.nul()
      case Fls               => plate.fls()
      case Tru               => plate.tru()
      case Map               => plate.map()
      case Arr               => plate.arr()
      case Num(s, d, e)      => plate.num(s, d, e)
      case Str(s)            => plate.str(s)
      case NestMap(p)        => plate.nestMap(p)
      case NestArr           => plate.nestArr()
      case NestMeta(p)       => plate.nestMeta(p)
      case Unnest            => plate.unnest()
      case FinishRow         => plate.finishRow()
      case Skipped(n)        => plate.skipped(n)
    }
    plate.finishBatch(true)
  }
}

/** Accumulate events into a `List[Event]` — the golden-output test plate
  * (reference ReifiedTerminalPlate.scala:32-135). Each `finishBatch` drains
  * the accumulated prefix, so per-chunk absorb results carry only the events
  * produced by that chunk.
  */
final class ReifiedPlate(recordSkips: Boolean = true) extends Plate[List[Event]] {
  private[this] val buf = new ListBuffer[Event]

  def nul(): Signal = { buf += Event.Nul; Signal.Continue }
  def fls(): Signal = { buf += Event.Fls; Signal.Continue }
  def tru(): Signal = { buf += Event.Tru; Signal.Continue }
  def map(): Signal = { buf += Event.Map; Signal.Continue }
  def arr(): Signal = { buf += Event.Arr; Signal.Continue }
  def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
    buf += Event.Num(s.toString, decIdx, expIdx); Signal.Continue
  }
  def str(s: CharSequence): Signal = { buf += Event.Str(s.toString); Signal.Continue }
  def nestMap(pathComponent: CharSequence): Signal = {
    buf += Event.NestMap(pathComponent.toString); Signal.Continue
  }
  def nestArr(): Signal = { buf += Event.NestArr; Signal.Continue }
  def nestMeta(pathComponent: CharSequence): Signal = {
    buf += Event.NestMeta(pathComponent.toString); Signal.Continue
  }
  def unnest(): Signal = { buf += Event.Unnest; Signal.Continue }
  def finishRow(): Unit = buf += Event.FinishRow
  def finishBatch(terminal: Boolean): List[Event] = {
    val out = buf.toList
    buf.clear()
    out
  }
  def skipped(bytes: Int): Unit = if (recordSkips) buf += Event.Skipped(bytes)
}
