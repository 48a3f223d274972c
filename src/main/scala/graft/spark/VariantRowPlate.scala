package graft.spark

import graft.core.{Plate, Signal}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.types.variant.VariantBuilder
import org.apache.spark.unsafe.types.VariantVal

import scala.collection.mutable

/** Event-driven builder of ONE Spark VARIANT value: the shared state
  * machine behind open-typed row ingestion ([[VariantRowPlate]]) and
  * pushed-down sub-variant extraction ([[PathVariantPlate]]). One frame
  * per nest/unnest pair; a value slot morphs into an object/array writer
  * when its shape appears; the lazy `num` text feeds BigDecimal untouched
  * so EXACT decimal scale is preserved.
  */
private[spark] final class VariantCapture {
  private final val KSlot = 0
  private final val KObj = 1
  private final val KArr = 2

  private final class Frame(var kind: Int) {
    var start: Int = 0
    var fields: java.util.ArrayList[VariantBuilder.FieldEntry] = null
    var offsets: java.util.ArrayList[Integer] = null
  }

  private[this] val builder = new VariantBuilder(false)
  private[this] val stack = new mutable.ArrayDeque[Frame]
  stack.prepend(new Frame(KSlot)) // the captured value's top slot

  @inline private def top: Frame = stack.head

  private def asObj(): Frame = {
    val f = top
    if (f.kind == KSlot) {
      f.kind = KObj
      f.start = builder.getWritePos
      f.fields = new java.util.ArrayList[VariantBuilder.FieldEntry]
    }
    f
  }

  private def asArr(): Frame = {
    val f = top
    if (f.kind == KSlot) {
      f.kind = KArr
      f.start = builder.getWritePos
      f.offsets = new java.util.ArrayList[Integer]
    }
    f
  }

  def nestMap(pathComponent: CharSequence): Unit = {
    val f = asObj()
    val key = pathComponent.toString
    val id = builder.addKey(key)
    f.fields.add(new VariantBuilder.FieldEntry(key, id, builder.getWritePos - f.start))
    stack.prepend(new Frame(KSlot))
  }

  def nestArr(): Unit = {
    val f = asArr()
    f.offsets.add(builder.getWritePos - f.start)
    stack.prepend(new Frame(KSlot))
  }

  def unnest(): Unit = closeFrame(stack.removeHead())

  private def closeFrame(f: Frame): Unit = f.kind match {
    case KObj => builder.finishWritingObject(f.start, f.fields)
    case KArr => builder.finishWritingArray(f.start, f.offsets)
    case _    => () // scalar slot: value already appended (empty slot = null)
  }

  def nul(): Unit = builder.appendNull()
  def bool(v: Boolean): Unit = builder.appendBoolean(v)
  def emptyMap(): Unit =
    builder.finishWritingObject(builder.getWritePos,
      new java.util.ArrayList[VariantBuilder.FieldEntry])
  def emptyArr(): Unit =
    builder.finishWritingArray(builder.getWritePos, new java.util.ArrayList[Integer])
  def str(s: CharSequence): Unit = builder.appendString(s.toString)

  def num(s: CharSequence, decIdx: Int, expIdx: Int): Unit = {
    val text = s.toString
    if (decIdx == -2) {
      // non-numeric number tokens (NaN / ±Infinity) land as doubles —
      // the only variant type that can hold them
      builder.appendDouble(graft.spark.Conversions.specialDouble(text))
    } else if (decIdx < 0 && expIdx < 0) {
      try builder.appendLong(java.lang.Long.parseLong(text))
      catch { case _: NumberFormatException =>
        builder.appendDecimal(new java.math.BigDecimal(text))
      }
    } else if (expIdx < 0) {
      // exact decimal: scale taken verbatim from the source text
      builder.appendDecimal(new java.math.BigDecimal(text))
    } else {
      builder.appendDouble(java.lang.Double.parseDouble(text))
    }
  }

  /** Close any open frames and return the built value. */
  def finish(): VariantVal = {
    while (stack.nonEmpty) closeFrame(stack.removeHead())
    val v = builder.result()
    new VariantVal(v.getValue, v.getMetadata)
  }
}

/** Open-typed ingestion: build one Spark VARIANT value per row directly
  * from the event stream — no schema inference, heterogeneous rows and
  * exact decimal scale preserved (SURVEY §1.3 option 1 for the
  * schemaless-rows gap).
  */
final class VariantRowPlate(push: InternalRow => Unit) extends Plate[Long] {

  private[this] var capture = new VariantCapture
  private[this] var rowCount = 0L

  def nestMap(pathComponent: CharSequence): Signal = { capture.nestMap(pathComponent); Signal.Continue }
  def nestArr(): Signal = { capture.nestArr(); Signal.Continue }
  def nestMeta(pathComponent: CharSequence): Signal = { capture.nestMap(pathComponent); Signal.Continue }
  def unnest(): Signal = { capture.unnest(); Signal.Continue }
  def nul(): Signal = { capture.nul(); Signal.Continue }
  def fls(): Signal = { capture.bool(false); Signal.Continue }
  def tru(): Signal = { capture.bool(true); Signal.Continue }
  def map(): Signal = { capture.emptyMap(); Signal.Continue }
  def arr(): Signal = { capture.emptyArr(); Signal.Continue }
  def str(s: CharSequence): Signal = { capture.str(s); Signal.Continue }
  def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
    capture.num(s, decIdx, expIdx); Signal.Continue
  }

  def finishRow(): Unit = {
    push(new GenericInternalRow(Array[Any](capture.finish())))
    rowCount += 1
    capture = new VariantCapture
  }

  def finishBatch(terminal: Boolean): Long = rowCount
  def skipped(bytes: Int): Unit = ()
}
