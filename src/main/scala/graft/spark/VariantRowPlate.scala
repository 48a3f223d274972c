package graft.spark

import graft.core.{Plate, Signal}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.types.variant.VariantBuilder
import org.apache.spark.unsafe.types.VariantVal

import scala.collection.mutable

/** Open-typed ingestion: build one Spark VARIANT value per row directly
  * from the event stream — no schema inference, heterogeneous rows and
  * EXACT decimal scale preserved (the lazy `num` text feeds BigDecimal
  * untouched; SURVEY §1.3 option 1 for the schemaless-rows gap).
  *
  * Frame model mirrors [[RowPlate]]: one frame per nest/unnest pair; a
  * value slot morphs into an object/array writer when its shape appears.
  */
final class VariantRowPlate(push: InternalRow => Unit) extends Plate[Long] {

  private final val KSlot = 0
  private final val KObj = 1
  private final val KArr = 2

  private final class Frame(var kind: Int) {
    var start: Int = 0
    var fields: java.util.ArrayList[VariantBuilder.FieldEntry] = null
    var offsets: java.util.ArrayList[Integer] = null
  }

  private[this] var builder = new VariantBuilder(false)
  private[this] val stack = new mutable.ArrayDeque[Frame]
  private[this] var rowCount = 0L
  resetRow()

  private def resetRow(): Unit = {
    stack.clear()
    stack.prepend(new Frame(KSlot)) // the row's top value
  }

  @inline private def top: Frame = stack.head

  /** Reveal the top slot as an object writer (idempotent). */
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

  def nestMap(pathComponent: CharSequence): Signal = {
    val f = asObj()
    val key = pathComponent.toString
    val id = builder.addKey(key)
    f.fields.add(new VariantBuilder.FieldEntry(key, id, builder.getWritePos - f.start))
    stack.prepend(new Frame(KSlot))
    Signal.Continue
  }

  def nestArr(): Signal = {
    val f = asArr()
    f.offsets.add(builder.getWritePos - f.start)
    stack.prepend(new Frame(KSlot))
    Signal.Continue
  }

  def nestMeta(pathComponent: CharSequence): Signal = nestMap(pathComponent)

  def unnest(): Signal = {
    closeFrame(stack.removeHead())
    Signal.Continue
  }

  private def closeFrame(f: Frame): Unit = f.kind match {
    case KObj => builder.finishWritingObject(f.start, f.fields)
    case KArr => builder.finishWritingArray(f.start, f.offsets)
    case _    => () // scalar slot: value already appended (empty slot = null)
  }

  def nul(): Signal = { builder.appendNull(); Signal.Continue }
  def fls(): Signal = { builder.appendBoolean(false); Signal.Continue }
  def tru(): Signal = { builder.appendBoolean(true); Signal.Continue }
  def map(): Signal = {
    // empty object scalar
    builder.finishWritingObject(builder.getWritePos,
      new java.util.ArrayList[VariantBuilder.FieldEntry])
    Signal.Continue
  }
  def arr(): Signal = {
    builder.finishWritingArray(builder.getWritePos, new java.util.ArrayList[Integer])
    Signal.Continue
  }
  def str(s: CharSequence): Signal = { builder.appendString(s.toString); Signal.Continue }

  def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
    val text = s.toString
    if (decIdx < 0 && expIdx < 0) {
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
    Signal.Continue
  }

  def finishRow(): Unit = {
    // top-level container rows have no unnest of their own
    while (stack.nonEmpty) closeFrame(stack.removeHead())
    val v = builder.result()
    push(new GenericInternalRow(Array[Any](new VariantVal(v.getValue, v.getMetadata))))
    rowCount += 1
    builder = new VariantBuilder(false)
    resetRow()
  }

  def finishBatch(terminal: Boolean): Long = rowCount
  def skipped(bytes: Int): Unit = ()
}
