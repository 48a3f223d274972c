package graft.spark

import graft.core.{ByteSliceCharSeq, KeyProbe, Plate, Signal}

import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Vectorized sibling of [[RowPlate]] for FLAT schemas (top-level atomic
  * columns only): parse events write straight into `OnHeapColumnVector`s
  * and the scan hands Spark whole `ColumnarBatch`es — no per-row
  * `InternalRow` allocation, and downstream whole-stage codegen consumes
  * vectors exactly as it does from the built-in parquet reader.
  *
  * Pushdown is identical to the row path: absent keys → SkipColumn,
  * container values under an atomic column → per-entry SkipColumn
  * (reads as null), definitively failing filtered rows → SkipRow.
  */
final class ColumnarPlate(
    schema: StructType,
    filters: Array[Filter],
    // saturation pushdown (Signal.FinishRow) elides validation of the row
    // tail; readers that must fully validate rows (dropMalformed) turn it
    // off — see RowPlate's twin flag
    saturate: Boolean = true,
    // CSV semantics: an empty cell is NULL (Spark's csv nullValue default
    // and DuckDB's read_csv behavior) — see RowPlate's twin flag
    emptyCellsAsNull: Boolean = false,
    // deletion-vector mask in the whole-file ordinal address space (the
    // plate must see every row of the file in order — whole-file
    // partition, no plate filters, badrecords=fail; the scan enforces all
    // three). A masked row's slot is simply reused by the next row: the
    // vectorized path loses nothing to merge-on-read deletes except the
    // masked rows themselves.
    mask: DeletionVectors.Mask = null,
    // first parsed row's whole-file ordinal (block-pruned aligned ranges)
    maskStartOrd: Long = 0L) extends Plate[Long] with KeyProbe {
  // Deletion masks and plate filters COMBINE (round 11): every row's
  // ordinal is counted exactly once — at finishRow for parsed rows, and
  // inside earlyFilter for rows the SkipRow pushdown abandons mid-parse
  // (the parser suppresses their finishRow) — so filter-dropped rows
  // never shift later rows' mask addresses. Both outcomes are "drop", so
  // mask-vs-filter ordering is immaterial; heavily-masked tables keep
  // parse-level byte skipping.

  private[this] val numCols = schema.length
  private[this] val types: Array[DataType] = schema.fields.map(_.dataType)
  private[this] val names: Array[String] = schema.fieldNames

  private[this] var capacity = 4096
  private[this] var vectors: Array[OnHeapColumnVector] = allocate()
  private[this] var rows = 0
  private[this] val seen = new Array[Boolean](numCols)
  // count of distinct top-level columns filled this row; when it reaches
  // numCols the row is SATURATED and unnest answers Signal.FinishRow (the
  // parser byte-skips the remaining fields in one scan)
  private[this] var seenCnt = 0
  private[this] val canSaturate = saturate && numCols > 0

  // Key-cruise probe (Mison-style, [[graft.core.KeyProbe]]), the twin of
  // RowPlate's: unknown row-depth keys skip with no plate notification.
  // Gated on `saturate` (the cruise elides per-value validation).
  private[this] val probeWanted: Array[Array[Byte]] =
    if (!saturate) null
    else (names ++ filters.flatMap(_.references))
      .distinct
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private[this] val probePacked: Array[Long] =
    if (probeWanted == null) null
    else probeWanted.map(b => graft.core.Swar.packPrefix(b, 0, b.length))

  override def cruisableKey(bytes: Array[Byte], off: Int, len: Int): Boolean = {
    if (probeWanted == null) return false
    var i = 0
    while (i < probeWanted.length) {
      val w = probeWanted(i)
      if (w.length == len && {
        if (len <= 8)
          graft.core.Swar.packPrefix(bytes, off, len) == probePacked(i)
        else
          java.util.Arrays.equals(w, 0, len, bytes, off, off + len)
      }) return false
      i += 1
    }
    true
  }

  @inline private[this] def markSeen(idx: Int): Unit = {
    if (!seen(idx)) {
      seen(idx) = true
      seenCnt += 1
    } else {
      // duplicate key overwrite (last-wins, matching RowPlate and
      // spark.read.json): clear a possible null bit from the first binding
      vectors(idx).putNotNull(rows)
    }
  }

  // nesting state: depth inside the current row; the open column index
  private[this] var depth = 0
  private[this] var curIdx = -1
  private[this] var skipPending = false
  private[this] var rowCount = 0L
  private[this] val valueColIdx = names.indexOf("value") // scalar rows land here

  private[this] val filtersByIdx: Map[Int, Array[Filter]] =
    FilterEval.normalize(filters.filter(_.references.length == 1))
      .groupBy(f => names.indexOf(f.references.head))
      .removed(-1)
  // array-indexed view of filtersByIdx: the per-scalar membership test
  // must not box the column index into a Map key
  private[this] val filterAt: Array[Array[Filter]] = {
    val a = new Array[Array[Filter]](numCols)
    filtersByIdx.foreach { case (i, fs) => if (i >= 0 && i < numCols) a(i) = fs }
    a
  }
  private[this] val hasNullFilters =
    filters.exists(f => f.isInstanceOf[IsNotNull] || f.isInstanceOf[IsNull])

  private def allocate(): Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(capacity, schema).asInstanceOf[Array[OnHeapColumnVector]]

  /** Rows currently buffered in the open batch. */
  def pendingRows: Int = rows

  /** Hand the buffered rows out as a batch and start a fresh one.
    *
    * A chunk boundary can split a row, so takeBatch() may be called with a
    * row in flight: its already-written cells live in the OLD vectors at
    * index `rows` (with `seen` flags set) and must be carried over to the
    * new vectors at index 0, or the completed row would silently read
    * stale defaults for those columns in the next batch.
    */
  def takeBatch(): ColumnarBatch = {
    val batch = new ColumnarBatch(vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], rows)
    val old = vectors
    val partialAt = rows
    vectors = allocate()
    rows = 0
    var i = 0
    while (i < numCols) {
      if (seen(i)) {
        val src = old(i)
        if (src.isNullAt(partialAt)) vectors(i).putNull(0)
        else types(i) match {
          case BooleanType => vectors(i).putBoolean(0, src.getBoolean(partialAt))
          case IntegerType => vectors(i).putInt(0, src.getInt(partialAt))
          case LongType    => vectors(i).putLong(0, src.getLong(partialAt))
          case FloatType   => vectors(i).putFloat(0, src.getFloat(partialAt))
          case DoubleType  => vectors(i).putDouble(0, src.getDouble(partialAt))
          case StringType  =>
            val s = src.getUTF8String(partialAt)
            vectors(i).putByteArray(0, s.getBytes)
          case _           => vectors(i).putNull(0)
        }
      }
      i += 1
    }
    batch
  }

  @inline private def ensureCapacity(): Unit =
    if (rows >= capacity) {
      capacity = capacity << 1
      var i = 0
      while (i < numCols) { vectors(i).reserve(capacity); i += 1 }
    }

  // ------------------------------------------------------------- events

  // key-order cache: JSON rows almost always repeat the same key order, so
  // remember (key, column) per field position and hit with one compare —
  // raw UTF-8 bytes vs the parser's zero-copy ASCII views (one vectorized
  // Arrays.equals range check, no per-char CharSequence walk)
  private[this] val orderCap = 64
  private[this] val orderNames = new Array[String](orderCap)
  private[this] val orderBytes = new Array[Array[Byte]](orderCap)
  private[this] val orderCols = new Array[Int](orderCap)
  private[this] var fieldPos = 0

  def nestMap(pathComponent: CharSequence): Signal = {
    if (depth == 0) {
      // a top-level column opens
      val pos = fieldPos
      fieldPos += 1
      var idx = -2 // -2 = unresolved; -1 = known-absent (skip)
      if (pos < orderCap && orderNames(pos) != null && {
            pathComponent match {
              case v: ByteSliceCharSeq =>
                val ob = orderBytes(pos)
                java.util.Arrays.equals(ob, 0, ob.length,
                  v.bytes, v.offset, v.offset + v.length)
              case _ => orderNames(pos).contentEquals(pathComponent)
            }
          }) {
        idx = orderCols(pos)
      } else {
        var i = 0
        idx = -1
        while (idx < 0 && i < numCols) {
          if (names(i).contentEquals(pathComponent)) idx = i
          i += 1
        }
        if (pos < orderCap) {
          val s = pathComponent.toString // copy: views are reused
          orderNames(pos) = s
          orderBytes(pos) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          orderCols(pos) = idx
        }
      }
      if (idx < 0) {
        skipPending = true
        Signal.SkipColumn
      } else {
        curIdx = idx
        depth = 1
        Signal.Continue
      }
    } else {
      // container value under an atomic column: prune entry by entry
      skipPending = true
      Signal.SkipColumn
    }
  }

  def nestArr(): Signal =
    if (depth == 0) {
      // top-level array row cannot fill a flat schema: drop its elements
      skipPending = true
      Signal.SkipColumn
    } else {
      skipPending = true
      Signal.SkipColumn
    }

  def nestMeta(pathComponent: CharSequence): Signal = {
    skipPending = true
    Signal.SkipColumn
  }

  def unnest(): Signal = {
    if (skipPending) skipPending = false
    else if (depth > 0) {
      depth -= 1
      if (depth == 0) {
        curIdx = -1
        // row saturated: every schema column present — skip the rest
        if (canSaturate && seenCnt == numCols) return Signal.FinishRow
      }
    }
    Signal.Continue
  }

  /** The column the next scalar event feeds: an open top-level column, or
    * the "value" column for bare scalar rows; -1 = not interested.
    */
  @inline private def targetIdx: Int =
    if (depth == 1 && curIdx >= 0) curIdx // duplicates overwrite: last-wins
    else if (depth == 0 && valueColIdx >= 0 && !seen(valueColIdx)) valueColIdx
    else -1

  @inline private def writing: Boolean = targetIdx >= 0

  /** putX value writes never reset the validity bit, so a slot reused
    * after an abandoned row must have the partial row's null bits cleared
    * — otherwise the NEXT row's present values read back as null (e.g. an
    * abandoned `{"d": null, ..., "id": <fails filter>}` followed by a
    * kept row whose d is present).
    */
  private def clearPartialNullBits(): Unit = {
    var i = 0
    while (i < numCols) {
      if (seen(i)) vectors(i).putNotNull(rows)
      i += 1
    }
  }

  private def earlyFilter(idx: Int, value: Any): Signal = {
    val fs = filterAt(idx)
    if (fs != null && fs.exists(FilterEval.definitelyFails(_, value))) {
      // abandon the partial row: the parser suppresses its finishRow, so
      // the skipped row's whole-file ordinal must be counted HERE or every
      // later row's deletion-mask address would shift
      if (mask != null) fileOrd += 1
      clearPartialNullBits()
      java.util.Arrays.fill(seen, false)
      seenCnt = 0
      depth = 0; curIdx = -1; skipPending = false; fieldPos = 0
      Signal.SkipRow
    } else Signal.Continue
  }

  private def checkFilterLong(idx: Int, v: Long): Signal =
    if (filterAt(idx) != null) earlyFilter(idx, java.lang.Long.valueOf(v)) else Signal.Continue
  private def checkFilterAny(idx: Int, v: Any): Signal =
    if (filterAt(idx) != null) earlyFilter(idx, v) else Signal.Continue

  def nul(): Signal = {
    val idx = targetIdx
    if (idx >= 0) { markSeen(idx); ensureCapacity(); vectors(idx).putNull(rows) }
    Signal.Continue
  }

  private def putBoolean(b: Boolean): Signal = {
    val idx = targetIdx
    if (idx >= 0) {
      ensureCapacity()
      types(idx) match {
        case BooleanType => vectors(idx).putBoolean(rows, b); markSeen(idx)
        case StringType =>
          vectors(idx).putByteArray(rows, (if (b) "true" else "false").getBytes)
          markSeen(idx)
        case _ => vectors(idx).putNull(rows); markSeen(idx)
      }
      checkFilterAny(idx, java.lang.Boolean.valueOf(b))
    } else Signal.Continue
  }

  def fls(): Signal = putBoolean(false)
  def tru(): Signal = putBoolean(true)

  def map(): Signal = {
    val idx = targetIdx
    if (idx >= 0) { markSeen(idx); ensureCapacity(); vectors(idx).putNull(rows) }
    Signal.Continue
  }
  def arr(): Signal = map()

  def num(s: CharSequence, decIdx: Int, expIdx: Int): Signal = {
    val idx = targetIdx
    if (idx >= 0) {
      ensureCapacity()
      markSeen(idx)
      try types(idx) match {
        case LongType if decIdx < 0 && expIdx < 0 =>
          val v = s match {
            case b: ByteSliceCharSeq => // byte loop, no charAt dispatch
              val boxed = Conversions.parseLongBoxed(b.bytes, b.offset, b.length)
              if (boxed == null) { vectors(idx).putNull(rows); return Signal.Continue }
              boxed.longValue
            case _ => java.lang.Long.parseLong(s, 0, s.length, 10)
          }
          vectors(idx).putLong(rows, v)
          return checkFilterLong(idx, v)
        case IntegerType if decIdx < 0 && expIdx < 0 =>
          val v = java.lang.Integer.parseInt(s, 0, s.length, 10)
          vectors(idx).putInt(rows, v)
          return checkFilterAny(idx, java.lang.Integer.valueOf(v))
        case DoubleType =>
          // exactly-rounded conversion off the zero-copy view (FastDouble:
          // Clinger/Eisel-Lemire; parseDouble only on the rare hard cases)
          val v = s match {
            case b: ByteSliceCharSeq =>
              graft.core.FastDouble.parse(b.bytes, b.offset, b.length, decIdx, expIdx)
            case _ => graft.core.FastDouble.parse(s, decIdx, expIdx)
          }
          vectors(idx).putDouble(rows, v)
          return checkFilterAny(idx, java.lang.Double.valueOf(v))
        case FloatType =>
          vectors(idx).putFloat(rows, java.lang.Float.parseFloat(s.toString))
        case StringType =>
          vectors(idx).putByteArray(rows, s.toString.getBytes("UTF-8"))
        case _ =>
          vectors(idx).putNull(rows)
      } catch { case _: NumberFormatException => vectors(idx).putNull(rows) }
      Signal.Continue
    } else Signal.Continue
  }

  def str(s: CharSequence): Signal = {
    if (emptyCellsAsNull && s.length == 0) return nul()
    val idx = targetIdx
    if (idx >= 0) {
      ensureCapacity()
      markSeen(idx)
      try types(idx) match {
        case StringType => s match {
          case v: ByteSliceCharSeq =>
            vectors(idx).putByteArray(rows, v.bytes, v.offset, v.length)
            if (filterAt(idx) != null)
              return earlyFilter(idx, org.apache.spark.unsafe.types.UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(v.bytes, v.offset, v.offset + v.length)))
          case _ =>
            val bytes = s.toString.getBytes("UTF-8")
            vectors(idx).putByteArray(rows, bytes)
            if (filterAt(idx) != null)
              return earlyFilter(idx, org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes))
        }
        case LongType =>
          val v = java.lang.Long.parseLong(s.toString.trim)
          vectors(idx).putLong(rows, v)
          return checkFilterLong(idx, v)
        case TimestampType => // same strict ISO form as the row path
          val inst = java.time.Instant.parse(s.toString.trim)
          val v = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
          vectors(idx).putLong(rows, v)
          return checkFilterLong(idx, v)
        case DateType =>
          vectors(idx).putInt(rows,
            java.time.LocalDate.parse(s.toString.trim).toEpochDay.toInt)
        case IntegerType =>
          vectors(idx).putInt(rows, java.lang.Integer.parseInt(s.toString.trim))
        case DoubleType =>
          vectors(idx).putDouble(rows, java.lang.Double.parseDouble(s.toString.trim))
        case FloatType =>
          vectors(idx).putFloat(rows, java.lang.Float.parseFloat(s.toString.trim))
        case BooleanType => s.toString.trim.toLowerCase match {
          case "true" | "t" | "1"   => vectors(idx).putBoolean(rows, true)
          case "false" | "f" | "0"  => vectors(idx).putBoolean(rows, false)
          case _ => vectors(idx).putNull(rows)
        }
        case _ => vectors(idx).putNull(rows)
      } catch { case _: RuntimeException => vectors(idx).putNull(rows) }
      Signal.Continue
    } else Signal.Continue
  }

  // file ordinal of the row being finished (EVERY parsed row counts, kept
  // or not); the mask's own pointer walks its runs one-pass
  private[this] var fileOrd = maskStartOrd

  def finishRow(): Unit = {
    ensureCapacity()
    var keep = true
    if (mask != null) {
      keep = !mask.masked(fileOrd)
      fileOrd += 1
    }
    if (keep && hasNullFilters) {
      keep = filters.forall {
        case IsNotNull(col) =>
          val idx = names.indexOf(col); idx < 0 || seen(idx)
        case IsNull(col) =>
          val idx = names.indexOf(col); idx < 0 || !seen(idx)
        case _ => true
      }
    }
    if (keep) {
      var i = 0
      while (i < numCols) {
        if (!seen(i)) vectors(i).putNull(rows)
        i += 1
      }
      rows += 1
      rowCount += 1
    } else {
      // rejected row (null-demand filters): its slot is reused — scrub
      // the null bits its explicit nulls stamped (see clearPartialNullBits)
      clearPartialNullBits()
    }
    java.util.Arrays.fill(seen, false)
    seenCnt = 0
    depth = 0
    curIdx = -1
    skipPending = false
    fieldPos = 0
  }

  def finishBatch(terminal: Boolean): Long = rowCount
  def skipped(bytes: Int): Unit = ()

  /** Discard any in-flight row state (malformed-record recovery): buffered
    * complete rows stay; the partial row's cells are overwritten/nulled by
    * the next row at the same index.
    */
  def abandonPartialRow(): Unit = {
    clearPartialNullBits()
    seenCnt = 0
    java.util.Arrays.fill(seen, false)
    depth = 0
    curIdx = -1
    skipPending = false
    fieldPos = 0
  }
}

object ColumnarPlate {
  /** Columnar reads apply to flat all-atomic schemas (temporal columns
    * vectorize too: micros/days are just long/int lanes — round 11).
    */
  def supports(schema: StructType): Boolean =
    schema.fields.forall(_.dataType match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           StringType | TimestampType | DateType => true
      case _ => false
    })
}
