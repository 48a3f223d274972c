package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file data-skipping statistics (Delta/parquet-footer-style min/max
  * pruning for JSON corpora, which have no native footer): the graft-json
  * sink writes one hidden `.<file>.stats` sidecar per part with row count
  * and per-column (nulls, min, max) for top-level atomic columns; the
  * graft scan consults it at PLANNING time to drop whole files whose
  * value ranges cannot satisfy a pushed filter — no task, no bytes.
  *
  * Sidecar format is line-oriented (version line, `rows`, then one `col`
  * line per column) with base64-encoded strings so no value can corrupt
  * the framing. Missing or unreadable sidecars simply disable pruning for
  * that file.
  *
  * Scale note: sidecar loads are driver-side, one small read per
  * CANDIDATE file, cached per scan, and consulted only when a pushed
  * filter or metadata-answerable aggregate makes them useful — and only
  * AFTER hive partition pruning has already cut the listing. At millions
  * of surviving files the per-file reads would dominate planning; the
  * production evolution is a per-directory manifest compacting the
  * sidecars (exactly Delta's checkpoint trajectory), which the format's
  * versioned line protocol leaves room for.
  */
object FileStats {

  /** One column's stats. kind: 'i' integral (Long), 'f' floating (Double),
    * 's' string (UTF8String), 'b' boolean. min/max null = no non-null
    * values observed.
    */
  final case class ColStats(kind: Char, nulls: Long, min: Any, max: Any)
  final case class Stats(rows: Long, cols: Map[String, ColStats])

  def sidecarFor(dataFile: Path): Path =
    new Path(dataFile.getParent, "." + dataFile.getName + ".stats")

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private[spark] def encodeValue(kind: Char, v: Any): String =
    if (v == null) "-"
    else kind match {
      case 'i' => v.toString
      case 'f' => java.lang.Double.toString(v.asInstanceOf[Double]) // exact round-trip
      case 's' => b64(v.toString)
      case 'b' => if (v.asInstanceOf[Boolean]) "t" else "f"
    }

  private[spark] def decodeValue(kind: Char, s: String): Any =
    if (s == "-") null
    else kind match {
      case 'i' => java.lang.Long.valueOf(s)
      case 'f' => java.lang.Double.valueOf(s)
      case 's' => UTF8String.fromString(unb64(s))
      case 'b' => java.lang.Boolean.valueOf(s == "t")
    }

  def render(stats: Stats): String = {
    val sb = new StringBuilder("graft-stats v1\n")
    sb.append("rows\t").append(stats.rows).append('\n')
    stats.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      sb.append("col\t").append(b64(name)).append('\t').append(c.kind)
        .append('\t').append(c.nulls)
        .append('\t').append(encodeValue(c.kind, c.min))
        .append('\t').append(encodeValue(c.kind, c.max))
        .append('\n')
    }
    sb.toString
  }

  /** Parse a sidecar; None on any malformed content (no pruning). */
  def parse(text: String): Option[Stats] = {
    val lines = text.split('\n').filter(_.nonEmpty)
    if (lines.isEmpty || lines(0) != "graft-stats v1") return None
    try {
      var rows = -1L
      val cols = Map.newBuilder[String, ColStats]
      lines.drop(1).foreach { line =>
        val p = line.split('\t')
        p(0) match {
          case "rows" => rows = p(1).toLong
          case "col" =>
            val kind = p(2).charAt(0)
            cols += unb64(p(1)) -> ColStats(
              kind, p(3).toLong, decodeValue(kind, p(4)), decodeValue(kind, p(5)))
          case _ => () // forward-compatible: unknown lines ignored
        }
      }
      if (rows < 0) None else Some(Stats(rows, cols.result()))
    } catch { case _: Exception => None }
  }

  /** Load the sidecar for a data file; None when absent/unreadable. */
  def load(fs: FileSystem, dataFile: Path): Option[Stats] = {
    val p = sidecarFor(dataFile)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      try parse(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    } catch { case _: Exception => None }
  }
}

/** Streaming min/max/null collector over InternalRows for the sink. Only
  * top-level atomic columns participate; everything else is skipped (the
  * sidecar simply omits them).
  */
private[spark] final class FileStatsCollector(schema: StructType) {
  import FileStats._

  // (field index, name, kind) for supported columns
  private val tracked: Array[(Int, String, Char)] =
    schema.fields.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => Some((i, f.name, 'i'))
        case DoubleType | FloatType => Some((i, f.name, 'f'))
        case StringType => Some((i, f.name, 's'))
        case BooleanType => Some((i, f.name, 'b'))
        case _ => None
      }
    }
  private val mins = new Array[Any](tracked.length)
  private val maxs = new Array[Any](tracked.length)
  private val nulls = new Array[Long](tracked.length)
  private var rows = 0L

  private def cmp(kind: Char, a: Any, b: Any): Int = kind match {
    case 'i' => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case 'f' => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case 's' => a.asInstanceOf[UTF8String].binaryCompare(b.asInstanceOf[UTF8String])
    case 'b' => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
  }

  def observe(row: InternalRow): Unit = {
    rows += 1
    var t = 0
    while (t < tracked.length) {
      val (i, _, kind) = tracked(t)
      if (row.isNullAt(i)) nulls(t) += 1
      else {
        val v: Any = kind match {
          case 'i' => schema.fields(i).dataType match {
            case LongType => row.getLong(i)
            case IntegerType => row.getInt(i).toLong
            case ShortType => row.getShort(i).toLong
            case ByteType => row.getByte(i).toLong
          }
          case 'f' => schema.fields(i).dataType match {
            case DoubleType => row.getDouble(i)
            case FloatType => row.getFloat(i).toDouble
          }
          // rows are recycled by upstream operators: copy the bytes
          case 's' => row.getUTF8String(i).clone()
          case 'b' => row.getBoolean(i)
        }
        if (mins(t) == null || cmp(kind, v, mins(t)) < 0) mins(t) = v
        if (maxs(t) == null || cmp(kind, v, maxs(t)) > 0) maxs(t) = v
      }
      t += 1
    }
  }

  def snapshot(): Stats = Stats(rows,
    tracked.zipWithIndex.map { case ((_, name, kind), t) =>
      name -> ColStats(kind, nulls(t), mins(t), maxs(t))
    }.toMap)

  def writeSidecar(fs: FileSystem, path: Path): Unit = {
    try {
      val out = fs.create(path, true)
      try out.write(render(snapshot()).getBytes("UTF-8"))
      finally out.close()
    } catch { case _: Exception => () } // stats are best-effort
  }
}
