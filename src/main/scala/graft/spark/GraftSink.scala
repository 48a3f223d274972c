package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** DSv2 write path for `format("graft-json")`: each task streams its rows
  * as JSON lines to a uniquely-named staging file and RENAMES it into
  * place on task commit — rename is the atomic primitive, so speculative
  * or retried tasks never double-publish (the loser's stage file is
  * deleted on abort). `mode("overwrite")` maps to SupportsTruncate: the
  * driver clears prior part files before launching tasks.
  *
  * The reference has no sink (the Plate IS its sink, SURVEY §2.11 row
  * "Sinks"); this is the Spark-native counterpart so a graft pipeline can
  * round-trip JSONL without leaving the DSv2 surface.
  */
final class GraftWriteBuilder(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    codec: String = "none")
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(path, schema, conf, doTruncate, codec)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftStreamingWrite(path, schema, conf, codec)
  }
}

/** Streaming sink: files are named by (epoch, partition), so a replayed
  * epoch after failure re-publishes the SAME names — idempotent, which is
  * what makes the file sink exactly-once under micro-batch re-execution.
  */
final class GraftStreamingWrite(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    codec: String = "none")
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val dir = new Path(path)
    dir.getFileSystem(conf.value).mkdirs(dir)
    new GraftStreamingWriterFactory(path, schema, conf, codec)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final class GraftStreamingWriterFactory(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    codec: String = "none")
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new GraftJsonDataWriter(path, schema, conf, partitionId, taskId,
      namePrefix = f"part-$epochId%05d", codec = codec)
}

final class GraftBatchWrite(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    truncate: Boolean,
    codec: String = "none")
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        if (st.isFile) fs.delete(st.getPath, false)
      }
    }
    fs.mkdirs(dir)
    new GraftJsonWriterFactory(path, schema, conf, codec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftManifest.write(path, conf.value, messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** `stats` is the rendered sidecar content (null when unavailable): the
  * driver-side batch commit compacts all tasks' stats into one hidden
  * per-directory manifest so planning reads one file, not one per part.
  */
private final case class GraftCommit(file: String, stats: String = null)
    extends WriterCommitMessage

private object GraftManifest {
  /** Write the compacted manifest from task commit messages (atomic
    * tmp+rename; best-effort — absence only disables the one-read path).
    */
  def write(path: String, conf: org.apache.hadoop.conf.Configuration,
      messages: Array[WriterCommitMessage]): Unit = try {
    val entries = messages.collect {
      case GraftCommit(f, s) if s != null => new Path(f).getName -> s
    }.toSeq
    if (entries.isEmpty) return
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val target = FileStats.manifestFor(dir)
    val tmp = new Path(dir, target.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(FileStats.renderManifest(entries).getBytes("UTF-8"))
    finally out.close()
    fs.delete(target, false)
    fs.rename(tmp, target)
  } catch { case _: Exception => () }
}

final class GraftJsonWriterFactory(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    codec: String = "none") extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftJsonDataWriter(path, schema, conf, partitionId, taskId, codec = codec)
}

final class GraftJsonDataWriter(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long,
    namePrefix: String = "part",
    codec: String = "none")
    extends DataWriter[InternalRow] {

  private val fs = new Path(path).getFileSystem(conf.value)
  private val ext = codec match {
    case "gzip" => "jsonl.gz"
    case "zstd" => "jsonl.zst"
    case "none" => "jsonl"
    case other => throw new IllegalArgumentException(
      s"graft-json compression '$other' (supported: none, gzip, zstd)")
  }
  private val finalFile = new Path(path, f"$namePrefix-$partitionId%05d.$ext")
  private val stageFile = new Path(path, f".$namePrefix-$partitionId%05d-$taskId.$ext.stage")
  private val out: java.io.OutputStream = {
    val base = new java.io.BufferedOutputStream(fs.create(stageFile, true), 1 << 16)
    codec match {
      case "gzip" => new java.util.zip.GZIPOutputStream(base, 1 << 16)
      case "zstd" => new java.io.BufferedOutputStream(
        new com.github.luben.zstd.ZstdOutputStream(base), 1 << 16)
      case _ => base
    }
  }
  private val sb = new java.lang.StringBuilder(4096)
  private val stats = new FileStatsCollector(schema)

  override def write(row: InternalRow): Unit = {
    sb.setLength(0)
    GraftJsonDataWriter.writeStruct(sb, row, schema)
    sb.append('\n')
    out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    stats.observe(row)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    // a prior file's sidecar must not outlive its data: drop it BEFORE the
    // rename so a crash between the two steps leaves no-stats (pruning
    // disabled) rather than wrong-stats (wrong results)
    fs.delete(FileStats.sidecarFor(finalFile), false)
    // atomic publish; a retried task overwrites the same final name
    fs.delete(finalFile, false)
    fs.rename(stageFile, finalFile)
    // data-skipping sidecar (hidden: listings skip dot-files); written
    // after the data publish — absence merely disables pruning. The
    // recorded byte length binds the sidecar to THIS data file; a later
    // out-of-band rewrite invalidates it (FileStats.load checks).
    val rendered = FileStats.render(
      stats.snapshot(fs.getFileStatus(finalFile).getLen))
    try {
      val sout = fs.create(FileStats.sidecarFor(finalFile), true)
      try sout.write(rendered.getBytes("UTF-8")) finally sout.close()
    } catch { case _: Exception => () } // stats are best-effort
    GraftCommit(finalFile.toString, rendered)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(stageFile, false)
  }

  override def close(): Unit = ()
}

object GraftJsonDataWriter {

  def writeStruct(sb: java.lang.StringBuilder, row: InternalRow, st: StructType): Unit = {
    sb.append('{')
    var first = true
    var i = 0
    while (i < st.length) {
      if (!row.isNullAt(i)) {
        if (!first) sb.append(',')
        first = false
        writeString(sb, st(i).name)
        sb.append(':')
        writeValue(sb, row.get(i, st(i).dataType), st(i).dataType)
      }
      i += 1
    }
    sb.append('}')
  }

  private def writeValue(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = dt match {
    case _ if v == null  => sb.append("null")
    case StringType      => writeString(sb, v.toString)
    case LongType | IntegerType | ShortType | ByteType | BooleanType =>
      sb.append(v.toString)
    case DoubleType | FloatType =>
      val d = v match { case f: java.lang.Float => f.doubleValue; case x => x.asInstanceOf[Double] }
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) sb.append("null")
      else sb.append(d.toString)
    case d: DecimalType =>
      sb.append(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toPlainString)
    case s: StructType =>
      writeStruct(sb, v.asInstanceOf[InternalRow], s)
    case a: ArrayType =>
      val arr = v.asInstanceOf[ArrayData]
      sb.append('[')
      var i = 0
      while (i < arr.numElements()) {
        if (i > 0) sb.append(',')
        if (arr.isNullAt(i)) sb.append("null")
        else writeValue(sb, arr.get(i, a.elementType), a.elementType)
        i += 1
      }
      sb.append(']')
    case m: MapType =>
      val md = v.asInstanceOf[MapData]
      sb.append('{')
      val ks = md.keyArray()
      val vs = md.valueArray()
      var i = 0
      while (i < md.numElements()) {
        if (i > 0) sb.append(',')
        writeString(sb, ks.get(i, m.keyType).toString)
        sb.append(':')
        if (vs.isNullAt(i)) sb.append("null")
        else writeValue(sb, vs.get(i, m.valueType), m.valueType)
        i += 1
      }
      sb.append('}')
    case _ => writeString(sb, v.toString) // timestamps/dates/etc: text form
  }

  def writeString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}

/** DSv2 write path for `format("graft-csv")`: flat schemas only (CSV has
  * no nesting), header row per file, quote-doubling when a value contains
  * the delimiter, a quote, or a row-delimiter byte — the same dialect the
  * graft-csv reader and its Config parse. Shares the staged-file
  * atomic-rename commit protocol with the JSON writer.
  */
final class GraftCsvWriteBuilder(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    codec: String,
    header: Boolean,
    delim: String,
    linesep: String)
    extends WriteBuilder with SupportsTruncate {

  schema.fields.foreach { f =>
    f.dataType match {
      case _: StructType | _: ArrayType | _: MapType =>
        throw new IllegalArgumentException(
          s"graft-csv cannot write nested column '${f.name}: ${f.dataType.simpleString}' " +
          "(serialize it to a string or use graft-json)")
      case _ => ()
    }
  }

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
        val dir = new Path(path)
        val fs = dir.getFileSystem(conf.value)
        if (doTruncate && fs.exists(dir))
          fs.listStatus(dir).foreach(st => if (st.isFile) fs.delete(st.getPath, false))
        fs.mkdirs(dir)
        new GraftCsvWriterFactory(path, schema, conf, codec, header, delim, linesep)
      }
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        GraftManifest.write(path, conf.value, messages)
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

final class GraftCsvWriterFactory(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    codec: String,
    header: Boolean,
    delim: String,
    linesep: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCsvDataWriter(path, schema, conf, partitionId, taskId, codec, header, delim, linesep)
}

final class GraftCsvDataWriter(
    path: String,
    schema: StructType,
    conf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long,
    codec: String,
    header: Boolean,
    delim: String,
    linesep: String)
    extends DataWriter[InternalRow] {

  private val fs = new Path(path).getFileSystem(conf.value)
  private val ext = codec match {
    case "gzip" => "csv.gz"
    case "zstd" => "csv.zst"
    case "none" => "csv"
    case other => throw new IllegalArgumentException(
      s"graft-csv compression '$other' (supported: none, gzip, zstd)")
  }
  private val finalFile = new Path(path, f"part-$partitionId%05d.$ext")
  private val stageFile = new Path(path, f".part-$partitionId%05d-$taskId.$ext.stage")
  private val out: java.io.OutputStream = {
    val base = new java.io.BufferedOutputStream(fs.create(stageFile, true), 1 << 16)
    codec match {
      case "gzip" => new java.util.zip.GZIPOutputStream(base, 1 << 16)
      case "zstd" => new java.io.BufferedOutputStream(
        new com.github.luben.zstd.ZstdOutputStream(base), 1 << 16)
      case _ => base
    }
  }
  private val sb = new java.lang.StringBuilder(1024)
  private val stats = new FileStatsCollector(schema)
  private val mustQuote: Set[Char] =
    (delim.toSet ++ linesep.toSet) + '"'

  if (header) {
    sb.setLength(0)
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(delim)
      appendCell(schema.fields(i).name)
      i += 1
    }
    sb.append(linesep)
    flushLine()
  }

  private def appendCell(s: String): Unit = {
    if (s.exists(mustQuote)) {
      sb.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') sb.append("\"\"") else sb.append(c)
        i += 1
      }
      sb.append('"')
    } else sb.append(s)
  }

  private def flushLine(): Unit =
    out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def write(row: InternalRow): Unit = {
    sb.setLength(0)
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(delim)
      if (!row.isNullAt(i)) {
        val dt = schema.fields(i).dataType
        dt match {
          case StringType => appendCell(row.getUTF8String(i).toString)
          case LongType => sb.append(row.getLong(i))
          case IntegerType => sb.append(row.getInt(i))
          case DoubleType => sb.append(row.getDouble(i))
          case FloatType => sb.append(row.getFloat(i))
          case BooleanType => sb.append(row.getBoolean(i))
          case ShortType => sb.append(row.getShort(i))
          case ByteType => sb.append(row.getByte(i))
          case _ => appendCell(row.get(i, dt).toString)
        }
      }
      i += 1
    }
    sb.append(linesep)
    flushLine()
    stats.observe(row)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    // same sidecar protocol as the JSON writer: stale sidecar dropped
    // before the rename, fresh one bound to the published file's length
    fs.delete(FileStats.sidecarFor(finalFile), false)
    fs.delete(finalFile, false)
    fs.rename(stageFile, finalFile)
    val rendered = FileStats.render(
      stats.snapshot(fs.getFileStatus(finalFile).getLen))
    try {
      val sout = fs.create(FileStats.sidecarFor(finalFile), true)
      try sout.write(rendered.getBytes("UTF-8")) finally sout.close()
    } catch { case _: Exception => () }
    GraftCommit(finalFile.toString, rendered)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(stageFile, false)
  }

  override def close(): Unit = ()
}
