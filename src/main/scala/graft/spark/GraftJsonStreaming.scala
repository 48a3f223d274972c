package graft.spark

import graft.core.json.JsonParser

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch streaming over JSON-lines files: the engine's mapping of the
  * reference's async/BreakBatch partial-batch semantics onto Structured
  * Streaming (SURVEY §2.4 — batch abbreviation ≈ `ReadLimit`/admission
  * control; checkpoint/resume ≈ offsets).
  *
  * The offset is a single byte position over the (snapshot, name-ordered)
  * file list; each trigger advances at most `maxbytespertrigger` bytes
  * (default 128 MB) and planInputPartitions maps the byte window onto
  * per-file segments read by the SAME row-realigning partition reader as
  * the batch path — so micro-batch boundaries can fall mid-row and rows
  * are still delivered exactly once.
  */
final case class GraftStreamOffset(pos: Long) extends Offset {
  override def json(): String = s"""{"pos":$pos}"""
}

final class GraftJsonMicroBatchStream(
    schema: StructType,
    filters: Array[Filter],
    options: CaseInsensitiveStringMap,
    mode: JsonParser.Mode)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // snapshot of the input at stream start (a production source would
  // re-list and append newly landed files to the tail of the mapping)
  private val files: Seq[(String, Long)] =
    GraftSources.resolveFiles(options).sortBy(_._1)
  private val totalBytes: Long = files.map(_._2).sum
  private val maxBytesPerTrigger: Long =
    Option(options.get("maxbytespertrigger")).map(_.toLong).getOrElse(128L << 20)

  private val conf = new SerializableConfiguration(GraftSources.activeHadoopConf())

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val pos = json.replaceAll("[^0-9]", "")
    GraftStreamOffset(if (pos.isEmpty) 0L else pos.toLong)
  }

  override def latestOffset(): Offset =
    GraftStreamOffset(totalBytes) // plain API: everything available

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[GraftStreamOffset].pos
    GraftStreamOffset(math.min(totalBytes, start + maxBytesPerTrigger))
  }

  override def reportLatestOffset(): Offset = GraftStreamOffset(totalBytes)

  // Trigger.AvailableNow: the drain target is the static snapshot; batches
  // keep firing (maxBytesPerTrigger each) until the offset reaches it
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].pos
    val e = end.asInstanceOf[GraftStreamOffset].pos
    // map the global byte window onto per-file segments
    val parts = Seq.newBuilder[InputPartition]
    var base = 0L
    files.foreach { case (path, len) =>
      val fs = math.max(s - base, 0L)
      val fe = math.min(e - base, len)
      if (fe > fs) parts += GraftInputPartition(path, fs, fe, len)
      base += len
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftJsonReaderFactory(schema, filters, conf, mode)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Micro-batch streaming over CSV files: quoted row delimiters preclude
  * byte-offset splits, so the offset is a FILE index into the (snapshot,
  * name-ordered) list — each trigger admits up to `maxfilespertrigger`
  * whole files (the classic file-source admission model).
  */
final class GraftCsvMicroBatchStream(
    schema: StructType,
    filters: Array[Filter],
    options: CaseInsensitiveStringMap,
    config: graft.core.csv.CsvParser.Config)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val files: Seq[(String, Long)] =
    GraftSources.resolveFiles(options).sortBy(_._1)
  private val maxFilesPerTrigger: Int =
    Option(options.get("maxfilespertrigger")).map(_.toInt).getOrElse(Int.MaxValue)

  private val conf = new SerializableConfiguration(GraftSources.activeHadoopConf())

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val pos = json.replaceAll("[^0-9]", "")
    GraftStreamOffset(if (pos.isEmpty) 0L else pos.toLong)
  }

  override def latestOffset(): Offset = GraftStreamOffset(files.length.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[GraftStreamOffset].pos
    GraftStreamOffset(math.min(files.length.toLong, start + maxFilesPerTrigger))
  }

  override def reportLatestOffset(): Offset = GraftStreamOffset(files.length.toLong)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].pos.toInt
    val e = end.asInstanceOf[GraftStreamOffset].pos.toInt
    files.slice(s, e).map { case (p, len) =>
      GraftInputPartition(p, 0, len, len): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCsvReaderFactory(schema, filters, conf, config)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
