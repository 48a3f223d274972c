package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** Avro micro-batch streaming: whole-file admission (the csv model),
  * followLog commit-order tailing through the shared registry, the same
  * dv/remove refusals as the text lanes, and per-file partition values
  * (k=v and withFilePath) riding the stream.
  */
class AvroStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-avro-stream")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("avro-streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def dir(name: String): String = root.resolve(name).toString
  private val schema = "id BIGINT, v STRING"

  private def writeRows(d: String, from: Long, until: Long, mode: String): Unit = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
      .write.format("graft-avro").mode(mode).save(d)
  }

  test("followLog streaming delivers committed avro files in commit order") {
    val d = dir("follow")
    writeRows(d, 0L, 50L, "overwrite")  // v0
    writeRows(d, 50L, 80L, "append")    // v1
    val q = spark.readStream.format("graft-avro").schema(schema)
      .option("followlog", "true").load(d)
      .writeStream.format("memory").queryName("avro_follow")
      .option("checkpointLocation", dir("follow_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT id FROM avro_follow")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 80L))
  }

  test("maxfilespertrigger paces whole-file admission in commit order") {
    val d = dir("paced")
    writeRows(d, 0L, 40L, "overwrite") // v0: 2 files
    writeRows(d, 40L, 80L, "append")   // v1: 2 more
    val byBatch = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val q = spark.readStream.format("graft-avro").schema(schema)
      .option("followlog", "true").option("maxfilespertrigger", "1").load(d)
      .writeStream
      .option("checkpointLocation", dir("paced_ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        byBatch.put(id, b.collect().map(_.getLong(0)).toSeq)
        ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val batches = byBatch.asScala.toSeq.sortBy(_._1)
    // 4 files at 1 file/trigger → exactly 4 non-empty batches
    assert(batches.count(_._2.nonEmpty) === 4,
      s"expected 4 single-file batches, got ${batches.map(_._2.size)}")
    assert(batches.flatMap(_._2).sorted === (0L until 80L))
    // COMMIT order: v0's rows (ids < 40) must be fully delivered before
    // any of v1's (ids >= 40) — followLog admits files in commit order
    val firstV1Batch = batches.collect {
      case (id, rows) if rows.exists(_ >= 40L) => id }.min
    assert(batches.forall { case (id, rows) =>
      rows.forall(_ >= 40L) || id < firstV1Batch },
      s"v0 rows delivered after v1 began: ${batches.map { case (i, r) => (i, r.take(3)) }}")
  }

  test("streamed schemas serve per-file partition values (k=v and withFilePath)") {
    val d = dir("partvals")
    val s = spark
    import s.implicits._
    // hand-built k=v layout (the avro sink never writes one): the streamed
    // schema NAMES the partition column and the values ride the registry —
    // round 11 replaced the loud refusal rail with the real thing
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "v").repartition(1)
      .write.format("graft-avro").mode("overwrite").save(d + "/k=1")
    (10L until 20L).map(i => (i, s"r$i")).toDF("id", "v").repartition(1)
      .write.format("graft-avro").mode("overwrite").save(d + "/k=2")
    val q = spark.readStream.format("graft-avro")
      .schema("id BIGINT, v STRING, k BIGINT").load(d)
      .writeStream.format("memory").queryName("avro_part_vals")
      .option("checkpointLocation", dir("partvals_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT id, k FROM avro_part_vals")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === (0L until 20L).map(i => (i, if (i < 10) 1L else 2L)),
      "typed k=v directory values must ride the stream")
    // withFilePath provenance streams too
    val d2 = dir("partvals-fp")
    writeRows(d2, 0L, 10L, "overwrite")
    val q2 = spark.readStream.format("graft-avro")
      .schema("id BIGINT, v STRING, _graft_file STRING")
      .option("withfilepath", "true").load(d2)
      .writeStream.format("memory").queryName("avro_fp_vals")
      .option("checkpointLocation", dir("partvals_ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val fps = spark.sql("SELECT id, _graft_file FROM avro_fp_vals")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(fps.length === 10)
    assert(fps.forall { case (_, f) => f != null && f.endsWith(".avro") },
      fps.take(3).mkString(", "))
    // the TEXT lanes serve them too — a sink-partitioned json table
    // streamed with the partition column in the schema
    val d3 = dir("partvals-json")
    (0L until 20L).map(i => (i, s"r$i", i % 2)).toDF("id", "v", "k")
      .repartition(1)
      .write.format("graft-json").option("partitionby", "k")
      .mode("overwrite").save(d3)
    val q3 = spark.readStream.format("graft-json")
      .schema("id BIGINT, v STRING, k BIGINT").load(d3)
      .writeStream.format("memory").queryName("json_part_vals")
      .option("checkpointLocation", dir("partvals_ckpt3"))
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val gj = spark.sql("SELECT id, k FROM json_part_vals")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(gj === (0L until 20L).map(i => (i, i % 2)),
      "json streams must serve sink-partitioned k=v values")
    // ... and in followLog commit-order tailing (registry paths are
    // root-relative in the log; values still derive)
    val q4 = spark.readStream.format("graft-json")
      .schema("id BIGINT, v STRING, k BIGINT")
      .option("followlog", "true").load(d3)
      .writeStream.format("memory").queryName("json_part_vals_fl")
      .option("checkpointLocation", dir("partvals_ckpt4"))
      .trigger(Trigger.AvailableNow()).start()
    q4.awaitTermination()
    assert(spark.sql("SELECT id, k FROM json_part_vals_fl")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === gj)
    // a schema WITHOUT the partition column still streams fine
    val q5 = spark.readStream.format("graft-json").schema("id BIGINT, v STRING")
      .load(d3)
      .writeStream.format("memory").queryName("json_part_ok")
      .option("checkpointLocation", dir("partvals_ckpt5"))
      .trigger(Trigger.AvailableNow()).start()
    q5.awaitTermination()
    assert(spark.sql("SELECT id FROM json_part_ok").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L until 20L))
    // csv twin: partitioned csv table streamed with the partition column
    val d6 = dir("partvals-csv")
    (0L until 20L).map(i => (i, s"r$i", i % 2)).toDF("id", "v", "k")
      .repartition(1)
      .write.format("graft-csv").option("partitionby", "k")
      .mode("overwrite").save(d6)
    val q6 = spark.readStream.format("graft-csv")
      .schema("id BIGINT, v STRING, k BIGINT").load(d6)
      .writeStream.format("memory").queryName("csv_part_vals")
      .option("checkpointLocation", dir("partvals_ckpt6"))
      .trigger(Trigger.AvailableNow()).start()
    q6.awaitTermination()
    assert(spark.sql("SELECT id, k FROM csv_part_vals")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === gj)
  }

  test("streaming WRITE to graft-avro: epoch-deterministic files, exact round trip") {
    val src = dir("wsink-src")
    writeRows(src, 0L, 60L, "overwrite")
    val out = dir("wsink-out")
    val q = spark.readStream.format("graft-avro").schema(schema)
      .option("maxfilespertrigger", "1").load(src)
      .writeStream.format("graft-avro")
      .option("path", out)
      .option("checkpointLocation", dir("wsink-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.format("graft-avro").schema(schema).load(out)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 60L))
    // deterministic epoch names (no task id): a replayed epoch overwrites
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
    assert(names.forall(_.matches("part-\\d{5}-\\d{5}\\.avro")),
      names.mkString(", "))
    // per-file stats sidecars ride along (epoch files prune like batch)
    assert(names.forall(n => fs.exists(
      new org.apache.hadoop.fs.Path(out, s".$n.stats"))))
  }

  test("a dv-carrying table refuses streaming loudly (both discovery modes)") {
    val d = dir("dvref")
    writeRows(d, 0L, 30L, "overwrite")
    TrainingData.deleteWhereDV(spark, d, schema, "id = 3", format = "graft-avro")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val raw = intercept[Exception] {
      spark.readStream.format("graft-avro").schema(schema).load(d)
        .writeStream.format("memory").queryName("avro_dvraw")
        .option("checkpointLocation", dir("dvref_ckpt1"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(msgs(raw).exists(_.contains("deletion vector")), msgs(raw).mkString(" | "))
    val follow = intercept[Exception] {
      spark.readStream.format("graft-avro").schema(schema)
        .option("followlog", "true").load(d)
        .writeStream.format("memory").queryName("avro_dvfollow")
        .option("checkpointLocation", dir("dvref_ckpt2"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(msgs(follow).exists(m =>
      m.contains("deletion vector") || m.contains("append-only")),
      msgs(follow).mkString(" | "))
  }
}
