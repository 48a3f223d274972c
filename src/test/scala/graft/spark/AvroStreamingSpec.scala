package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** Avro micro-batch streaming: whole-file admission (the csv model),
  * followLog commit-order tailing through the shared registry, the same
  * dv/remove refusals as the text lanes, and the unpartitioned-layout
  * rail.
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

  test("streaming rails: partitioned layouts and withfilepath refuse loudly") {
    val d = dir("rails")
    val s = spark
    import s.implicits._
    // hand-built k=v layout (the avro sink never writes one)
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "v").repartition(1)
      .write.format("graft-avro").mode("overwrite").save(d + "/k=1")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      spark.readStream.format("graft-avro").schema(schema).load(d)
        .writeStream.format("memory").queryName("avro_rail_part")
        .option("checkpointLocation", dir("rails_ckpt1"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(msgs(e).exists(_.contains("unpartitioned")), msgs(e).mkString(" | "))
    val d2 = dir("rails2")
    writeRows(d2, 0L, 10L, "overwrite")
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-avro")
        .schema("id BIGINT, v STRING, _graft_file STRING")
        .option("withfilepath", "true").load(d2)
        .writeStream.format("memory").queryName("avro_rail_fp")
        .option("checkpointLocation", dir("rails_ckpt2"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(msgs(e2).exists(_.contains("withFilePath")), msgs(e2).mkString(" | "))
    // the TEXT lanes have the same rail: a streamed schema naming a
    // partition column (which whole-file admission cannot serve) refuses
    // loudly instead of reading silent NULLs
    val d3 = dir("rails3")
    (0L until 20L).map(i => (i, s"r$i", i % 2)).toDF("id", "v", "k")
      .repartition(1)
      .write.format("graft-json").option("partitionby", "k")
      .mode("overwrite").save(d3)
    val e3 = intercept[Exception] {
      spark.readStream.format("graft-json")
        .schema("id BIGINT, v STRING, k BIGINT").load(d3)
        .writeStream.format("memory").queryName("json_rail_part")
        .option("checkpointLocation", dir("rails_ckpt3"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(msgs(e3).exists(_.contains("silent NULLs")), msgs(e3).mkString(" | "))
    // a schema WITHOUT the partition column streams the same layout fine
    val q = spark.readStream.format("graft-json").schema("id BIGINT, v STRING")
      .load(d3)
      .writeStream.format("memory").queryName("json_rail_ok")
      .option("checkpointLocation", dir("rails_ckpt4"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.sql("SELECT id FROM json_rail_ok").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L until 20L))
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
