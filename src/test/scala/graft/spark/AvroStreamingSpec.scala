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

  test("maxfilespertrigger paces whole-file admission") {
    val d = dir("paced")
    writeRows(d, 0L, 40L, "overwrite") // 2 files
    writeRows(d, 40L, 80L, "append")   // 2 more
    val q = spark.readStream.format("graft-avro").schema(schema)
      .option("followlog", "true").option("maxfilespertrigger", "1").load(d)
      .writeStream.format("memory").queryName("avro_paced")
      .option("checkpointLocation", dir("paced_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.sql("SELECT id FROM avro_paced").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L until 80L))
    // 4 files at 1 file/trigger → at least 4 batches
    assert(spark.sql("SELECT count(DISTINCT id) FROM avro_paced")
      .collect()(0).getLong(0) === 80L)
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
