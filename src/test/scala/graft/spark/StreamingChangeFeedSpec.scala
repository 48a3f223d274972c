package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** Streaming CHANGE DATA FEED (`readStream.option("readchangefeed",
  * "true")`, round 15 — Delta CDF streaming-read shape): commit-version
  * offsets, adds as `_change_type='insert'`, per-commit deletion-vector
  * deltas as `_change_type='delete'` (pre-image rows via the
  * inverse-selection mask), replay-idempotent restarts, the COW-retire
  * refusal (with the `skipchangecommits` dial), and batch-verb parity —
  * the stream's accumulated feed equals [[TrainingData.changeFeed]] over
  * the same version range.
  */
class StreamingChangeFeedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-cdf-stream")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("cdf-streaming-spec")
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
  private val cdfSchema = s"$schema, ${TrainingData.ChangeTypeCol} STRING"

  private def writeRows(d: String, from: Long, until: Long, mode: String,
      format: String = "graft-json"): Unit = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i, s"r$i")).toDF("id", "v").repartition(2)
      .write.format(format).mode(mode).save(d)
  }

  /** Drain the CDF stream once (AvailableNow) into a memory table and
    * return (id, changeType) pairs of THIS drain only.
    */
  private def drain(d: String, ckpt: String, name: String,
      since: Option[Long] = None, skipChange: Boolean = false,
      format: String = "graft-json",
      explicitSchema: Boolean = true): Seq[(Long, String)] = {
    var r = spark.readStream.format(format)
    if (explicitSchema) r = r.schema(cdfSchema)
    r = r.option("readchangefeed", "true")
    since.foreach(v => r = r.option("sinceversion", v.toString))
    if (skipChange) r = r.option("skipchangecommits", "true")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = r.load(d).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= b.collect().map(x =>
            (x.getLong(0), x.getString(x.length - 1)))
        }
        ()
      }
      .start()
    q.awaitTermination()
    rows.toSeq
  }

  test("full-history CDF stream: adds as inserts, DV deltas as deletes") {
    val d = dir("basic")
    writeRows(d, 0L, 20L, "overwrite") // v0
    writeRows(d, 20L, 30L, "append")   // v1
    val ckpt = dir("basic_ckpt")
    // sinceversion=-1: the whole history streams — both appends as inserts
    val first = drain(d, ckpt, "b1", since = Some(-1L))
    assert(first.count(_._2 == "insert") == 30)
    assert(first.forall(_._2 == "insert"))
    assert(first.map(_._1).sorted == (0L until 30L))

    // v2: DV delete of id % 5 == 0 → exactly those as deletes, nothing else
    TrainingData.deleteWhereDV(spark, d, schema, "id % 5 = 0")
    val second = drain(d, ckpt, "b2")
    assert(second.forall(_._2 == "delete"), s"got $second")
    assert(second.map(_._1).sorted == (0L until 30L).filter(_ % 5 == 0))

    // v3: a second DV delete — CUMULATIVE masks, only the NEW delta streams
    TrainingData.deleteWhereDV(spark, d, schema, "id % 3 = 0")
    val third = drain(d, ckpt, "b3")
    assert(third.forall(_._2 == "delete"))
    assert(third.map(_._1).sorted ==
      (0L until 30L).filter(i => i % 3 == 0 && i % 5 != 0))

    // no new commits: a re-drain on the same checkpoint emits NOTHING
    assert(drain(d, ckpt, "b4").isEmpty)

    // and a new append streams as inserts on the same checkpoint
    writeRows(d, 100L, 105L, "append")
    val fourth = drain(d, ckpt, "b5")
    assert(fourth.map(_._1).sorted == (100L until 105L) &&
      fourth.forall(_._2 == "insert"))
  }

  test("restart replay is idempotent: a wiped sink re-accumulates the identical feed") {
    val d = dir("replay")
    writeRows(d, 0L, 10L, "overwrite")
    TrainingData.deleteWhereDV(spark, d, schema, "id < 3")
    writeRows(d, 10L, 15L, "append")
    val ckpt = dir("replay_ckpt")
    val a = drain(d, ckpt, "r1", since = Some(-1L)).sorted
    // a FRESH checkpoint replays the identical feed (pure function of the log)
    val b = drain(d, dir("replay_ckpt2"), "r2", since = Some(-1L)).sorted
    assert(a == b)
    assert(a.count(_._2 == "delete") == 3 && a.count(_._2 == "insert") == 15)
  }

  test("default start is the latest version: only future commits stream") {
    val d = dir("tail")
    writeRows(d, 0L, 10L, "overwrite")
    val ckpt = dir("tail_ckpt")
    assert(drain(d, ckpt, "t1").isEmpty, "history must not stream by default")
    writeRows(d, 10L, 12L, "append")
    val got = drain(d, ckpt, "t2")
    assert(got.map(_._1).sorted == Seq(10L, 11L) && got.forall(_._2 == "insert"))
  }

  test("COW-retiring commits refuse loudly; skipchangecommits skips them whole") {
    val d = dir("cow")
    writeRows(d, 0L, 20L, "overwrite")
    val ckpt = dir("cow_ckpt")
    assert(drain(d, ckpt, "c1", since = Some(-1L)).count(_._2 == "insert") == 20)
    // a COW delete retires files — the stream must refuse
    TrainingData.deleteWhere(spark, d, schema, "id < 5")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(d, ckpt, "c2")
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      c.getMessage
    }
    assert(rootMsg(err).contains("cannot express") ||
      err.getMessage.contains("cannot express"))
    // the dial: skip the change commit whole, keep tailing later appends
    writeRows(d, 50L, 53L, "append")
    val got = drain(d, ckpt, "c3", skipChange = true)
    assert(got.map(_._1).sorted == (50L until 53L) && got.forall(_._2 == "insert"))
    // and a DV delta AFTER the skipped rewrite diffs against the rolled
    // state (the rewritten file's vector baseline is empty again)
    TrainingData.deleteWhereDV(spark, d, schema, "id = 51")
    val del = drain(d, ckpt, "c4", skipChange = true)
    assert(del == Seq((51L, "delete")))
  }

  test("expired history refuses loudly (full-refresh contract)") {
    val d = dir("expired")
    writeRows(d, 0L, 5L, "overwrite")           // v0
    writeRows(d, 5L, 10L, "append")             // v1
    writeRows(d, 10L, 15L, "append")            // v2
    TrainingData.checkpointLog(spark, d)
    TrainingData.expireLogHistory(spark, d)
    val vs = GraftCommitLog.versions(
      new org.apache.hadoop.fs.Path(d).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(d))
    assert(vs.min > 0, "history must actually have expired for this test")
    val err = intercept[Exception] { drain(d, dir("expired_ckpt"), "e1", since = Some(0L)) }
    assert(err.getMessage.contains("unknown version") ||
      err.getMessage.contains("expired"))
  }

  test("streamed feed equals the batch changeFeed over the same range (json + avro)") {
    for (format <- Seq("graft-json", "graft-avro")) {
      val d = dir(s"parity_$format")
      writeRows(d, 0L, 25L, "overwrite", format) // v0
      TrainingData.deleteWhereDV(spark, d, schema, "id % 4 = 1", format) // v1
      writeRows(d, 25L, 30L, "append", format)   // v2
      TrainingData.deleteWhereDV(spark, d, schema, "id % 9 = 2", format) // v3
      val streamed = drain(d, dir(s"parity_ckpt_$format"), "p1",
        since = Some(0L), format = format).sorted
      // the stream is PER-COMMIT (a row inserted then DV-deleted inside
      // the range emits both events, Delta's streaming shape); the batch
      // verb is NET-EFFECT — fold the stream's insert+delete pairs away
      // before comparing
      val net = streamed.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        val ins = evs.count(_._2 == "insert")
        val del = evs.count(_._2 == "delete")
        assert(ins <= 1 && del <= 1, s"$format: duplicate events $evs")
        if (ins == del) Nil else evs
      }.sorted
      val batch = TrainingData.changeFeed(spark, d, schema, 0L, format)
        .collect().map(r => (r.getLong(0), r.getString(r.length - 1))).toSeq.sorted
      assert(net == batch, s"$format: stream (net) vs batch changeFeed diverged\n" +
        s"stream: $streamed\nnet: $net\nbatch: $batch")
    }
  }

  test("CDF streams hive-partitioned tables: partition values + change type ride together") {
    val s = spark
    import s.implicits._
    val d = dir("parted")
    (0L until 20L).map(i => (i, s"r$i", if (i % 2 == 0) "eu" else "us"))
      .toDF("id", "v", "region")
      .write.format("graft-json").partitionBy("region").mode("overwrite").save(d)
    TrainingData.deleteWhereDV(spark, d, schema, "id < 4") // masks both regions
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q = spark.readStream.format("graft-json")
      .schema(s"$schema, region STRING, ${TrainingData.ChangeTypeCol} STRING")
      .option("readchangefeed", "true").option("sinceversion", "-1")
      .load(d).writeStream
      .option("checkpointLocation", dir("parted_ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= b.collect().map(x => (x.getLong(0), x.getString(2), x.getString(3)))
        }
        ()
      }
      .start()
    q.awaitTermination()
    val inserts = rows.filter(_._3 == "insert")
    val deletes = rows.filter(_._3 == "delete")
    assert(inserts.size == 20 && deletes.map(_._1).sorted == (0L until 4L))
    // the partition value is stamped per file for BOTH event kinds
    assert(inserts.forall(r => r._2 == (if (r._1 % 2 == 0) "eu" else "us")))
    assert(deletes.forall(r => r._2 == (if (r._1 % 2 == 0) "eu" else "us")))
  }

  test("schemaless CDF stream takes the recorded schema plus _change_type") {
    val d = dir("schemaless")
    writeRows(d, 0L, 5L, "overwrite")
    val df = spark.readStream.format("graft-json")
      .option("readchangefeed", "true").load(d)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", TrainingData.ChangeTypeCol))
    assert(df.schema.fields.last.dataType ==
      org.apache.spark.sql.types.StringType)
  }
}
