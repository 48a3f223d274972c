package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** CHANGE DATA FEED across COW rewrites (round 16, the Delta CDC-file
  * shape): `deleteWhere` / `updateWhere` / `deleteMatching` with
  * `changeDataFeed = true` record each rewrite's row-level pre/post
  * images under `.graft-cdc/`, attached to the SAME atomic commit entry
  * (v8 `c` lines); `changeFeed` switches to a per-commit walk — with a
  * `_commit_version` column — whenever the range retired files the
  * consumer already processed, and the streaming `readchangefeed` reader
  * consumes the artifacts instead of refusing. OPTIMIZE /
  * materializeDeletes commits contribute nothing (no logical change),
  * and an unrecorded rewrite still refuses loudly.
  */
class ChangeFeedCowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-cdf-cow")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("changefeed-cow-spec")
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

  private def writeTable(d: String, n: Long = 40L, parts: Int = 2,
      format: String = "graft-json"): Unit = {
    val s = spark
    import s.implicits._
    (0L until n).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(parts)
      .write.format(format).mode("overwrite").save(d)
  }

  private def snap(d: String, v: Long = -1L,
      format: String = "graft-json"): Set[(Long, String)] = {
    var r = spark.read.format(format).schema(schema)
    r = if (v >= 0) r.option("versionasof", v.toString)
        else r.option("snapshot", "true")
    r.load(d).collect().map(x => (x.getLong(0), x.getString(1))).toSet
  }

  /** Apply a per-commit feed to a base snapshot as a bag diff: minus
    * delete/update_preimage rows, plus insert/update_postimage rows.
    * The result must equal the end snapshot — the correctness contract
    * an incremental consumer relies on.
    */
  private def applyFeed(base: Set[(Long, String)], feed: DataFrame): Set[(Long, String)] = {
    val rows = feed.collect().map { r =>
      (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("v")),
        r.getString(r.fieldIndex(TrainingData.ChangeTypeCol)))
    }
    val dels = rows.collect {
      case (id, v, ct) if ct == "delete" || ct == "update_preimage" => (id, v) }
    val ins = rows.collect {
      case (id, v, ct) if ct == "insert" || ct == "update_postimage" => (id, v) }
    base -- dels ++ ins
  }

  test("updateWhere with CDC: the feed crosses the rewrite and nets to the snapshot") {
    val d = dir("upd")
    writeTable(d) // v0
    val s0 = snap(d, 0)
    val rewritten = TrainingData.updateWhere(spark, d, schema,
      "id % 10 = 3", Map("v" -> "concat(v, '!')"), changeDataFeed = true) // v1
    assert(rewritten.nonEmpty)
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    // per-commit mode: _commit_version present, exactly version 1
    assert(feed.columns.contains(TrainingData.CommitVersionCol))
    assert(feed.select(TrainingData.CommitVersionCol).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // pre/post images are exactly the matched rows, old and new values
    val byType = feed.collect().groupBy(_.getString(2))
    assert(byType.keySet == Set("update_preimage", "update_postimage"))
    val pre = byType("update_preimage").map(r => (r.getLong(0), r.getString(1))).toSet
    val post = byType("update_postimage").map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pre == s0.filter(_._1 % 10 == 3))
    assert(post == s0.filter(_._1 % 10 == 3).map { case (i, v) => (i, v + "!") })
    // and the bag application reproduces the latest snapshot
    assert(applyFeed(s0, feed) == snap(d))
  }

  test("deleteWhere with CDC + appends compose; unrecorded rewrite still refuses") {
    val d = dir("del")
    writeTable(d) // v0
    val s0 = snap(d, 0)
    val s = spark; import s.implicits._
    Seq((100L, "new1"), (101L, "new2")).toDF("id", "v")
      .repartition(1).write.format("graft-json").mode("append").save(d) // v1
    TrainingData.deleteWhere(spark, d, schema, "id < 5",
      retainHistory = true, changeDataFeed = true) // v2
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(applyFeed(s0, feed) == snap(d))
    val types = feed.select(TrainingData.ChangeTypeCol).distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("insert", "delete"))
    // an un-CDC'd rewrite in a later range refuses with guidance
    TrainingData.deleteWhere(spark, d, schema, "id >= 100",
      retainHistory = true) // v3, no change data
    val e = intercept[IllegalStateException] {
      TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L).collect()
    }
    assert(e.getMessage.contains("changeDataFeed"))
    // ...while a range that ends BEFORE it still works
    assert(applyFeed(s0, TrainingData.changeFeed(spark, d, schema,
      sinceVersion = 0L, untilVersion = 2L)) == snap(d, 2))
  }

  test("OPTIMIZE and materializeDeletes contribute no feed rows") {
    val d = dir("opt")
    writeTable(d, parts = 4) // v0
    val s0 = snap(d, 0)
    TrainingData.deleteWhereDV(spark, d, schema, "id % 7 = 0") // v1 (DV)
    TrainingData.optimizeTable(spark, d, schema,
      targetFileBytes = 1L << 20, retainHistory = true) // v2 (rewrite, tagged)
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    // only the DV deletes surface; the compaction is silent
    assert(feed.select(TrainingData.ChangeTypeCol).distinct()
      .collect().map(_.getString(0)).toSet == Set("delete"))
    assert(applyFeed(s0, feed) == snap(d))
    TrainingData.materializeDeletes(spark, d, schema, retainHistory = true) // v3
    assert(applyFeed(s0,
      TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)) == snap(d))
  }

  test("DV deltas, CDC updates, and a restore compose in one per-commit range") {
    val d = dir("mix")
    writeTable(d) // v0
    val s0 = snap(d, 0)
    TrainingData.deleteWhereDV(spark, d, schema, "id = 1") // v1
    TrainingData.updateWhere(spark, d, schema, "id = 2",
      Map("v" -> "'two'"), retainHistory = true, changeDataFeed = true) // v2
    val feedTo2 = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(applyFeed(s0, feedTo2) == snap(d))
    // restore to v1: the CDC rewrite's files retire, the originals re-pin
    TrainingData.restoreTable(spark, d, 1L) // v3
    val feedAll = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(applyFeed(s0, feedAll) == snap(d))
    assert(snap(d) == snap(d, 1))
  }

  test("session-wide conf key records CDC without the per-call flag") {
    val d = dir("conf")
    writeTable(d)
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setBoolean("graft.cdf.enabled", true)
    try TrainingData.deleteWhere(spark, d, schema, "id = 0", retainHistory = true)
    finally hconf.unset("graft.cdf.enabled")
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(feed.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((0L, "delete")))
  }

  test("deleteMatching records CDC deletes (the upsert delete phase)") {
    val d = dir("match")
    writeTable(d)
    val s0 = snap(d, 0)
    val s = spark; import s.implicits._
    TrainingData.deleteMatching(spark, d, schema,
      Seq(3L, 5L).toDF("id"), Seq("id"),
      retainHistory = true, changeDataFeed = true)
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(feed.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set((3L, "delete"), (5L, "delete")))
    assert(applyFeed(s0, feed) == snap(d))
  }

  test("orphan change-data debris from an aborted rewrite never surfaces") {
    val d = dir("orphan")
    writeTable(d)
    val s0 = snap(d, 0)
    TrainingData.updateWhere(spark, d, schema, "id = 4",
      Map("v" -> "'four'"), retainHistory = true, changeDataFeed = true)
    // simulate a crashed rewrite: a stray uncommitted cdc file
    val cdc = root.resolve("orphan").resolve(".graft-cdc")
    Files.write(cdc.resolve("cdc-deadbeef-delete-0-part.jsonl"),
      "{\"id\": 999, \"v\": \"ghost\"}\n".getBytes("UTF-8"))
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(!feed.collect().exists(_.getLong(0) == 999L))
    assert(applyFeed(s0, feed) == snap(d))
  }

  test("vacuum reclaims orphan/expired cdc debris, retains referenced artifacts") {
    val d = dir("vac")
    writeTable(d) // v0
    TrainingData.updateWhere(spark, d, schema, "id = 2",
      Map("v" -> "'two'"), retainHistory = true, changeDataFeed = true) // v1
    val cdcDir = root.resolve("vac").resolve(".graft-cdc")
    val referenced = java.nio.file.Files.list(cdcDir).toArray.map(_.toString)
    assert(referenced.nonEmpty)
    // debris: an orphan cdc file (aborted rewrite) and an abandoned stage
    java.nio.file.Files.write(cdcDir.resolve("cdc-orphan-delete-0-part.jsonl"),
      "{\"id\": 1, \"v\": \"x\"}\n".getBytes("UTF-8"))
    java.nio.file.Files.createDirectories(cdcDir.resolve("_tmp-dead"))
    java.nio.file.Files.write(cdcDir.resolve("_tmp-dead").resolve("part-0.jsonl"),
      "{}\n".getBytes("UTF-8"))
    val dry = TrainingData.vacuumOrphans(spark, d, dryRun = true)
    assert(dry.contains(".graft-cdc/cdc-orphan-delete-0-part.jsonl"), dry.toString)
    assert(dry.contains(".graft-cdc/_tmp-dead"))
    val gone = TrainingData.vacuumOrphans(spark, d)
    assert(gone.contains(".graft-cdc/cdc-orphan-delete-0-part.jsonl"))
    assert(!java.nio.file.Files.exists(cdcDir.resolve("cdc-orphan-delete-0-part.jsonl")))
    assert(!java.nio.file.Files.exists(cdcDir.resolve("_tmp-dead")))
    // the REFERENCED artifacts survive, and the feed still reads exactly
    referenced.foreach(f => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f))))
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 0L)
    assert(feed.count() == 2L) // pre + post image
    // a young orphan is retained under VACUUM RETAIN (mtime age gate)
    java.nio.file.Files.write(cdcDir.resolve("cdc-young-delete-0-part.jsonl"),
      "{}\n".getBytes("UTF-8"))
    val kept = TrainingData.vacuumOrphans(spark, d, retainMillis = 3600000L)
    assert(!kept.exists(_.contains("cdc-young")))
    assert(java.nio.file.Files.exists(cdcDir.resolve("cdc-young-delete-0-part.jsonl")))
  }

  test("PARTITIONED tables record and replay CDC: k=v paths carry the values") {
    val d = dir("part")
    val pschema = "id BIGINT, v STRING, p STRING"
    val s = spark; import s.implicits._
    (0L until 20L).map(i => (i, s"r$i", s"p${i % 2}")).toDF("id", "v", "p")
      .write.format("graft-json").option("partitionby", "p")
      .mode("overwrite").save(d)                                        // v0
    def psnap(v: Long = -1L): Set[(Long, String, String)] = {
      var r = spark.read.format("graft-json").schema(pschema)
      r = if (v >= 0) r.option("versionasof", v.toString)
          else r.option("snapshot", "true")
      r.load(d).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
    }
    val s0 = psnap(0)
    TrainingData.updateWhere(spark, d, pschema, "id % 4 = 1",
      Map("v" -> "upper(v)"), retainHistory = true, changeDataFeed = true) // v1
    TrainingData.deleteWhere(spark, d, pschema, "id >= 16",
      retainHistory = true, changeDataFeed = true)                         // v2
    val feed = TrainingData.changeFeed(spark, d, pschema, sinceVersion = 0L)
    val rows = feed.collect().map { r =>
      (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("v")),
        r.getString(r.fieldIndex("p")),
        r.getString(r.fieldIndex(TrainingData.ChangeTypeCol)))
    }
    // partition values came back from the k=v paths, exact per row
    assert(rows.forall { case (id, _, p, _) => p == s"p${id % 2}" }, rows.toSeq.toString)
    // per-commit replay (the _commit_version ordering the column exists
    // for): the same row can be inserted by one commit and deleted by a
    // later one, so set-at-once application would cancel wrongly
    val byV = feed.collect().groupBy(_.getLong(feed.schema.fieldIndex(
      TrainingData.CommitVersionCol))).toSeq.sortBy(_._1)
    var state = s0
    byV.foreach { case (_, rs) =>
      val d0 = rs.filter(r => Set("delete", "update_preimage")(r.getString(3)))
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val i0 = rs.filter(r => Set("insert", "update_postimage")(r.getString(3)))
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      state = state -- d0 ++ i0
    }
    assert(state == psnap())
    // streaming consumes the partitioned artifacts too
    val q = spark.readStream.format("graft-json")
      .schema(pschema + ", _change_type STRING")
      .option("readchangefeed", "true").option("sinceversion", "0")
      .load(d)
      .writeStream.format("memory").queryName("cdf_part_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("cdf_part_stream").collect().map { r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)) }.toSet
    assert(got.contains((1L, "r1", "p1", "update_preimage")))
    assert(got.contains((1L, "R1", "p1", "update_postimage")))
    assert(got.contains((16L, "r16", "p0", "delete")))
    assert(got.forall { case (id, _, p, _) => p == s"p${id % 2}" })
  }

  test("deleteWhereDV ESCALATION with CDC: artifacts + light-file deltas compose") {
    val d = dir("esc")
    val s = spark; import s.implicits._
    // two files: one HEAVY-hit (escalates under the density dial), one
    // lightly hit (stays on a vector)
    (0L until 10L).map(i => (i, s"a$i")).toDF("id", "v")
      .repartition(1).write.format("graft-json").mode("overwrite").save(d)
    (100L until 140L).map(i => (i, s"b$i")).toDF("id", "v")
      .repartition(1).write.format("graft-json").mode("append").save(d) // v1
    val s0 = snap(d)
    // deletes 8/10 rows of file A (escalates at 0.5), 1/40 of file B
    val touched = TrainingData.deleteWhereDV(spark, d, schema,
      "(id < 8) OR (id = 100)", dvMaxRatio = 0.5,
      retainHistory = true, changeDataFeed = true) // v2 (combined entry)
    assert(touched.size == 2)
    val feed = TrainingData.changeFeed(spark, d, schema, sinceVersion = 1L)
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(r.fieldIndex(TrainingData.ChangeTypeCol))))
    assert(rows.forall(_._3 == "delete"))
    assert(rows.map(_._1).toSet == ((0L until 8L).toSet + 100L), rows.toSeq.toString)
    assert(applyFeed(s0, feed) == snap(d))
    // streaming composes the same entry
    val q = spark.readStream.format("graft-json")
      .schema(schema + ", _change_type STRING")
      .option("readchangefeed", "true").option("sinceversion", "1")
      .load(d)
      .writeStream.format("memory").queryName("cdf_esc_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("cdf_esc_stream").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == ((0L until 8L).map((_, "delete")).toSet + ((100L, "delete"))))
  }

  test("avro tables record and replay CDC the same way") {
    val d = dir("avro")
    writeTable(d, format = "graft-avro")
    val s0 = snap(d, 0, format = "graft-avro")
    TrainingData.updateWhere(spark, d, schema, "id % 5 = 1",
      Map("v" -> "upper(v)"), format = "graft-avro",
      retainHistory = true, changeDataFeed = true)
    val feed = TrainingData.changeFeed(spark, d, schema,
      sinceVersion = 0L, format = "graft-avro")
    assert(applyFeed(s0, feed) == snap(d, format = "graft-avro"))
  }

  test("streaming readchangefeed consumes CDC commits and skips OPTIMIZE") {
    val d = dir("stream")
    writeTable(d) // v0
    TrainingData.updateWhere(spark, d, schema, "id = 7",
      Map("v" -> "'seven'"), retainHistory = true, changeDataFeed = true) // v1
    TrainingData.optimizeTable(spark, d, schema,
      targetFileBytes = 1L << 20, retainHistory = true) // v2 (skipped)
    TrainingData.deleteWhere(spark, d, schema, "id = 9",
      retainHistory = true, changeDataFeed = true) // v3
    val q = spark.readStream.format("graft-json")
      .schema(schema + ", _change_type STRING")
      .option("readchangefeed", "true").option("sinceversion", "0")
      .load(d)
      .writeStream.format("memory").queryName("cdf_cow_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("cdf_cow_stream")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(r.fieldIndex(TrainingData.ChangeTypeCol)))).toSet
    assert(got.contains((7L, "r7", "update_preimage")))
    assert(got.contains((7L, "seven", "update_postimage")))
    assert(got.contains((9L, "r9", "delete")))
    // nothing from the optimize commit: every feed row is one of the
    // three logical changes
    assert(got.forall { case (id, _, ct) =>
      (id == 7L && ct.startsWith("update_")) || (id == 9L && ct == "delete") })
  }

  test("streaming readchangefeed still refuses an unrecorded rewrite, with guidance") {
    val d = dir("streamrefuse")
    writeTable(d)
    TrainingData.deleteWhere(spark, d, schema, "id = 3", retainHistory = true)
    val q = spark.readStream.format("graft-json")
      .schema(schema + ", _change_type STRING")
      .option("readchangefeed", "true").option("sinceversion", "0")
      .load(d)
      .writeStream.format("memory").queryName("cdf_cow_refuse")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("changeDataFeed") ||
      e.getCause.getMessage.contains("changeDataFeed"))
  }
}
