package graft.spark

import graft.api.TrainingData
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Commit-log checkpoints (the Delta `_last_checkpoint` shape): every
  * N commits the log also records the FOLDED live-file set, so snapshot
  * planning reads checkpoint + suffix instead of O(#commits) entries.
  *
  * Soundness properties under test:
  *  - auto-checkpoint lands at the configured interval; reads at or
  *    after it never open the pre-checkpoint entries (poisoned-log proof)
  *  - a corrupt checkpoint falls back to the full fold (never wrong)
  *  - COW removes fold exactly across the checkpoint boundary
  *  - expireLogHistory: earliest readable version = the checkpoint;
  *    older pinned reads and changesSinceVersion fail LOUDLY with an
  *    "expired" error; vacuum reclaims pre-checkpoint retired files but
  *    never the checkpoint-referenced live set
  *  - a partial fold (expired prefix + unreadable checkpoint) is refused
  */
class CommitLogCheckpointSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-ckpt-spec")
  private val schema = "id BIGINT, name STRING"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("commit-log-checkpoint-spec")
      .config("spark.sql.shuffle.partitions", "2")
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

  private def hconf = spark.sparkContext.hadoopConfiguration
  private def fsOf(dir: String) = new Path(dir).getFileSystem(hconf)

  private def df(range: Range) = {
    val s = spark
    import s.implicits._
    range.map(i => (i.toLong, s"name-$i")).toDF("id", "name")
  }

  test("commit-time conflict detection: a stale rewrite aborts; the log stays clean") {
    val d = root.resolve("conflict").toString
    df(0 until 10).repartition(2)
      .write.format("graft-json").mode("overwrite").save(d) // v0
    val rootP = new Path(d)
    val fs = rootP.getFileSystem(hconf)
    val log = GraftCommitLog
    val victim = log.liveFilesAsOf(fs, rootP, log.versions(fs, rootP).max).head
    // v1: a legitimate rewrite retires `victim`
    log.appendEntry(hconf, d, adds = Seq("rewrite-1.jsonl"), removes = Seq(victim))
    // a RACING rewrite, phase-1'd against the OLD snapshot, tries to
    // retire the same file — must abort loudly, publishing nothing
    val e = intercept[java.util.ConcurrentModificationException] {
      log.appendEntry(hconf, d, adds = Seq("rewrite-2.jsonl"), removes = Seq(victim))
    }
    assert(e.getMessage.contains("concurrent rewrite"), e.getMessage)
    // the log is NOT poisoned: versions fold cleanly, the aborted entry
    // left no file, and the next commit allocates the next slot
    assert(log.versions(fs, rootP) === Seq(0L, 1L))
    val live = log.liveFilesAsOf(fs, rootP, 1L)
    assert(live.contains("rewrite-1.jsonl") && !live.contains(victim))
    assert(log.appendEntry(hconf, d, adds = Seq("append-2.jsonl")) === 2L)
  }

  test("followLog on expired history seeds from the checkpoint live set") {
    val d = root.resolve("follow-expired").toString
    (0 until 7).foreach { i =>
      df(i * 10 until i * 10 + 10).coalesce(1).write.format("graft-json")
        .mode(if (i == 0) "overwrite" else "append").save(d)
    }
    TrainingData.checkpointLog(spark, d)
    TrainingData.expireLogHistory(spark, d)
    // the raw prefix is gone; new commits keep landing
    df(100 until 110).coalesce(1).write.format("graft-json").mode("append").save(d)
    val rootP = new Path(d)
    val fs = rootP.getFileSystem(hconf)
    assert(GraftCommitLog.versions(fs, rootP).min > 0L) // expiry really happened
    val streamed = GraftSources.logOrderedFiles(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", d))).map(_._1).toSet
    val onDisk = fs.listStatus(rootP).map(_.getPath)
      .filter(p => p.getName.endsWith(".jsonl") && !p.getName.startsWith("."))
      .map(p => fs.makeQualified(p).toString).toSet
    // every committed file enters the stream exactly once — the expired
    // prefix via the checkpoint live set, the suffix via its entries
    assert(streamed === onDisk)
    assert(GraftSources.logOrderedFiles(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", d))).size === onDisk.size)
  }

  test("followLog detects files rewritten away under the stream (expired history)") {
    val d = root.resolve("follow-rewrite").toString
    (0 until 6).foreach { i =>
      df(i * 20 until i * 20 + 20).coalesce(1).write.format("graft-json")
        .mode(if (i == 0) "overwrite" else "append").save(d)
    }
    val ckp = root.resolve("follow-rewrite-ckpt").toString
    def opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", d, "followlog", "true"))
    val reg1 = new StreamFileRegistry(opts, ckp)
    assert(reg1.fileCount === 6)
    // a COW rewrite retires two delivered files, then the history expires
    // behind a checkpoint — the rewrite entry itself is no longer there
    // to fail the stream loudly
    TrainingData.deleteWhere(spark, d, schema, "id < 40")
    TrainingData.checkpointLog(spark, d)
    TrainingData.expireLogHistory(spark, d)
    val e = intercept[IllegalStateException] {
      new StreamFileRegistry(opts, ckp) // restarted stream, same registry
    }
    assert(e.getMessage.contains("no longer in the table's log"), e.getMessage)
  }

  private def readAsOf(dir: String, v: Long) =
    spark.read.format("graft-json").schema(schema)
      .option("versionAsOf", v.toString).load(dir)

  private def readLatest(dir: String) =
    spark.read.format("graft-json").schema(schema).load(dir)

  /** Overwrite each raw entry below `below` with garbage bytes: any read
    * that touches them fails; reads that succeed PROVE they seeded from
    * the checkpoint.
    */
  private def poisonEntriesBelow(dir: String, below: Long): Unit = {
    val fs = fsOf(dir)
    val rootP = new Path(dir)
    GraftCommitLog.versions(fs, rootP).filter(_ < below).foreach { v =>
      val p = new Path(GraftCommitLog.logDir(rootP), f"$v%020d")
      val out = fs.create(p, true)
      try out.write("#### poisoned ####\n".getBytes("UTF-8")) finally out.close()
    }
  }

  private def withInterval[T](n: Int)(body: => T): T = {
    val prior = hconf.get(GraftCommitLog.CheckpointIntervalKey)
    hconf.setInt(GraftCommitLog.CheckpointIntervalKey, n)
    try body
    finally {
      if (prior == null) hconf.unset(GraftCommitLog.CheckpointIntervalKey)
      else hconf.set(GraftCommitLog.CheckpointIntervalKey, prior)
    }
  }

  test("auto-checkpoint at the interval; reads at/after it skip the poisoned prefix") {
    val dir = root.resolve("auto").toString
    withInterval(4) {
      df(0 until 2).write.format("graft-json").mode("overwrite").save(dir) // v0
      (1 to 6).foreach { i =>                                              // v1..v6
        df(i * 2 until (i + 1) * 2).write.format("graft-json").mode("append").save(dir)
      }
    }
    val fs = fsOf(dir)
    assert(GraftCommitLog.checkpointVersions(fs, new Path(dir)) == Seq(4L))

    poisonEntriesBelow(dir, 4L)
    // latest (= v6) and pinned v4/v5 seed from the checkpoint: exact
    assert(readLatest(dir).count() === 14)
    assert(readAsOf(dir, 4).agg(sum("id")).head.getLong(0) === (0 until 10).sum)
    assert(readAsOf(dir, 5).count() === 12)
    // a pre-checkpoint pin must now fail (its entries are poisoned) —
    // loudly, not wrongly
    intercept[Exception](readAsOf(dir, 2).count())
  }

  test("corrupt checkpoint falls back to the full fold, never a wrong set") {
    // genuinely CORRUPT (unrecognizable header) — a well-formed header
    // declaring a NEWER protocol is a different class and fails loudly
    // with the upgrade-shaped message (ProtocolCeilingSpec)
    val dir = root.resolve("corrupt").toString
    df(0 until 3).write.format("graft-json").mode("overwrite").save(dir) // v0
    df(3 until 7).write.format("graft-json").mode("append").save(dir)   // v1
    TrainingData.checkpointLog(spark, dir)
    val fs = fsOf(dir)
    val ck = GraftCommitLog.checkpointFile(new Path(dir), 1L)
    val out = fs.create(ck, true)
    try out.write("not-a-checkpoint-at-all\ngarbage\n".getBytes("UTF-8")) finally out.close()
    assert(readLatest(dir).count() === 7)
    assert(readAsOf(dir, 1).agg(sum("id")).head.getLong(0) === (0 until 7).sum)
  }

  test("COW removes fold exactly across the checkpoint boundary") {
    val dir = root.resolve("cow").toString
    df(0 until 10).write.format("graft-json").mode("overwrite").save(dir)       // v0
    df(10 until 20).write.format("graft-json").mode("append").save(dir)         // v1
    TrainingData.deleteWhere(spark, dir, schema, "id >= 15", retainHistory = true) // v2
    TrainingData.checkpointLog(spark, dir)                                      // ckpt @ 2
    df(20 until 25).write.format("graft-json").mode("append").save(dir)         // v3
    TrainingData.deleteWhere(spark, dir, schema, "id < 5", retainHistory = true)   // v4

    assert(readAsOf(dir, 4).collect().map(_.getLong(0)).sorted.toSeq ===
      ((5L until 15L) ++ (20L until 25L)))
    assert(readAsOf(dir, 2).collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 15L))
    // the v2 read crosses INTO the checkpoint; v1 predates it (full fold)
    assert(readAsOf(dir, 1).count() === 20)
  }

  test("expireLogHistory: loud failures below the checkpoint, orphaned retirements reclaimed") {
    val dir = root.resolve("expire").toString
    df(0 until 10).write.format("graft-json").mode("overwrite").save(dir)          // v0
    TrainingData.deleteWhere(spark, dir, schema, "id < 3", retainHistory = true)   // v1
    df(10 until 14).write.format("graft-json").mode("append").save(dir)            // v2
    TrainingData.checkpointLog(spark, dir)                                         // ckpt @ 2
    df(14 until 16).write.format("graft-json").mode("append").save(dir)            // v3

    val diskBefore = new java.io.File(dir).listFiles
      .count(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    val expired = TrainingData.expireLogHistory(spark, dir)
    assert(expired === Seq(0L, 1L))

    // the v1 rewrite's retained original was referenced ONLY by expired
    // entries: expireLogHistory reclaims it (fuzz-found — leaving it
    // would shadow raw reads with pre-rewrite rows while expireRetired
    // no longer sees it), so the RAW read is exact again
    val diskAfter = new java.io.File(dir).listFiles
      .count(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(diskAfter === diskBefore - 1, s"$diskBefore -> $diskAfter")
    assert(readLatest(dir).count() === 13)
    assert(readAsOf(dir, 2).count() === 11)
    assert(readAsOf(dir, 3).count() === 13)
    // below the checkpoint: loud, targeted
    val e1 = intercept[Exception](readAsOf(dir, 1).count())
    assert(e1.getMessage.contains("expired"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("graft-json").schema(schema)
        .option("changesSinceVersion", "0").load(dir).count()
    }
    assert(e2.getMessage.contains("expired"), e2.getMessage)

    // nothing left for vacuum; live files untouched
    assert(TrainingData.vacuumOrphans(spark, dir).isEmpty)
    assert(readLatest(dir).count() === 13)
    assert(readAsOf(dir, 2).count() === 11)
  }

  test("expired prefix + unreadable checkpoint refuses a partial fold") {
    val dir = root.resolve("partial").toString
    df(0 until 4).write.format("graft-json").mode("overwrite").save(dir) // v0
    df(4 until 8).write.format("graft-json").mode("append").save(dir)   // v1
    df(8 until 12).write.format("graft-json").mode("append").save(dir)  // v2
    TrainingData.checkpointLog(spark, dir)                               // ckpt @ 2
    df(12 until 14).write.format("graft-json").mode("append").save(dir) // v3
    TrainingData.expireLogHistory(spark, dir)
    // now nuke the checkpoint: the only way to read v2/v3 is gone — a
    // fold of just the surviving suffix would be silently WRONG, so the
    // reader must refuse
    val fs = fsOf(dir)
    fs.delete(GraftCommitLog.checkpointFile(new Path(dir), 2L), false)
    val e = intercept[Exception](readAsOf(dir, 3).count())
    assert(e.getMessage.contains("refusing a partial fold"), e.getMessage)
  }

  test("expireLogHistory without a checkpoint refuses") {
    val dir = root.resolve("nock").toString
    df(0 until 3).write.format("graft-json").mode("overwrite").save(dir)
    val e = intercept[IllegalArgumentException](TrainingData.expireLogHistory(spark, dir))
    assert(e.getMessage.contains("checkpointLog"), e.getMessage)
  }

  test("optimizeTable leaves a checkpoint behind") {
    val dir = root.resolve("opt").toString
    df(0 until 20).repartition(4).write.format("graft-json").mode("overwrite").save(dir)
    df(20 until 40).repartition(4).write.format("graft-json").mode("append").save(dir)
    TrainingData.optimizeTable(spark, dir, schema, targetFileBytes = 1L << 20)
    val fs = fsOf(dir)
    val cks = GraftCommitLog.checkpointVersions(fs, new Path(dir))
    assert(cks.nonEmpty)
    // and the checkpoint is the optimized live set: a PINNED read at the
    // checkpoint survives a poisoned prefix (raw reads bypass the log)
    poisonEntriesBelow(dir, cks.max)
    assert(readAsOf(dir, cks.max).count() === 40)
  }
}
