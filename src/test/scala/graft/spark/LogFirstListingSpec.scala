package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Local filesystem that RECORDS every listStatus target — the planning-
  * cost witness for log-first reads ("no recursive list RPC on a logged
  * table" must be asserted, not assumed; running as root defeats
  * permission-based tricks).
  */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: java.net.URI = java.net.URI.create("countfs:///")
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    CountingLocalFs.listed.add(p.toUri.getPath)
    super.listStatus(p)
  }
}
object CountingLocalFs {
  val listed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def reset(): Unit = listed.clear()
  def listedDirs: Set[String] = {
    val it = listed.iterator()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

/** Log-first listing (round 13, Delta semantics): an OPTION-FREE read of
  * a table that has a commit log reads its latest committed snapshot —
  * retained-retired originals, rogue out-of-band copies, and in-flight
  * writers are invisible — and planning enumerates from the log
  * (checkpoint + suffix + one non-recursive listStatus per live
  * directory), never a recursive tree walk. Raw directory semantics stay
  * behind option("rawlisting","true"); logless directories are untouched.
  */
class LogFirstListingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-logfirst")
  private val schema = "id BIGINT, v STRING"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("log-first-listing-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingLocalFs].getName)
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def conf = spark.sparkContext.hadoopConfiguration
  private def dir(name: String): String = root.resolve(name).toString

  private def writeTable(d: String, n: Long = 40L): Unit = {
    val s = spark
    import s.implicits._
    (0L until n).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(2).write.format("graft-json").mode("overwrite").save(d)
  }

  private def rogue(d: String, name: String, rows: Seq[Long]): Unit = {
    val p = new Path(d, name)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try rows.foreach(i => out.write(s"""{"id":$i,"v":"rogue"}\n""".getBytes("UTF-8")))
    finally out.close()
  }

  test("option-free read of a logged table = latest snapshot (retirees + rogues invisible)") {
    val d = dir("default_snap")
    writeTable(d)
    // COW delete with retained history: the retired originals STAY on
    // disk — a raw listing reads every surviving row twice
    graft.api.TrainingData.deleteWhere(spark, d, schema, "id >= 30",
      retainHistory = true)
    rogue(d, "rogue-copy.jsonl", Seq(900L, 901L))
    val df = spark.read.format("graft-json").schema(schema).load(d) // option-free
    assert(df.count() === 30L)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      === (0L until 30L).sum)
    // the raw lane still exists, opt-in, and sees everything on disk:
    // retirees (all 40 originals) + live rewrites (30) + rogue rows (2)
    val raw = spark.read.format("graft-json").schema(schema)
      .option("rawlisting", "true").load(d)
    assert(raw.count() === 72L)
    // rawlisting contradicts the pinned modes
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-json").schema(schema)
        .option("rawlisting", "true").option("snapshot", "true").load(d).count()
    }
    assert(e.getMessage.contains("rawlisting"), e.getMessage)
  }

  test("planning never recursively lists a logged table (counting-fs witness)") {
    val d = s"countfs://${dir("no_walk")}"
    writeTable(d)
    // a rogue SUBTREE a recursive walk would descend into
    val sub = new Path(d, "rogue_sub/deeper")
    val fs = sub.getFileSystem(conf)
    fs.mkdirs(sub)
    rogue(d, "rogue_sub/deeper/junk.jsonl", Seq(999L))
    CountingLocalFs.reset()
    val got = spark.read.format("graft-json").schema(schema).load(d).count()
    assert(got === 40L)
    val listedDirs = CountingLocalFs.listedDirs
    val rootPath = new Path(d).toUri.getPath
    assert(!listedDirs.exists(_.contains("rogue_sub")),
      s"planning descended into a rogue subtree: $listedDirs")
    // exactly the log dir + the one live-file directory (the root)
    assert(listedDirs.forall(p =>
      p == rootPath || p.startsWith(s"$rootPath/.graft-log")),
      s"unexpected listing targets: $listedDirs")
  }

  test("log-first reads of a hive-partitioned table derive partition columns from the log") {
    val s = spark
    import s.implicits._
    val d = dir("parted")
    (0L until 40L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "seg")
      .repartition(2).write.format("graft-json").option("partitionby", "seg")
      .mode("overwrite").save(d)
    rogue(d, "seg=c/rogue.jsonl", Seq(777L)) // rogue partition, never committed
    // schemaless: inference + the partition column both ride the pinned
    // (log-mediated) listing
    val df = spark.read.format("graft-json").load(d)
    assert(df.schema.fieldNames.contains("seg"), df.schema.fieldNames.toSeq)
    assert(df.count() === 40L)
    assert(df.filter($"seg" === "a").count() === 20L)
    assert(df.filter($"seg" === "c").count() === 0L, "rogue partition must be invisible")
    // raw listing still sees the rogue partition (documented escape hatch)
    assert(spark.read.format("graft-json")
      .option("rawlisting", "true").load(d)
      .filter($"seg" === "c").count() === 1L)
  }

  test("logless directories keep raw-walk semantics (no behavior change)") {
    val d = dir("logless")
    rogue(d, "a.jsonl", Seq(1L, 2L))
    rogue(d, "nested/b.jsonl", Seq(3L))
    val df = spark.read.format("graft-json").schema(schema).load(d)
    assert(df.count() === 3L)
  }

  test("a log created OVER a legacy directory is partial: default reads stay raw until adoption") {
    val s = spark
    import s.implicits._
    val d = dir("legacy_adopt")
    // pre-log legacy data, written out-of-band
    rogue(d, "legacy-a.jsonl", Seq(100L, 101L))
    rogue(d, "legacy-b.jsonl", Seq(102L))
    // an append CREATES the log — it cannot cover the legacy files, so
    // the commit stamps the _partial marker and default reads keep the
    // raw walk (losing the legacy rows would be silent data loss)
    Seq((1L, "x")).toDF("id", "v").coalesce(1)
      .write.format("graft-json").mode("append").save(d)
    val fs = new Path(d).getFileSystem(conf)
    val marker = new Path(GraftCommitLog.logDir(new Path(d)),
      GraftCommitLog.PartialLogMarker)
    assert(fs.exists(marker), "_partial marker must be stamped")
    assert(spark.read.format("graft-json").schema(schema).load(d).count() === 4L)
    // explicit adoption (the Delta CONVERT shape) upgrades the table
    val adopted = graft.api.TrainingData.adoptUnlogged(spark, d)
    assert(adopted === Seq("legacy-a.jsonl", "legacy-b.jsonl"))
    assert(!fs.exists(marker))
    // now the default is log-first: a new rogue file is invisible
    rogue(d, "rogue-late.jsonl", Seq(999L))
    assert(spark.read.format("graft-json").schema(schema).load(d).count() === 4L)
    // adoption is idempotent (retired/referenced files never re-adopt)
    assert(graft.api.TrainingData.adoptUnlogged(spark, d) ===
      Seq("rogue-late.jsonl")) // the rogue IS unlogged — explicit adopt takes it
    assert(spark.read.format("graft-json").schema(schema).load(d).count() === 5L)
  }

  test("a later commit HEALS a stamped _partial once the log covers the tree") {
    val s = spark
    import s.implicits._
    // two racing FIRST commits each see the other's published-but-
    // uncommitted files as foreign and both stamp _partial — yet once
    // both land, the log covers every visible file. Simulate the
    // post-race state: a covered table whose marker is stamped.
    val d = dir("partial_heal")
    writeTable(d)
    val fs = new Path(d).getFileSystem(conf)
    val marker = new Path(GraftCommitLog.logDir(new Path(d)),
      GraftCommitLog.PartialLogMarker)
    fs.create(marker, true).close()
    // marker respected while present: a rogue-free tree still reads raw
    assert(fs.exists(marker))
    // the next commit re-checks coverage and lifts the marker
    Seq((900L, "x")).toDF("id", "v").coalesce(1)
      .write.format("graft-json").mode("append").save(d)
    assert(!fs.exists(marker), "covered tree must heal the race-stamped marker")
    // and default reads are log-first again: a rogue file is invisible
    rogue(d, "rogue-post-heal.jsonl", Seq(999L))
    assert(spark.read.format("graft-json").schema(schema).load(d).count() === 41L)
    // ...but a GENUINELY uncovered file keeps the marker on later commits
    val d2 = dir("partial_keep")
    writeTable(d2)
    val fs2 = new Path(d2).getFileSystem(conf)
    val marker2 = new Path(GraftCommitLog.logDir(new Path(d2)),
      GraftCommitLog.PartialLogMarker)
    fs2.create(marker2, true).close()
    rogue(d2, "legacy-real.jsonl", Seq(700L))
    Seq((901L, "y")).toDF("id", "v").coalesce(1)
      .write.format("graft-json").mode("append").save(d2)
    assert(fs2.exists(marker2), "uncovered legacy file must keep the marker")
    assert(spark.read.format("graft-json").schema(schema).load(d2).count() === 42L,
      "partial table reads stay raw (legacy row included)")

    // THROTTLE (round 14): the failed heal stamps its fold version into
    // the marker (readers only test existence), and commits within one
    // checkpoint interval skip the O(history + tree) re-check — even one
    // that would now succeed
    val content = {
      val in = fs2.open(marker2)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    assert(content.trim.nonEmpty && content.trim.forall(_.isDigit),
      s"failed heal must stamp the checked version, got '$content'")
    fs2.delete(new Path(d2, "legacy-real.jsonl"), false) // tree is now covered
    Seq((902L, "z")).toDF("id", "v").coalesce(1)
      .write.format("graft-json").mode("append").save(d2)
    assert(fs2.exists(marker2), "heal re-check inside the interval must be skipped")
    // once the log advances past the interval, the re-check runs and heals
    val prior = conf.get(GraftCommitLog.CheckpointIntervalKey)
    conf.setInt(GraftCommitLog.CheckpointIntervalKey, 1)
    try {
      Seq((903L, "w")).toDF("id", "v").coalesce(1)
        .write.format("graft-json").mode("append").save(d2)
      assert(!fs2.exists(marker2), "past the interval the heal must run and lift")
    } finally {
      if (prior == null) conf.unset(GraftCommitLog.CheckpointIntervalKey)
      else conf.set(GraftCommitLog.CheckpointIntervalKey, prior)
    }
  }

  test("a fresh sink-written table never marks partial (own files are covered)") {
    val d = dir("fresh_no_marker")
    writeTable(d)
    val fs = new Path(d).getFileSystem(conf)
    assert(!fs.exists(new Path(GraftCommitLog.logDir(new Path(d)),
      GraftCommitLog.PartialLogMarker)))
  }

  test("a vacuumed-away live file fails the log-first read loudly") {
    val d = dir("vacuumed")
    writeTable(d)
    val rootP = new Path(d)
    val fs = rootP.getFileSystem(conf)
    val live = GraftCommitLog.liveFilesAsOf(fs, rootP,
      GraftCommitLog.versions(fs, rootP).max)
    fs.delete(new Path(rootP, live.head), false) // out-of-band removal
    val e = intercept[Exception] {
      spark.read.format("graft-json").schema(schema).load(d).count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("was the directory vacuumed")), msgs)
  }
}
