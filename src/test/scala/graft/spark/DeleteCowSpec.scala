package graft.spark

import graft.api.TrainingData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Copy-on-write DELETE/UPDATE over the commit-log protocol v2
  * (docs/TABLE_FORMAT.md): rewrites publish adds + `r` removes in ONE
  * atomic log entry; only files that contain matching rows are rewritten.
  *
  * Under test:
  *  - deleteWhere removes exactly the matching rows (null predicate = keep)
  *  - files the stats refute are NOT rewritten (their names survive)
  *  - no-match predicates are a no-op (no new version)
  *  - retainHistory=false: raw reads correct immediately, old snapshots
  *    fail loudly; retainHistory=true: every snapshot stays readable and
  *    expireRetired reclaims the retired files later
  *  - delete-everything commits a removes-only entry
  *  - updateWhere rewrites matched rows with OLD-row SET semantics
  *  - partitioned layouts rewrite within their k=v directories
  *  - filesSince fails loudly across a rewrite of pre-checkpoint history;
  *    followLog (entryFiles) refuses remove entries
  *  - vacuum never touches files any log entry referenced
  *  - withFilePath surfaces `_graft_file`; restrictFiles pins the listing
  */
class DeleteCowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-cow-spec")
  private val schema = "id BIGINT, grp STRING, v DOUBLE"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("delete-cow-spec")
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

  /** Two single-file commits with DISJOINT id ranges, so the sidecar
    * min/max can refute an id predicate for one of them: v0 = ids 0..49,
    * v1 = ids 100..149. v of id%10==3 rows is null (predicate-null rows).
    */
  private def mkTable(name: String): String = {
    val dir = root.resolve(name).toString
    val s = spark
    import s.implicits._
    def part(r: Range) = r.map { i =>
      (i.toLong, s"g${i % 3}", if (i % 10 == 3) null else java.lang.Double.valueOf(i * 1.5))
    }.toDF("id", "grp", "v").coalesce(1)
    part(0 until 50).write.format("graft-json").mode("overwrite").save(dir)   // v0
    part(100 until 150).write.format("graft-json").mode("append").save(dir)   // v1
    dir
  }

  private def read(dir: String) =
    spark.read.format("graft-json").schema(schema).load(dir)

  private def dataFiles(dir: String): Set[String] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).toSet

  test("deleteWhere removes matching rows; null-predicate rows survive") {
    val dir = mkTable("basic")
    val rewritten = TrainingData.deleteWhere(spark, dir, schema, "v > 30.0")
    assert(rewritten.nonEmpty)
    val ids = read(dir).select("id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    // deleted: v>30 (and v non-null); kept: v<=30 or v null
    val expected = ((0 until 50) ++ (100 until 150))
      .filter(i => i % 10 == 3 || i * 1.5 <= 30.0).map(_.toLong).toSet
    assert(ids === expected)
    // null-v rows from the ALL-matching file were preserved by the rewrite
    assert(ids.contains(103L) && ids.contains(143L))
  }

  test("stats-refuted files are not rewritten; their physical files survive") {
    val dir = mkTable("prune")
    val before = dataFiles(dir)
    // only the v1 file (ids 100..149) can match; v0's sidecar range refutes
    val rewritten = TrainingData.deleteWhere(spark, dir, schema, "id >= 120")
    assert(rewritten.size === 1)
    val after = dataFiles(dir)
    // v0's file name survived untouched; v1's original is gone
    assert((before -- after).size === 1)
    assert(read(dir).count() === 50 + 20)
  }

  test("no matching rows: no-op, no new version") {
    val dir = mkTable("noop")
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vsBefore = GraftCommitLog.versions(fs, fsRoot)
    assert(TrainingData.deleteWhere(spark, dir, schema, "id = 99").isEmpty)
    assert(GraftCommitLog.versions(fs, fsRoot) === vsBefore)
    assert(read(dir).count() === 100)
  }

  test("retainHistory=false: pre-delete snapshots fail loudly (never read deleted rows)") {
    val dir = mkTable("strict")
    TrainingData.deleteWhere(spark, dir, schema, "id < 10")
    val e = intercept[Exception] {
      spark.read.format("graft-json").schema(schema)
        .option("versionAsOf", "0").load(dir).count()
    }
    assert(e.getMessage.contains("missing"))
    // the post-delete snapshot (latest version) reads exactly
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionAsOf", latest.toString).load(dir).count() === 90)
  }

  test("retainHistory=true: time travel intact, expireRetired reclaims later") {
    val dir = mkTable("retain")
    TrainingData.deleteWhere(spark, dir, schema, "id < 10", retainHistory = true)
    // pre-delete snapshot still reads the deleted rows
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionAsOf", "1").load(dir).count() === 100)
    // pinned-latest excludes them
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionAsOf", latest.toString).load(dir).count() === 90)
    // vacuum must NOT reclaim the retired file (older snapshots reference it)
    assert(TrainingData.vacuumOrphans(spark, dir).isEmpty)
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionAsOf", "1").load(dir).count() === 100)
    // expireRetired reclaims it; latest stays exact, old snapshot now fails
    val expired = TrainingData.expireRetired(spark, dir)
    assert(expired.nonEmpty)
    assert(read(dir).count() === 90)
    intercept[Exception] {
      spark.read.format("graft-json").schema(schema)
        .option("versionAsOf", "1").load(dir).count()
    }
  }

  test("delete everything: removes-only entry, empty table") {
    val dir = mkTable("all")
    val rewritten = TrainingData.deleteWhere(spark, dir, schema, "id >= 0")
    assert(rewritten.size === 2)
    assert(read(dir).count() === 0)
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    val acts = GraftCommitLog.entryActions(fs, fsRoot, latest)
    // both originals retired in the one entry; any adds are the zero-row
    // tasks' empty layout-parity parts (the live set reads to 0 rows)
    assert(acts.count(!_.add) === 2)
    val live = GraftCommitLog.liveFilesAsOf(fs, fsRoot, latest)
    assert(live.intersect(rewritten.toSet).isEmpty)
  }

  test("updateWhere: OLD-row SET semantics, untouched files survive") {
    val dir = mkTable("upd")
    // swap-shaped SET: v references grp and grp references v's OLD value
    val rewritten = TrainingData.updateWhere(spark, dir, schema, "id >= 120",
      Map("v" -> "v * 2.0", "grp" -> "concat(grp, '-was-', CAST(v AS INT))"))
    assert(rewritten.size === 1) // v0's file refuted by stats
    val row = read(dir).filter(col("id") === 120).head
    assert(row.getString(1) === "g0-was-180") // OLD v = 180.0
    assert(row.getDouble(2) === 360.0)
    // unmatched row in the SAME rewritten file is untouched
    val r101 = read(dir).filter(col("id") === 101).head
    assert(r101.getString(1) === "g2" && r101.getDouble(2) === 151.5)
    assert(read(dir).count() === 100)
  }

  test("partitioned layout: rewrite stays within k=v directories") {
    val dir = root.resolve("part").toString
    val s = spark
    import s.implicits._
    (0 until 60).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "v")
      .write.format("graft-json").partitionBy("grp").mode("overwrite").save(dir)
    val rewritten = TrainingData.deleteWhere(spark, dir, "id BIGINT, v DOUBLE",
      "grp = 'g1' AND id < 30")
    assert(rewritten.nonEmpty && rewritten.forall(_.startsWith("grp=g1/")))
    // inference appends the typed partition column to the schema
    val left = spark.read.format("graft-json").load(dir)
    assert(left.count() === 60 - 10) // ids 1,4,...,28 in g1 below 30
    assert(left.filter(col("grp") === "g1").count() === 10)
    assert(left.filter(col("grp") === "g0").count() === 20)
  }

  test("partitioned COW: the v2 log records k=v-relative removes (pinned reads + re-delete work)") {
    // regression (review finding): appendEntry relativized root-relative
    // remove paths against the process CWD and fell back to getName,
    // logging 'r part-x.jsonl' for 'grp=g1/part-x.jsonl' — every later
    // pinned read / COW op then failed on the malformed remove
    val dir = root.resolve("partlog").toString
    val s = spark
    import s.implicits._
    (0 until 60).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "v")
      .write.format("graft-json").partitionBy("grp").mode("overwrite").save(dir)
    TrainingData.deleteWhere(spark, dir, "id BIGINT, v DOUBLE",
      "grp = 'g1' AND id < 30", retainHistory = true)
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    // the remove action must carry the partition-relative path
    val removes = GraftCommitLog.entryActions(fs, fsRoot, latest).filterNot(_.add)
    assert(removes.nonEmpty && removes.forall(_.path.startsWith("grp=g1/")),
      removes.mkString(", "))
    // pinned read at the post-delete version folds the log without error
    assert(spark.read.format("graft-json").schema("id BIGINT, v DOUBLE")
      .option("versionAsOf", latest.toString).load(dir).count() === 50)
    // and a SECOND COW op (which pins versionAsOf latest) still works
    TrainingData.deleteWhere(spark, dir, "id BIGINT, v DOUBLE",
      "grp = 'g2' AND id < 9", retainHistory = true)
    val latest2 = GraftCommitLog.versions(fs, fsRoot).max
    assert(spark.read.format("graft-json").schema("id BIGINT, v DOUBLE")
      .option("versionAsOf", latest2.toString).load(dir).count() === 47)
  }

  test("partition values containing commas survive COW (escaped in directories)") {
    // regression (review finding): restrictFiles/commitremoves join file
    // lists on ',', so an unescaped comma inside a partition VALUE would
    // mis-split them; ',' now %2C-escapes in directory names
    val dir = root.resolve("commapart").toString
    val s = spark
    import s.implicits._
    Seq((1L, "San Jose, CA", 1.0), (2L, "San Jose, CA", 9.0), (3L, "Oslo", 2.0))
      .toDF("id", "city", "v")
      .write.format("graft-json").partitionBy("city").mode("overwrite").save(dir)
    val rewritten = TrainingData.deleteWhere(spark, dir, "id BIGINT, v DOUBLE",
      "city = 'San Jose, CA' AND v > 5.0")
    assert(rewritten.size === 1)
    val back = spark.read.format("graft-json").load(dir)
    assert(back.count() === 2)
    assert(back.filter(col("city") === "San Jose, CA").count() === 1)
  }

  test("filesSince across a rewrite of pre-checkpoint history fails loudly") {
    val dir = mkTable("cdf")
    TrainingData.deleteWhere(spark, dir, schema, "id < 5", retainHistory = true)
    val e = intercept[Exception] {
      spark.read.format("graft-json").schema(schema)
        .option("changesSinceVersion", "1").load(dir).count()
    }
    assert(e.getMessage.contains("full refresh"))
    // but a checkpoint BEFORE the whole history still folds cleanly?
    // no — the remove targets a file added at v0 ≤ since=0 too; a fresh
    // snapshot read is the only safe consumption after any rewrite
  }

  test("followLog refuses remove entries (streams cannot un-deliver)") {
    val dir = mkTable("follow")
    TrainingData.deleteWhere(spark, dir, schema, "id < 5", retainHistory = true)
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    val e = intercept[IllegalStateException] {
      GraftCommitLog.entryFiles(fs, fsRoot, latest)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("malformed: removing a file that is not live fails the snapshot read") {
    val dir = mkTable("malformed")
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the WRITE path now refuses this at commit time (conflict detection)…
    intercept[java.util.ConcurrentModificationException] {
      GraftCommitLog.appendEntry(spark.sparkContext.hadoopConfiguration, dir,
        adds = Nil, removes = Seq("no-such-file.jsonl"))
    }
    // …so forge the entry by hand (a corrupt/byzantine writer) and prove
    // the READ side still fails loudly rather than folding past it
    val prior = GraftCommitLog.versions(fs, fsRoot).max
    val forged = new org.apache.hadoop.fs.Path(
      GraftCommitLog.logDir(fsRoot), f"${prior + 1}%020d")
    val out = fs.create(forged, false)
    try out.write("graft-commit v2\nr no-such-file.jsonl\n".getBytes("UTF-8"))
    finally out.close()
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    assert(latest === prior + 1)
    intercept[IllegalArgumentException] {
      GraftCommitLog.liveFilesAsOf(fs, fsRoot, latest)
    }
  }

  test("withFilePath surfaces _graft_file; restrictFiles pins the listing") {
    val dir = mkTable("attr")
    val withPath = spark.read.format("graft-json")
      .schema(schema + ", _graft_file STRING")
      .option("withfilepath", "true").load(dir)
    assert(withPath.columns.contains("_graft_file"))
    val perFile = withPath.groupBy("_graft_file").count().collect()
    assert(perFile.length === 2 && perFile.forall(_.getLong(1) === 50))
    val one = perFile.head.getString(0)
    val restricted = spark.read.format("graft-json").schema(schema)
      .option("restrictfiles", one).load(dir)
    assert(restricted.count() === 50)
    intercept[Exception] {
      spark.read.format("graft-json").schema(schema)
        .option("restrictfiles", "nope.jsonl").load(dir).count()
    }
  }

  test("optimizeTable: atomic in-place compaction, fewer files, same rows") {
    val dir = root.resolve("opt").toString
    val s = spark
    import s.implicits._
    val df = (0 until 2000).map(i => (i.toLong, s"g${i % 3}", i * 0.5)).toDF("id", "grp", "v")
    df.filter($"id" < 1000).repartition(8)
      .write.format("graft-json").mode("overwrite").save(dir) // v0: 8 files
    df.filter($"id" >= 1000).repartition(8)
      .write.format("graft-json").mode("append").save(dir)    // v1: 8 more
    assert(dataFiles(dir).size === 16)
    val rewritten = TrainingData.optimizeTable(spark, dir, schema,
      targetFileBytes = 1L << 20, clusterBy = Seq("id"))
    assert(rewritten.size === 16)
    val after = dataFiles(dir)
    assert(after.size < 16, s"optimize left ${after.size} files")
    val back = read(dir)
    assert(back.count() === 2000)
    assert(back.agg(sum("id")).head.getLong(0) === (0 until 2000).map(_.toLong).sum)
    // the optimize commit is one new version; latest pin == raw read
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = GraftCommitLog.versions(fs, fsRoot).max
    assert(latest === 2)
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionAsOf", latest.toString).load(dir).count() === 2000)
    // clustering: each file's [min,max] id range is disjoint from the rest
    val ranges = after.toSeq.map { f =>
      val one = spark.read.format("graft-json").schema(schema)
        .load(dir + "/" + f)
      val r = one.agg(min("id"), max("id")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) => assert(e1 < s2, s"overlapping ranges: $ranges")
      case _ => ()
    }
    // idempotent-ish: optimizing an already-compact table is a no-op-sized
    // rewrite that still round-trips
    TrainingData.optimizeTable(spark, dir, schema,
      targetFileBytes = 1L << 20, clusterBy = Seq("id"))
    assert(read(dir).count() === 2000)
  }

  test("graft-csv tables delete through the same protocol") {
    val dir = root.resolve("csvcow").toString
    val s = spark
    import s.implicits._
    (0 until 40).map(i => (i.toLong, i * 2.0)).toDF("id", "v").coalesce(1)
      .write.format("graft-csv").mode("overwrite").save(dir)
    val rewritten = TrainingData.deleteWhere(spark, dir, "id BIGINT, v DOUBLE",
      "id % 4 = 0", format = "graft-csv")
    assert(rewritten.size === 1)
    val back = spark.read.format("graft-csv").schema("id BIGINT, v DOUBLE").load(dir)
    assert(back.count() === 30)
    assert(back.agg(min("id")).head.getLong(0) === 1L)
  }

  test("legacy unescaped-comma paths refuse COW maintenance with a targeted error") {
    // new writes %2C-escape commas, but a pre-v2 layout on disk may carry
    // one — comma-joining such a path would split into garbage fragments
    // and surface as a misleading 'vacuumed?' error downstream
    val e = intercept[IllegalArgumentException] {
      GraftSources.joinFileList(Seq("g=a,b/part-0.jsonl"), "restrictfiles")
    }
    assert(e.getMessage.contains("legacy partition directory"), e.getMessage)
    assert(e.getMessage.contains("g=a,b/part-0.jsonl"), e.getMessage)
    // clean lists pass through unchanged
    assert(GraftSources.joinFileList(Seq("a.jsonl", "g=x/b.jsonl"), "x")
      == "a.jsonl,g=x/b.jsonl")
  }

  test("streaming writes refuse commitremoves (never accepted-and-ignored)") {
    val s = spark; import s.implicits._
    val in = root.resolve("srcrm")
    Files.createDirectories(in)
    Files.write(in.resolve("a.jsonl"), "{\"id\": 1}\n".getBytes("UTF-8"))
    Seq("graft-json", "graft-csv").foreach { fmt =>
      val out = root.resolve(s"srm-out-$fmt").toString
      val e = intercept[Exception] {
        val q = spark.readStream.format("graft-json").schema("id LONG")
          .load(in.toString)
          .writeStream.format(fmt)
          .option("commitremoves", "old.jsonl")
          .option("path", out)
          .option("checkpointLocation", root.resolve(s"srm-ck-$fmt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("batch-only")), s"$fmt: ${msgs(e)}")
    }
  }
}
