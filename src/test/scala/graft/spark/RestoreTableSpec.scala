package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** RESTORE TABLE (docs/TABLE_FORMAT.md): `TrainingData.restoreTable`
  * rolls the table back to a prior version in ONE atomic metadata-only
  * commit — retired files re-pin, vectors re-attach or detach, the
  * recorded schema re-records — with all intermediate history readable
  * and physically-reclaimed bytes refusing loudly.
  */
class RestoreTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-restore")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("restore-table-spec")
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

  private def writeTable(d: String, n: Long = 100L, parts: Int = 3): Unit = {
    val s = spark
    import s.implicits._
    (0L until n).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(parts)
      .write.format("graft-json").mode("overwrite").save(d)
  }

  private def appendRows(d: String, from: Long, until: Long): Unit = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(1)
      .write.format("graft-json").mode("append").save(d)
  }

  private def snapIds(d: String): Seq[Long] =
    spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d)
      .collect().map(_.getLong(0)).sorted.toSeq

  private def fsRoot(d: String) = {
    val p = new org.apache.hadoop.fs.Path(d)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("restore retires files appended since the target (removes-only entry)") {
    val d = dir("retire")
    writeTable(d)                                   // v0
    appendRows(d, 100L, 150L)                       // v1
    val (fs, rootP) = fsRoot(d)
    assert(TrainingData.restoreTable(spark, d, 0L) === 2L)
    assert(snapIds(d) === (0L until 100L))
    assert(GraftCommitLog.liveStateAsOf(fs, rootP, 2L) ===
      GraftCommitLog.liveStateAsOf(fs, rootP, 0L))
    // history intact: the pre-restore version still reads whole
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionasof", "1").load(d).count() === 150L)
  }

  test("restore re-pins COW-retired files (retainHistory=true rewrite)") {
    val d = dir("repin")
    writeTable(d)                                   // v0
    TrainingData.optimizeTable(spark, d, schema,
      targetFileBytes = 1L << 20, retainHistory = true) // v1: originals retired
    val (fs, rootP) = fsRoot(d)
    assert(TrainingData.restoreTable(spark, d, 0L) === 2L)
    assert(GraftCommitLog.liveStateAsOf(fs, rootP, 2L) ===
      GraftCommitLog.liveStateAsOf(fs, rootP, 0L))
    assert(snapIds(d) === (0L until 100L))
  }

  test("restore re-attaches vectors to re-pinned files (f+d in one atomic entry)") {
    val d = dir("repindv")
    writeTable(d)                                   // v0
    TrainingData.deleteWhereDV(spark, d, schema, "id % 10 = 0") // v1: masks
    TrainingData.optimizeTable(spark, d, schema,
      targetFileBytes = 1L << 20, retainHistory = true) // v2: purge + retire
    val (fs, rootP) = fsRoot(d)
    assert(TrainingData.restoreTable(spark, d, 1L) === 3L)
    val restoredState = GraftCommitLog.liveStateAsOf(fs, rootP, 3L)
    assert(restoredState === GraftCommitLog.liveStateAsOf(fs, rootP, 1L))
    assert(restoredState.values.exists(_ != null),
      "the target version's deletion vectors must ride the re-pin")
    assert(snapIds(d) === (0L until 100L).filterNot(_ % 10 == 0))
  }

  test("restore detaches a vector attached since the target (retire + re-pin)") {
    val d = dir("detach")
    writeTable(d)                                   // v0
    TrainingData.deleteWhereDV(spark, d, schema, "id % 10 = 0") // v1
    val (fs, rootP) = fsRoot(d)
    assert(TrainingData.restoreTable(spark, d, 0L) === 2L)
    val state = GraftCommitLog.liveStateAsOf(fs, rootP, 2L)
    assert(state === GraftCommitLog.liveStateAsOf(fs, rootP, 0L))
    assert(state.values.forall(_ == null))
    assert(snapIds(d) === (0L until 100L))
    // the masked intermediate version still time-travels exactly
    assert(spark.read.format("graft-json").schema(schema)
      .option("versionasof", "1").load(d).count() === 90L)
  }

  test("restore refuses when retired bytes were physically reclaimed") {
    val d = dir("gone")
    writeTable(d)                                   // v0
    TrainingData.optimizeTable(spark, d, schema,
      targetFileBytes = 1L << 20, retainHistory = false) // v1: originals DELETED
    val e = intercept[IllegalArgumentException] {
      TrainingData.restoreTable(spark, d, 0L)
    }
    assert(e.getMessage.contains("physically gone"))
    // and nothing was committed: the live set is untouched
    val (fs, rootP) = fsRoot(d)
    assert(GraftCommitLog.versions(fs, rootP).max === 1L)
  }

  test("restore re-records the target version's schema across an ALTER") {
    val d = dir("schema")
    writeTable(d)                                   // v0
    TrainingData.alterTableAddColumn(spark, d, "extra", "DOUBLE") // v1
    assert(TrainingData.tableSchema(spark, d).get.fieldNames.contains("extra"))
    assert(TrainingData.restoreTable(spark, d, 0L) === 2L)
    val restored = TrainingData.tableSchema(spark, d).get
    assert(!restored.fieldNames.contains("extra"),
      s"restore must re-record the pre-ALTER schema, got $restored")
    // the ALTER's epoch still time-travels with its own schema
    assert(TrainingData.tableSchema(spark, d, Some(1L)).get
      .fieldNames.contains("extra"))
  }

  test("restore across a RENAME re-records the old logical name (physical keys never moved)") {
    val d = dir("rename")
    writeTable(d)                                                   // v0: (id, v)
    TrainingData.alterTableRenameColumn(spark, d, "v", "label")     // v1
    // post-rename append uses the new logical name (physical key stays v)
    val s = spark
    import s.implicits._
    (100L until 110L).map(i => (i, s"r$i")).toDF("id", "label").repartition(1)
      .write.format("graft-json").mode("append").save(d)            // v2
    assert(TrainingData.restoreTable(spark, d, 0L) === 3L)
    val restored = TrainingData.tableSchema(spark, d).get
    assert(restored.fieldNames.toSeq === Seq("id", "v"),
      s"restore must re-record the pre-RENAME names, got $restored")
    // data reads under the restored logical name; v2's file is retired
    val got = spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === (0L until 100L).map(i => (i, s"r$i")))
    // the renamed epoch still time-travels under ITS names
    assert(TrainingData.tableSchema(spark, d, Some(1L)).get
      .fieldNames.contains("label"))
  }

  test("changeFeed across a restore: un-deleted rows surface as inserts, net effect zero from the origin") {
    val d = dir("cdf")
    writeTable(d)                                   // v0
    TrainingData.deleteWhereDV(spark, d, schema, "id % 10 = 0") // v1
    assert(TrainingData.restoreTable(spark, d, 0L) === 2L)
    // consumer at v1 (saw the deletes): the restore un-deletes → inserts
    val feed = TrainingData.changeFeed(spark, d, schema, 1L)
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    assert(feed === (0L until 100L).filter(_ % 10 == 0).map(i => (i, "insert")),
      s"expected the masked rows back as inserts, got ${feed.take(5)}...")
    // consumer at v0: delete-then-restore nets to NO change
    assert(TrainingData.changeFeed(spark, d, schema, 0L).count() === 0L)
  }

  test("incremental consumers refuse (or skip) the restore entry loudly") {
    val d = dir("inc")
    writeTable(d)                                   // v0
    appendRows(d, 100L, 120L)                       // v1
    TrainingData.restoreTable(spark, d, 0L)         // v2: removes v1's file
    val (fs, rootP) = fsRoot(d)
    // a consumer who PROCESSED the retired file must refuse; a consumer
    // from before it was added sees the add cancel net-zero instead
    val e = intercept[IllegalStateException] {
      GraftCommitLog.filesSince(fs, rootP, 1L)
    }
    assert(e.getMessage.contains("full refresh"))
    assert(GraftCommitLog.filesSince(fs, rootP, 0L).isEmpty)
  }

  test("restore entries carry the v6 operation tag; untagged shrinks refuse as corruption") {
    val d = dir("railtag")
    writeTable(d)                                                     // v0
    TrainingData.deleteWhereDV(spark, d, schema, "id % 10 = 0")       // v1
    TrainingData.restoreTable(spark, d, 0L)                           // v2
    val (fs, rootP) = fsRoot(d)
    assert(GraftCommitLog.entryOp(fs, rootP, 2L) === Some("restore 0"))
    assert(GraftCommitLog.entryOp(fs, rootP, 1L) === None)
    // the restore-shaped shrink flows through changeFeed (rail keyed on
    // the tag)...
    assert(TrainingData.changeFeed(spark, d, schema, 1L).count() === 10L)

    // ...but the SAME shrink with no restore tag is corruption: hand-craft
    // an untagged entry re-attaching an older (smaller) artifact
    val d2 = dir("railraw")
    writeTable(d2, parts = 1)                                         // v0: ONE file
    TrainingData.deleteWhereDV(spark, d2, schema, "id = 3")           // v1: artifact A
    val (fs2, rootP2) = fsRoot(d2)
    val (file, artA) = GraftCommitLog.liveStateAsOf(fs2, rootP2, 1L)
      .find(_._2 != null).get
    TrainingData.deleteWhereDV(spark, d2, schema, "id = 7")           // v2: A ∪ {7}
    val rogue = new org.apache.hadoop.fs.Path(d2, f".graft-log/${3L}%020d")
    val out = fs2.create(rogue, false)
    out.write(s"graft-commit v4\nd $artA $file\n".getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException] {
      TrainingData.changeFeed(spark, d2, schema, 2L).count()
    }
    assert(e.getMessage.contains("SHRANK"), e.getMessage)
  }

  test("restoreTableToTimestamp resolves through the monotonic commit times") {
    val d = dir("bytime")
    val conf = spark.sparkContext.hadoopConfiguration
    val tsKey = GraftCommitLog.CommitTimestampKey
    try {
      conf.setLong(tsKey, 1000L); writeTable(d)               // v0 @ t=1000
      conf.setLong(tsKey, 2000L); appendRows(d, 100L, 120L)   // v1 @ t=2000
      conf.setLong(tsKey, 3000L); appendRows(d, 120L, 140L)   // v2 @ t=3000
      conf.setLong(tsKey, 4000L)
      // 2500 resolves to v1 (latest commit time ≤ 2500)
      assert(TrainingData.restoreTableToTimestamp(spark, d, 2500L) === 3L)
      assert(snapIds(d) === (0L until 120L))
      // before-first is loud, exactly like timestampAsOf reads
      intercept[Exception] {
        TrainingData.restoreTableToTimestamp(spark, d, 500L)
      }
      // AFTER-latest clamps to the latest version (Delta's
      // canReturnLastCommit): "restore to now" is the -1 no-op
      assert(TrainingData.restoreTableToTimestamp(spark, d, 999999L) === -1L)
    } finally conf.unset(tsKey)
  }

  test("no-op restores return -1 and write nothing") {
    val d = dir("noop")
    writeTable(d)                                   // v0
    val (fs, rootP) = fsRoot(d)
    assert(TrainingData.restoreTable(spark, d, 0L) === -1L)
    assert(GraftCommitLog.versions(fs, rootP).max === 0L)
    // ahead-of-latest is a loud error, not a silent no-op
    val e = intercept[IllegalArgumentException] {
      TrainingData.restoreTable(spark, d, 5L)
    }
    assert(e.getMessage.contains("ahead of the latest"))
  }
}
