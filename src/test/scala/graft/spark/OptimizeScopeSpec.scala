package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** Scoped OPTIMIZE (the Delta bin-packing + `OPTIMIZE ... WHERE` shape):
  * `smallFileBytes` compacts only the small-file debris (right-sized
  * files are never re-read or re-written — repeated maintenance costs
  * O(new debris), not O(table)), `where` scopes the pass to matching
  * partition directories, vectored files always qualify (the pass purges
  * masks it touches), and sub-2-file scopes are no-ops.
  */
class OptimizeScopeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-optscope")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("optimize-scope-spec")
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

  private def live(d: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftCommitLog.liveStateAsOf(fs, p, GraftCommitLog.versions(fs, p).max)
  }

  private def snapIds(d: String): Seq[Long] =
    spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d)
      .collect().map(_.getLong(0)).sorted.toSeq

  test("smallFileBytes compacts only the debris; right-sized files never rewrite") {
    val d = dir("binpack")
    val s = spark
    import s.implicits._
    // one big file (~5000 rows), then three tiny appends
    (0L until 5000L).map(i => (i, s"row-$i")).toDF("id", "v").repartition(1)
      .write.format("graft-json").mode("overwrite").save(d)
    val bigFile = live(d).keys.head
    Seq(1, 2, 3).foreach { k =>
      (5000L + k * 10 until 5000L + k * 10 + 10).map(i => (i, s"row-$i"))
        .toDF("id", "v").repartition(1)
        .write.format("graft-json").mode("append").save(d)
    }
    assert(live(d).size === 4)
    val rewritten = TrainingData.optimizeTable(spark, d, schema,
      smallFileBytes = 8L << 10) // tiny appends are well under 8 KiB
    assert(rewritten.size === 3, s"expected the 3 debris files, got $rewritten")
    assert(!rewritten.contains(bigFile))
    val after = live(d)
    assert(after.contains(bigFile), "the right-sized file must stay live untouched")
    assert(after.size === 2, s"debris must compact into one file, got ${after.keys}")
    assert(snapIds(d) === ((0L until 5000L) ++
      Seq(1, 2, 3).flatMap(k => 5000L + k * 10 until 5000L + k * 10 + 10)).sorted)
  }

  test("where scopes the pass to matching partition directories") {
    val d = dir("wherescope")
    val s = spark
    import s.implicits._
    // two partitions, two small files each
    Seq(("overwrite", 0L), ("append", 100L)).foreach { case (mode, base) =>
      (base until base + 50L).map(i => (i, s"r$i", i % 2)).toDF("id", "v", "k")
        .repartition(1)
        .write.format("graft-json").option("partitionby", "k").mode(mode).save(d)
    }
    val before = live(d)
    assert(before.keys.count(_.startsWith("k=0/")) === 2)
    assert(before.keys.count(_.startsWith("k=1/")) === 2)
    val rewritten = TrainingData.optimizeTable(spark, d, schema, where = "k = 0")
    assert(rewritten.nonEmpty && rewritten.forall(_.startsWith("k=0/")),
      s"only k=0 files may rewrite, got $rewritten")
    val after = live(d)
    assert(after.keys.count(_.startsWith("k=0/")) === 1, "k=0 compacted to one file")
    assert(before.keys.filter(_.startsWith("k=1/")).forall(after.contains),
      "k=1 files must stay live untouched")
    assert(snapIds(d) === ((0L until 50L) ++ (100L until 150L)).sorted)
  }

  test("a scoped single-file clean scope is a no-op; a vectored file still qualifies") {
    val d = dir("noop")
    val s = spark
    import s.implicits._
    (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").repartition(1)
      .write.format("graft-json").mode("overwrite").save(d)
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = GraftCommitLog.versions(fs, p).max
    assert(TrainingData.optimizeTable(spark, d, schema,
      smallFileBytes = 1L << 20) === Nil)
    assert(GraftCommitLog.versions(fs, p).max === v0, "no-op must not commit")
    // attach a vector: the same scope now qualifies (mask purge)
    TrainingData.deleteWhereDV(spark, d, schema, "id % 10 = 0")
    val rewritten = TrainingData.optimizeTable(spark, d, schema,
      smallFileBytes = 1L) // nothing is under 1 byte — only the dv qualifies it
    assert(rewritten.size === 1)
    assert(live(d).values.forall(_ == null), "the mask must be purged")
    assert(snapIds(d) === (0L until 100L).filterNot(_ % 10 == 0))
  }

  test("where referencing a non-partition column fails analysis loudly") {
    val d = dir("badwhere")
    val s = spark
    import s.implicits._
    (0L until 20L).map(i => (i, s"r$i", i % 2)).toDF("id", "v", "k").repartition(1)
      .write.format("graft-json").option("partitionby", "k").mode("overwrite").save(d)
    intercept[Exception] {
      TrainingData.optimizeTable(spark, d, schema, where = "id > 3")
    }
    // and on an unpartitioned layout the dial itself refuses
    val d2 = dir("badwhere2")
    (0L until 20L).map(i => (i, s"r$i")).toDF("id", "v").repartition(1)
      .write.format("graft-json").mode("overwrite").save(d2)
    val e = intercept[IllegalArgumentException] {
      TrainingData.optimizeTable(spark, d2, schema, where = "id > 3")
    }
    assert(e.getMessage.contains("PARTITION"))
  }
}
