package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Stats-sidecar data skipping: the graft-json sink records per-file
  * (rows, nulls, min, max), and the scan drops whole files whose ranges
  * cannot satisfy a pushed filter — before any task launches. Soundness
  * is the point: results must be identical with pruning active, files
  * without sidecars must be kept, and conservative cases (IsNotNull on a
  * mixed file, ranges that straddle) must not prune.
  */
class DataSkippingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("graft-skip-spec")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("data-skipping-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def writeRanged(): String = {
    val s = spark; import s.implicits._
    val out = dir.resolve("ranged").toString
    (0L until 4000L).map(i => (i, s"name-$i", i / 10.0))
      .toDF("id", "name", "score")
      .repartitionByRange(4, $"id") // 4 files with disjoint id ranges
      .write.format("graft-json").mode("overwrite").save(out)
    out
  }

  test("range filters prune files by sidecar min/max and stay exact") {
    val out = writeRanged()
    val sidecars = Files.list(dir.resolve("ranged")).toArray.map(_.toString)
      .filter(_.endsWith(".stats"))
    assert(sidecars.length == 4, s"expected 4 sidecars: ${sidecars.mkString(",")}")

    GraftScan.lastStatsPruned.set(-1)
    val df = spark.read.format("graft-json").load(out)
      .filter(col("id") < 500)
      .selectExpr("count(*) AS n", "sum(id) AS s", "min(name) AS mn")
    val r = df.collect()(0)
    assert(r.getLong(0) == 500 && r.getLong(1) == 499L * 500 / 2)
    assert(GraftScan.lastStatsPruned.get == 3,
      s"expected 3 of 4 files pruned, got ${GraftScan.lastStatsPruned.get}")

    // string range prune (binary UTF-8 ordering on the name column)
    GraftScan.lastStatsPruned.set(-1)
    val n = spark.read.format("graft-json").load(out)
      .filter(col("name") === "name-3999").count()
    assert(n == 1)
    assert(GraftScan.lastStatsPruned.get >= 1, "string equality should prune some files")
  }

  test("straddling ranges and missing sidecars never lose rows") {
    val out = writeRanged()
    // delete one sidecar: that file must be scanned (kept) regardless
    val victim = Files.list(dir.resolve("ranged")).toArray.map(_.toString)
      .filter(_.endsWith(".stats")).head
    Files.delete(java.nio.file.Paths.get(victim))

    val full = spark.read.format("graft-json").load(out)
    assert(full.count() == 4000)
    // a filter straddling two files' ranges returns exactly the rows
    val got = full.filter(col("id") >= 995 && col("id") <= 1005)
      .selectExpr("count(*)").collect()(0).getLong(0)
    assert(got == 11)
  }

  test("IsNotNull prunes all-null files only; IsNull prunes no-null files") {
    val s = spark; import s.implicits._
    val out = dir.resolve("nulls").toString
    val withNulls = (0L until 100L)
      .map(i => (i, if (i < 50) null else s"v$i"))
      .toDF("id", "v")
    // file 0: ids 0-49 (v all null); file 1: ids 50-99 (v never null)
    withNulls.repartitionByRange(2, $"id")
      .write.format("graft-json").mode("overwrite").save(out)

    GraftScan.lastStatsPruned.set(-1)
    assert(spark.read.format("graft-json").load(out)
      .filter(col("v").isNotNull).count() == 50)
    assert(GraftScan.lastStatsPruned.get == 1, "the all-null file should be pruned")

    GraftScan.lastStatsPruned.set(-1)
    assert(spark.read.format("graft-json").load(out)
      .filter(col("v").isNull).count() == 50)
    assert(GraftScan.lastStatsPruned.get == 1, "the no-null file should be pruned")
  }

  test("option(dataskipping=false) disables pruning but not correctness") {
    val out = writeRanged()
    GraftScan.lastStatsPruned.set(-1)
    val n = spark.read.format("graft-json").option("dataskipping", "false")
      .load(out).filter(col("id") < 500).count()
    assert(n == 500)
    assert(GraftScan.lastStatsPruned.get == -1, "pruning should not have run")
  }

  test("COUNT(*) over sink-written files is metadata-only") {
    val s = spark; import s.implicits._
    val out = dir.resolve("metacount").toString
    (1L to 1234L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(3).write.format("graft-json").mode("overwrite").save(out)

    // poison one DATA file: a metadata count must not notice (proof that
    // no data bytes were read); the sidecar keeps the true row count
    val victim = Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".jsonl")).head
    Files.write(java.nio.file.Paths.get(victim), "NOT JSON AT ALL\n".getBytes("UTF-8"))
    val vp = java.nio.file.Paths.get(victim)
    Files.deleteIfExists(vp.getParent.resolve("." + vp.getFileName + ".crc"))

    val n = spark.read.format("graft-json").load(out)
      .selectExpr("count(*) AS n").collect()(0).getLong(0)
    assert(n == 1234, s"metadata count returned $n")

    // drop mode must PARSE (it validates), so the poisoned file now counts 0
    val strict = spark.read.format("graft-json").option("badrecords", "drop")
      .load(out).selectExpr("count(*)").collect()(0).getLong(0)
    assert(strict < 1234, s"drop-mode count should have parsed and shrunk, got $strict")
  }

  test("ungrouped min/max/count batteries answer from metadata (no data read)") {
    val s = spark; import s.implicits._
    val out = dir.resolve("metaagg").toString
    (1L to 900L).map(i => (i, s"k$i", i * 1.5))
      .toDF("id", "name", "score")
      .repartition(3).write.format("graft-json").mode("overwrite").save(out)

    val schema = spark.read.format("graft-json").load(out).schema

    // poison every data file: only metadata can produce these answers
    Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".jsonl")).foreach { f =>
        Files.write(java.nio.file.Paths.get(f), "GARBAGE\n".getBytes("UTF-8"))
        val vp = java.nio.file.Paths.get(f)
        Files.deleteIfExists(vp.getParent.resolve("." + vp.getFileName + ".crc"))
      }

    val df = spark.read.format("graft-json").schema(schema).load(out)
      .selectExpr("min(id) AS mn", "max(id) AS mx", "count(id) AS c",
        "min(score) AS smn", "max(name) AS nmx")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("min(id)") && plan.contains("RelationV2"),
      s"battery must be pushed into the scan:\n$plan")
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 900L, 900L)))
    assert(r.getDouble(3) == 1.5 && r.getString(4) == "k99")

    // SUM in the battery forces the parsing path (sidecars carry no sums):
    // over the poisoned files that must now fail in strict mode
    intercept[Exception] {
      spark.read.format("graft-json").schema(schema).load(out)
        .selectExpr("min(id)", "sum(id)").collect()
    }
  }

  test("sidecar round-trips through render/parse including edge values") {
    import FileStats._
    val st = Stats(7, Map(
      "i" -> ColStats('i', 2, java.lang.Long.valueOf(Long.MinValue), java.lang.Long.valueOf(Long.MaxValue)),
      "f" -> ColStats('f', 0, java.lang.Double.valueOf(-0.0), java.lang.Double.valueOf(Double.MaxValue)),
      "s" -> ColStats('s', 7, null, null),
      "t\tab" -> ColStats('s', 0,
        org.apache.spark.unsafe.types.UTF8String.fromString("a\tb\nc"),
        org.apache.spark.unsafe.types.UTF8String.fromString("😀"))))
    val back = parse(render(st))
    assert(back.isDefined)
    assert(back.get.rows == 7)
    assert(back.get.cols("t\tab").max.toString == "😀")
    assert(back.get.cols("s").min == null)
    assert(parse("junk").isEmpty)
  }
}
