package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** `option("withrowindex","true")` — exact row provenance: each row's
  * 0-based ordinal within its FILE, stamped by the row readers over
  * whole-file partitions. (file, index) addresses a row for as long as
  * the file lives — the deletion-vector address space.
  */
class RowIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-rowindex")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("row-index-spec")
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

  test("per-file ordinals: dense 0..n-1 within every file (json, multi-file)") {
    val d = dir("json")
    spark.range(1000).toDF("id").repartition(3)
      .write.format("graft-json").mode("overwrite").save(d)
    val df = spark.read.format("graft-json")
      .option("withrowindex", "true").option("withfilepath", "true").load(d)
    assert(df.columns.contains("_graft_row_index"))
    val perFile = df.groupBy("_graft_file")
      .agg(count(lit(1)).as("n"), min(col("_graft_row_index")).as("lo"),
        max(col("_graft_row_index")).as("hi"),
        countDistinct(col("_graft_row_index")).as("d"))
      .collect()
    assert(perFile.length === 3)
    perFile.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("d") === r.getAs[Long]("n"))
    }
    val s = spark
    import s.implicits._
    // a filter on the ordinal applies AFTER stamping (residual), exactly
    assert(df.filter($"_graft_row_index" < 5L).count() === 15L)
    // (file, index) is a stable address: the same row comes back
    val probe = df.filter($"_graft_row_index" === 7L).select("_graft_file", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val again = spark.read.format("graft-json")
      .option("withrowindex", "true").option("withfilepath", "true").load(d)
      .filter($"_graft_row_index" === 7L).select("_graft_file", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(probe === again)
  }

  test("csv ordinals + data-filter interplay keep true file positions") {
    val d = dir("csv")
    val s = spark
    import s.implicits._
    (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(1).sortWithinPartitions("id")
      .write.format("graft-csv").mode("overwrite").save(d)
    val df = spark.read.format("graft-csv")
      .option("withrowindex", "true").load(d)
    // sorted single file: ordinal == id; a pushed DATA filter must not
    // shift ordinals of the surviving rows
    val got = df.filter($"id" >= 90L)
      .select($"id", $"_graft_row_index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === (90L until 100L).map(i => (i, i)))
  }

  test("refusals: non-fail badrecords; aggregate pushdown disabled") {
    val d = dir("refuse")
    spark.range(10).toDF("id")
      .write.format("graft-json").mode("overwrite").save(d)
    val e = intercept[Exception] {
      spark.read.format("graft-json")
        .option("withrowindex", "true").option("badrecords", "drop")
        .load(d).count()
    }
    assert(e.getMessage.contains("withRowIndex"), e.getMessage)
    // count with the option on still answers (through the row path)
    assert(spark.read.format("graft-json").option("withrowindex", "true")
      .load(d).count() === 10L)
  }
}
