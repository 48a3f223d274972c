package graft.spark

import graft.functions.GraftSparkExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The word_shingles Generator (true UDTF): parity with the array-building
  * explode(transform(sequence(...))) formulation on random docs, edge
  * cases (short docs, empty tokens, unicode, null), and plan shape
  * (a Generate node, no intermediate array).
  */
class WordShinglesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("shingles-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def composed(n: Int): String =
    s"""CASE WHEN size(w) < $n THEN array()
        ELSE transform(sequence(0, size(w) - $n),
               i -> struct(i + 1 AS pos, concat_ws(' ', slice(w, i + 1, $n)) AS shingle)) END"""

  test("parity with the array-materializing formulation on random docs") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "déjà", "日本", "x1", "", "zz")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val ours = df.selectExpr("id", s"word_shingles(text, $n) AS (pos, shingle)")
        .orderBy("id", "pos").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      val ref = df
        .select($"id", split($"text", " ").as("w"))
        .select($"id", explode(expr(composed(n))).as("s"))
        .select($"id", $"s.pos", $"s.shingle")
        .orderBy("id", "pos").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      assert(ours.toSeq == ref.toSeq, s"mismatch at n=$n")
    }
  }

  test("edge cases: null text, short doc, n=1, empty string") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "one two"), (2L, null: String), (3L, ""), (4L, "solo"))
      .toDF("id", "text")
    val out = df.selectExpr("id", "word_shingles(text, 2) AS (pos, shingle)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // null → no rows; "" → 1 word → no 2-shingles; "solo" → no 2-shingles
    assert(out == Set((1L, 1, "one two")))
    val n1 = df.selectExpr("id", "word_shingles(text, 1) AS (pos, shingle)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(n1 == Set((1L, 1, "one"), (1L, 2, "two"), (3L, 1, ""), (4L, 1, "solo")))
  }

  test("multi-space text yields the exact original byte slice") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a  b c")).toDF("id", "text") // empty middle token
    val out = df.selectExpr("word_shingles(text, 2) AS (pos, shingle)")
      .orderBy("pos").collect().map(_.getString(1)).toSeq
    assert(out == Seq("a ", " b", "b c"))
  }

  test("plan is a Generate node over the raw string column (no array build)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b c d")).toDF("id", "text")
      .selectExpr("word_shingles(text, 2) AS (pos, shingle)")
    val plan = df.queryExecution.optimizedPlan.toString()
    assert(plan.contains("Generate word_shingles"), plan)
    assert(!plan.toLowerCase.contains("transform("), plan)
  }
}
