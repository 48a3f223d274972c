package graft.spark

import graft.functions.LevenshteinBandedImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/** The banded bounded-edit-distance kernel and its SQL expression:
  * compute(a, b, k) must equal min(fullLevenshtein(a, b), k + 1) on every
  * input, and the registered `levenshtein_bounded` must agree with the
  * built-in `least(levenshtein(a, b), k + 1)` through whole-stage codegen.
  */
class LevenshteinBoundedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("levenshtein-bounded-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Textbook full DP — the reference implementation. */
  private def fullLev(s: String, t: String): Int = {
    val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length) {
      val cost = if (s(i - 1) == t(j - 1)) 0 else 1
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + cost)
    }
    dp(s.length)(t.length)
  }

  private def banded(s: String, t: String, k: Int): Int =
    LevenshteinBandedImpl.compute(
      UTF8String.fromString(s), UTF8String.fromString(t), k)

  test("banded kernel == min(full DP, k+1) on 4000 random cases") {
    val rnd = new Random(77)
    val alphabet = "abc"
    def str(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 4000) {
      val s = str(12); val t = str(12); val k = rnd.nextInt(6)
      val want = math.min(fullLev(s, t), k + 1)
      val got = banded(s, t, k)
      assert(got == want, s"compute('$s','$t',$k) = $got, want $want")
    }
  }

  test("edges: empty strings, k=0, identical, length-gap fast path") {
    assert(banded("", "", 3) == 0)
    assert(banded("", "ab", 3) == 2)
    assert(banded("abc", "", 2) == 3)      // == k+1 saturation
    assert(banded("same", "same", 0) == 0)
    assert(banded("same", "tame", 0) == 1) // k=0: any diff saturates to 1
    assert(banded("a", "abcdefgh", 2) == 3) // |len diff| > k fast path
  }

  test("SQL expression agrees with built-in least(levenshtein, k+1) via codegen") {
    val s = spark; import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val rnd = new Random(13)
    val words = Seq.fill(300)(
      Seq.fill(rnd.nextInt(10))("abcd" (rnd.nextInt(4))).mkString)
    val df = words.zip(words.reverse).toDF("a", "b")
    df.createOrReplaceTempView("lev_pairs")
    val diff = s.sql(
      """SELECT a, b,
        |       levenshtein_bounded(a, b, 2) AS bounded,
        |       least(levenshtein(a, b), 3) AS reference
        |FROM lev_pairs""".stripMargin)
      .filter($"bounded" =!= $"reference")
      .count()
    assert(diff == 0)
  }

  test("null propagation") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    val r = s.sql("SELECT levenshtein_bounded(CAST(NULL AS STRING), 'x', 2) AS d")
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
