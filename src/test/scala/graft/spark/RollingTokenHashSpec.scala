package graft.spark

import graft.functions.{GraftFunctions, RollingTokenHash}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/** The Karp–Rabin window-hash generator: rolling updates must equal a
  * direct per-window recompute, hash equality must coincide with window
  * STRING equality on realistic corpora (the q177 premise), and the
  * modular arithmetic must be exact at the field boundary.
  */
class RollingTokenHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("rolling-hash-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  import RollingTokenHash._

  /** Reference: direct (non-rolling) window hash from token hashes. */
  private def direct(tokens: Seq[String], k: Int): Seq[(Int, Long)] = {
    def tokHash(t: String): Long = {
      var h = Fnv64Offset
      t.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * Fnv64Prime)
      mod61(h)
    }
    val th = tokens.map(tokHash)
    (0 to tokens.length - k).map { i =>
      var acc = 0L
      (0 until k).foreach(j => acc = addmod(mulmod(acc, Base), th(i + j)))
      (i + 1, acc)
    }
  }

  private def viaSql(text: String, k: Int): Seq[(Int, Long)] = {
    val s = spark; import s.implicits._
    Seq(text).toDF("t")
      .selectExpr(s"rolling_token_hash(t, $k) AS (pos, hash)")
      .select($"pos", $"hash").as[(Int, Long)].collect().toSeq
  }

  test("rolling update equals direct recompute on random corpora") {
    val rnd = new Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "longword-token", "ü")
    (1 to 30).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val k = 1 + rnd.nextInt(8)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      val got = viaSql(toks.mkString(" "), k)
      val want = if (n < k) Nil else direct(toks, k)
      assert(got === want, s"n=$n k=$k toks=$toks")
    }
  }

  test("hash equality == window string equality on a dup-heavy corpus") {
    val s = spark; import s.implicits._
    val rnd = new Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1 to 60).map { id =>
      (id.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("rh_docs")
    // pair each window's hash with its string; a hash maps to ≠1 strings
    // (collision) or a string to ≠1 hashes (nondeterminism) ⇒ fail
    val joined = spark.sql("""
      SELECT h.hash, w.shingle
      FROM (SELECT doc_id, x.pos AS pos, x.hash AS hash
            FROM rh_docs LATERAL VIEW rolling_token_hash(text, 5) x) h
      JOIN (SELECT doc_id, x.pos AS pos, x.shingle AS shingle
            FROM rh_docs LATERAL VIEW word_shingles(text, 5) x) w
      ON h.doc_id = w.doc_id AND h.pos = w.pos""")
    val byHash = joined.groupBy("hash").agg(
      org.apache.spark.sql.functions.countDistinct("shingle").as("ns"))
    assert(byHash.filter($"ns" =!= 1).count() === 0)
    val byStr = joined.groupBy("shingle").agg(
      org.apache.spark.sql.functions.countDistinct("hash").as("nh"))
    assert(byStr.filter($"nh" =!= 1).count() === 0)
    // and the dup structure is non-trivial (windows genuinely repeat)
    assert(joined.groupBy("hash").count().filter($"count" >= 2).count() > 0)
  }

  test("edge cases: short docs, empty tokens, k=1, null") {
    val s = spark; import s.implicits._
    assert(viaSql("one two", 3).isEmpty)
    assert(viaSql("", 1).length === 1)          // one empty token
    assert(viaSql("a  b", 2).length === 2)      // empty middle token counts
    assert(viaSql("solo", 1) === direct(Seq("solo"), 1))
    val n = Seq[Option[String]](None).toDF("t")
      .selectExpr("rolling_token_hash(t, 2) AS (pos, hash)").count()
    assert(n === 0)
    val e = intercept[Exception](viaSql("a b", 0))
    assert(e.getMessage.contains("k >= 1"))
  }

  test("modular arithmetic is exact at the field boundary") {
    val M = Mod61
    // mulmod vs BigInt over adversarial values
    val vals = Seq(0L, 1L, 2L, M - 1, M - 2, M / 2, 123456789012345678L % M,
      (1L << 60) + 17, Base, Fnv64Prime % M)
    for (a <- vals; b <- vals) {
      val want = ((BigInt(a) * BigInt(b)) % BigInt(M)).toLong
      assert(mulmod(a, b) === want, s"mulmod($a, $b)")
      val ws = ((BigInt(a) + BigInt(b)) % BigInt(M)).toLong
      assert(addmod(a, b) % M === ws % M, s"addmod($a, $b)")
    }
    // mod61 of unsigned 64-bit values incl. the sign bit
    Seq(-1L, Long.MinValue, Long.MaxValue, -123456789L).foreach { x =>
      val unsigned = BigInt(java.lang.Long.toUnsignedString(x))
      assert(mod61(x) === (unsigned % BigInt(M)).toLong, s"mod61($x)")
    }
  }
}
