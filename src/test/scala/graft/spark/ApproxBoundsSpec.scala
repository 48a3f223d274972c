package graft.spark

import graft.api.TrainingData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Checkable bounds for the three approximate-by-construction operators
  * whose driver gates are rows-only (q22 HLL, q30 MinHash-LSH, q34
  * random-hyperplane ANN). Their exact values are engine-specific, but
  * each carries a PUBLISHED accuracy contract that an exact oracle can
  * bound — estimate within the configured rsd for HyperLogLog++, recall
  * against the exact similarity join for the two LSH paths. Every input
  * here is seeded, and Spark's hashes are deterministic, so these are
  * fixed-point assertions, not flaky statistical ones.
  */
class ApproxBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("approx-bounds-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("HLL estimates stay within 3x the configured rsd of the exact count (q22 bound)") {
    val s = spark; import s.implicits._
    // 3 groups x 20k distinct values — big enough that HLL++ is in its
    // sparse->dense regime, small enough to count exactly
    val df = (1L to 60000L).map(i => (i % 3, i)).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(
        approx_count_distinct($"v").as("approx_default"),     // rsd 0.05
        approx_count_distinct($"v", 0.02).as("approx_tight"), // rsd 0.02
        count_distinct($"v").as("exact"))
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      val exact = r.getLong(3) // columns: g, approx_default, approx_tight, exact
      val errDefault = math.abs(r.getLong(1) - exact).toDouble / exact
      val errTight = math.abs(r.getLong(2) - exact).toDouble / exact
      assert(errDefault <= 3 * 0.05,
        s"group ${r.get(0)}: default-rsd error $errDefault beyond 3x rsd 0.05")
      assert(errTight <= 3 * 0.02,
        s"group ${r.get(0)}: rsd=0.02 error $errTight beyond 3x rsd")
    }
  }

  // Seeded near-duplicate corpus: 40 base documents of 40 words from a
  // 500-word vocabulary; the first 20 get a planted near-duplicate
  // (id+1000) with exactly one word swapped — Jaccard over 3-shingles
  // ~= 35/41 ~= 0.85, far above anything two random base docs share.
  private def nearDupCorpus = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(0xBEEF)
    val vocab = (0 until 500).map(i => s"w$i")
    val base = (1L to 40L).map { id =>
      (id, (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.take(20).map { case (id, text) =>
      val words = text.split(" ")
      words(rnd.nextInt(words.length)) = "swapped"
      (id + 1000L, words.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("MinHash-LSH recall >= 0.75 against the exact Jaccard join (q30 bound)") {
    val docs = nearDupCorpus
    // exact truth: pairs at >= 0.8 Jaccard over the same 3-shingles
    val truth = TrainingData.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccardBp = 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 15, s"corpus planted ${truth.size} high-sim pairs")
    // same banding configuration as the q30 gate
    val cand = TrainingData.minhashLshCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minJaccardEst = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(p => Seq(p, p.swap)).toSet
    val found = truth.count(cand.contains)
    val recall = found.toDouble / truth.size
    assert(recall >= 0.75, s"LSH recall $recall ($found/${truth.size})")
  }

  test("sign-LSH bucketed ANN recall >= 0.6 against brute-force cosine top-k (q34 bound)") {
    val s = spark; import s.implicits._
    // 5 well-separated cluster centers in R^8, 20 members each with small
    // seeded noise: a query's true top-k lives in its own cluster, and
    // cluster members land on the same side of most hyperplanes
    val rnd = new scala.util.Random(0xD0D0)
    val centers = Seq.fill(5)(Seq.fill(8)(rnd.nextGaussian() * 4))
    val corpus = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 0.5))
    }
    val corpusDf = corpus.toDF("vec_id", "e")
    val queries = corpusDf.filter($"vec_id".isin(0L, 1L, 2L))
      .select($"vec_id".as("qid"), $"e".as("qe"))
    val truth = TrainingData.cosineTopK(corpusDf, queries, k = 5,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 3 seeded hyperplanes -> 8 buckets; probe ONLY the query's bucket
    val planes = Seq.fill(3)(Seq.fill(8)(rnd.nextGaussian()))
    val bucketed = corpusDf.withColumn("bucket",
      TrainingData.signLshBucket($"e", planes))
    val qb = bucketed.filter($"vec_id".isin(0L, 1L, 2L))
      .select($"vec_id".as("qid"), $"bucket")
    val candidates = qb.join(bucketed, "bucket")
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = truth.count(candidates.contains)
    val recall = found.toDouble / truth.size
    assert(recall >= 0.6, s"bucketed ANN recall $recall ($found/${truth.size})")
  }
}
