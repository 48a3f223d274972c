package graft.spark

import graft.api.TrainingData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/** Round-9 operator batch: chunk-bucketed interval-overlap joins,
  * oriented-wedge triangle counting, integer PageRank, keep-best cluster
  * dedup, deterministic mode, and unigram entropy. Each test checks the
  * scalable formulation against a brute-force oracle on randomized or
  * closed-form input — the driver gates (q122–q128) then pin the same
  * operators against DuckDB on the fixture tables.
  */
class Round9OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("round9-ops-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---------------------------------------------------------- interval join
  test("chunk-bucketed interval overlap join == naive theta join (randomized)") {
    val s = spark; import s.implicits._
    val rnd = new Random(4242)
    // intervals up to 9 days long on a ~300-day axis; chunk width 10 must
    // cover every interval with <= 2 chunks (len <= width)
    val mk = (n: Int) => (0 until n).map { i =>
      val st = rnd.nextInt(300).toLong
      (i.toLong, st, st + 1 + rnd.nextInt(9))
    }
    val a = mk(120).toDF("a_key", "a_s", "a_e")
    val b = mk(90).toDF("b_key", "b_s", "b_e")

    val naive = a.join(b, $"a_s" < $"b_e" && $"b_s" < $"a_e")
      .select($"a_key", $"b_key").as[(Long, Long)].collect().toSet

    val w = 10L
    val ac = a.withColumn("chunk", explode(expr(s"sequence(a_s div $w, (a_e - 1) div $w)")))
    val bc = b.withColumn("chunk", explode(expr(s"sequence(b_s div $w, (b_e - 1) div $w)")))
    val bucketed = ac.join(bc, ac("chunk") === bc("chunk") &&
        ac("a_s") < bc("b_e") && bc("b_s") < ac("a_e"))
      .select($"a_key", $"b_key").distinct()
      .as[(Long, Long)].collect().toSet

    assert(bucketed == naive)
    assert(naive.nonEmpty) // the fixture must actually exercise overlap
  }

  // ---------------------------------------------------------- triangles
  test("oriented wedge-join triangle count == brute force (randomized graphs)") {
    val s = spark; import s.implicits._
    val rnd = new Random(99)
    for (trial <- 1 to 3) {
      val n = 14
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (i.toLong, j.toLong)).toVector
      val brute = (for {
        (a, b) <- edges; (c, dd) <- edges if c == b
        if edges.contains((a, dd))
      } yield 1).size

      val e = edges.toDF("a", "b")
      val got = e.as("e1")
        .join(e.as("e2"), $"e1.b" === $"e2.a")
        .join(e.as("e3"), $"e1.a" === $"e3.a" && $"e2.b" === $"e3.b")
        .count()
      assert(got == brute, s"trial $trial: wedge join $got vs brute $brute")
    }
  }

  // ---------------------------------------------------------- pagerank
  test("integer PageRank: deterministic, mass-bounded, favors high in-degree") {
    val s = spark; import s.implicits._
    // star: everyone points at 0; 0 points at 1
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)).toDF("src", "dst")
    val nodes = e.select($"src".as("id")).union(e.select($"dst".as("id"))).distinct()
    val deg = e.groupBy($"src").agg(count(lit(1)).as("od"))
    val n = nodes.count()
    val scale = 1000000000000L
    var r = nodes.select($"id", lit(scale / n).as("r"))
    for (_ <- 1 to 3) {
      val contrib = e.join(r, e("src") === r("id")).join(deg, "src")
        .select($"dst".as("id"), expr("r div od").as("c"))
        .groupBy($"id").agg(sum($"c").as("c"))
      r = nodes.join(contrib, Seq("id"), "left")
        .select($"id", (lit(150000000000L / n) +
          expr("(17 * coalesce(c, CAST(0 AS BIGINT))) div 20")).as("r"))
    }
    val ranks = r.as[(Long, Long)].collect().toMap
    // two runs bit-identical (pure integer arithmetic)
    val ranks2 = r.as[(Long, Long)].collect().toMap
    assert(ranks == ranks2)
    // hub 0 dominates; node 1 (fed by the hub) beats the leaves 2,3,4
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L))
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L))
    // total mass never exceeds the scale (dangling/rounding mass only leaks out)
    assert(ranks.values.sum <= scale)
  }

  // ---------------------------------------------------------- keep-best
  test("dedupKeepBest keeps the quality-argmax row of every cluster") {
    val s = spark; import s.implicits._
    // clusters {1,2,3} (chain), {10,11}, singleton {20}
    val df = Seq(
      (1L, 50L), (2L, 90L), (3L, 70L),
      (10L, 5L), (11L, 5L), // quality tie -> id tiebreak keeps 10
      (20L, 1L)).toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val kept = TrainingData.dedupKeepBest(df, "id", pairs,
        rankCols = Seq(col("quality").desc, col("id")))
      .select($"id", $"quality", $"comp")
      .as[(Long, Long, Long)].collect().toSet
    assert(kept == Set((2L, 90L, 1L), (10L, 5L, 10L), (20L, 1L, 20L)))
  }

  test("dedupKeepBest == union-find + argmax on random graphs") {
    val s = spark; import s.implicits._
    val rnd = new Random(321)
    for (trial <- 1 to 4) {
      val n = 30
      val ids = (0L until n).toVector
      val quality = ids.map(i => i -> rnd.nextInt(5).toLong).toMap // ties likely
      val edges = Vector.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // brute force: union-find components, keep (quality desc, id asc) argmax
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val want = ids.groupBy(find)
        .values.map(_.minBy(i => (-quality(i), i))).toSet

      val df = ids.map(i => (i, quality(i))).toDF("id", "q")
      val got = TrainingData.dedupKeepBest(df, "id", edges.toDF("src", "dst"),
          rankCols = Seq(col("q").desc, col("id")))
        .select($"id").as[Long].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("dedupKeepBest requires a rank order") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1L)).toDF("id", "quality")
    val pairs = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[IllegalArgumentException] {
      TrainingData.dedupKeepBest(df, "id", pairs, rankCols = Seq.empty)
    }
  }

  // ---------------------------------------------------------- mode
  test("deterministic mode tie-breaks to the smallest value") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // group g: values 7 and 3 both appear twice -> mode must be 3
    val df = Seq(("g", 7L), ("g", 7L), ("g", 3L), ("g", 3L), ("g", 9L),
      ("h", 1L)).toDF("k", "v")
    val c = df.groupBy($"k", $"v").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"k").orderBy($"n".desc, $"v")
    val got = c.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"k", $"v").as[(String, Long)].collect().toMap
    assert(got == Map("g" -> 3L, "h" -> 1L))
  }

  // ---------------------------------------------------------- weighted sample
  test("sampleWeighted: 0 bp never survives, 10000 bp always, rate tracks weight") {
    val s = spark; import s.implicits._
    val n = 4000
    val df = (1L to n).map(i => (i, i % 3)).toDF("id", "band")
    // band 0 -> 0 bp, band 1 -> 10000 bp, band 2 -> 2500 bp
    val w = expr("CASE band WHEN 0 THEN 0 WHEN 1 THEN 10000 ELSE 2500 END")
    val kept = TrainingData.sampleWeighted(df, "id", w, "spec:")
      .groupBy($"band").count().as[(Long, Long)].collect().toMap
    assert(!kept.contains(0L))
    assert(kept(1L) == (1L to n).count(_ % 3 == 1))
    val r2 = kept(2L).toDouble / (1L to n).count(_ % 3 == 2)
    assert(r2 > 0.18 && r2 < 0.32, s"2500bp band kept at rate $r2")
    // reproducible: second run identical
    val again = TrainingData.sampleWeighted(df, "id", w, "spec:")
      .groupBy($"band").count().as[(Long, Long)].collect().toMap
    assert(again == kept)
  }

  // ---------------------------------------------------------- entropy
  test("unigram entropy: closed forms for uniform and single-token docs") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a b c d"),            // 4 distinct, uniform -> ln(4)
      (2L, "x x x x"),            // single token -> 0
      (3L, "a a b b")             // uniform over 2 -> ln(2)
    ).toDF("doc_id", "text")
    val cnt = df
      .select($"doc_id", explode(split(lower($"text"), "[^a-z0-9]+")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val got = cnt.groupBy($"doc_id")
      .agg(sum($"c").as("total"), sum(expr("c * ln(c)")).as("clnc"))
      .select($"doc_id", round(expr("ln(total) - clnc / total"), 9).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - math.log(4)) < 1e-9)
    assert(math.abs(got(2L)) < 1e-9)
    assert(math.abs(got(3L) - math.log(2)) < 1e-9)
  }
}
