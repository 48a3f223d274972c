package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/** Round-10 operator batch: three-action MERGE INTO, recursive hierarchy
  * propagation, and deterministic grouped reservoir sampling. Each test
  * checks the scalable formulation against a brute-force in-memory oracle
  * on randomized input — the driver gates (q146–q148) then pin the same
  * operators against DuckDB on the fixture tables.
  */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("round10-ops-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // -------------------------------------------------------------- MERGE INTO
  test("full-outer MERGE == per-key procedural merge (randomized)") {
    val s = spark; import s.implicits._
    val rnd = new Random(1046)
    // base: ~60% of keys; changes: ~50% of keys with random op
    val keys = (1L to 400L)
    val base = keys.filter(_ => rnd.nextDouble() < 0.6).map(k => (k, rnd.nextInt(1000).toDouble))
    val chg = keys.filter(_ => rnd.nextDouble() < 0.5)
      .map(k => (k, if (rnd.nextBoolean()) "D" else "U", rnd.nextInt(1000) + 2000.0))

    // procedural oracle
    val baseMap = base.toMap
    val chgMap = chg.map(c => c._1 -> (c._2, c._3)).toMap
    val expected = (baseMap.keySet ++ chgMap.keySet).flatMap { k =>
      (baseMap.get(k), chgMap.get(k)) match {
        case (Some(v), None) => Some(k -> v)                    // untouched
        case (Some(_), Some(("D", _))) => None                  // matched delete
        case (Some(_), Some((_, nv))) => Some(k -> nv)          // matched update
        case (None, Some(("D", _))) => None                     // insert of delete: no-op
        case (None, Some((_, nv))) => Some(k -> nv)             // insert
        case (None, None) => None
      }
    }.toMap

    val baseDf = base.toSeq.toDF("k", "price")
    val chgDf = chg.toSeq.toDF("k", "op", "new_price")
    val merged = baseDf.join(chgDf, Seq("k"), "full_outer")
      .filter($"op".isNull || $"op" =!= "D")
      .select($"k", when($"op".isNull, $"price").otherwise($"new_price").as("price"))
      .as[(Long, Double)].collect().toMap

    assert(merged === expected)
    // the fixture must exercise all five branches
    assert(base.exists(b => !chgMap.contains(b._1)))
    assert(chg.exists(c => c._2 == "D" && baseMap.contains(c._1)))
    assert(chg.exists(c => c._2 == "U" && baseMap.contains(c._1)))
    assert(chg.exists(c => c._2 == "D" && !baseMap.contains(c._1)))
    assert(chg.exists(c => c._2 == "U" && !baseMap.contains(c._1)))
  }

  // ----------------------------------------------------- recursive hierarchy
  test("frontier propagation labels == closed-form digit depth/root") {
    val s = spark; import s.implicits._
    // forest: parent = node div 10, roots < 10 — depth/root have a closed
    // form (digit count - 1 / leading digit) the loop must reproduce
    val nodes = (0L until 3000L).toDF("node")
    val roots = nodes.filter($"node" < 10)
      .select($"node", $"node".as("root"), lit(0).as("depth"))
    val children = nodes.filter($"node" >= 10)
    var labeled = roots
    var frontier = roots
    var done = false
    var rounds = 0
    while (!done) {
      rounds += 1; require(rounds <= 10)
      val next = children
        .join(frontier.select($"node".as("parent"), $"root", $"depth"),
          expr("node div 10") === $"parent")
        .select($"node", $"root", ($"depth" + 1).as("depth"))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else { labeled = labeled.union(next); frontier = next }
    }
    val got = labeled.as[(Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 3000) // every node labeled exactly once
    (0L until 3000L).foreach { n =>
      val digits = n.toString
      val expectedRoot = digits.head.toString.toLong
      val expectedDepth = digits.length - 1
      assert(got(n) == (expectedRoot, expectedDepth), s"node $n")
    }
    assert(rounds == 4) // depth 3 frontier + one empty confirming round
  }

  // ------------------------------------------------- grouped reservoir draw
  test("hash-rank reservoir is partitioning-invariant and exact-k") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 500L).map(i => (i, s"g${i % 7}"))
    def draw(parts: Int): Map[String, Seq[Long]] = {
      val w = Window.partitionBy($"g").orderBy(md5($"id".cast("string")), $"id")
      rows.toDF("id", "g").repartition(parts)
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"g", $"id").as[(String, Long)].collect()
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSeq.sorted }
    }
    val a = draw(2); val b = draw(7)
    assert(a === b) // deterministic under any physical layout
    assert(a.values.forall(_.size == 5))
    assert(a.keySet.size == 7)
  }
}
