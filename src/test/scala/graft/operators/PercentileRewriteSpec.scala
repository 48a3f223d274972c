package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the count-bucketed exact percentile machinery (round 17,
  * Relational.withCumCounts / medianCol / percentileDiscCol) EXACTLY to
  * Spark's native `median` / `percentile_disc` aggregates: q106/q131/q134
  * were rewritten from the ObjectHashAggregate value-multiset plan (one
  * task per group, OOM-by-design on a hot group at scale) to a parallel
  * hash aggregate + cumulative window, and this differential holds the
  * rewrite to bit-identical results on randomized data — ties, heavy
  * duplication, odd/even group sizes, singleton groups, and the float
  * representation edges of n*p (non-legacy PercentileDisc computes the
  * rank from a DOUBLE product; so do we).
  */
class PercentileRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("percentile-rewrite-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(rows: Seq[(String, Long)], ps: Seq[Double]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val counts = df.groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
    var cc = Relational.withCumCounts(counts, "g", "v")
      .withColumn("__med", Relational.medianCol("g", "v"))
    ps.zipWithIndex.foreach { case (p, i) =>
      cc = cc.withColumn(s"__p$i", Relational.percentileDiscCol("g", "v", p))
    }
    val mine = cc.groupBy($"g")
      .agg(min($"__med").as("med"),
        ps.indices.map(i => min(col(s"__p$i")).cast("double").as(s"p$i")): _*)
      .orderBy($"g")
      .collect()
    val native = df.groupBy($"g")
      .agg(expr("median(v)").as("med"),
        ps.zipWithIndex.map { case (p, i) =>
          expr(s"CAST(percentile_disc($p) WITHIN GROUP (ORDER BY v) AS DOUBLE)").as(s"p$i")
        }: _*)
      .orderBy($"g")
      .collect()
    assert(mine.length == native.length)
    mine.zip(native).foreach { case (m, n) =>
      assert(m.getString(0) == n.getString(0))
      (1 to ps.length + 1).foreach { i =>
        // bit-exact: java.lang.Double.equals on the boxed values
        assert(m.get(i) == n.get(i),
          s"group ${m.getString(0)} col $i: mine=${m.get(i)} native=${n.get(i)}")
      }
    }
  }

  test("median + percentile_disc parity on randomized groups") {
    val rnd = new scala.util.Random(42)
    // group sizes hit odd, even, 1, 2, and heavy-tie shapes
    val sizes = Seq(1, 2, 3, 4, 5, 17, 100, 101, 1000)
    val rows = sizes.zipWithIndex.flatMap { case (sz, gi) =>
      val dup = 1 + gi % 4 // tie density varies per group
      (0 until sz).map(_ => (f"g$gi%02d", (rnd.nextInt(sz / dup + 1)).toLong))
    }
    check(rows, Seq(0.05, 0.25, 0.5, 0.75, 0.95))
  }

  test("rank float edges: p*n integral and near-integral") {
    // n = 20, 100: p*n lands exactly on / within an ulp of an integer for
    // p = 0.05/0.25/0.95 — the ceil(n*p) edge where a reimplementation
    // diverges if it doesn't do Spark's exact DOUBLE product
    val rows = (1 to 20).map(i => ("a", i.toLong)) ++
      (1 to 100).map(i => ("b", i.toLong)) ++
      (1 to 40).map(i => ("c", (i / 2).toLong)) // duplicated values
    check(rows, Seq(0.05, 0.1, 0.2, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0))
  }

  test("negative and widely-spread values") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(_ => ("x", rnd.nextLong() % 1000000L)) ++
      (0 until 3).map(i => ("y", -5L + i))
    check(rows, Seq(0.05, 0.5, 0.95))
  }
}
