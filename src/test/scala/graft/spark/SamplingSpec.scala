package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The sampling operators' determinism and scale claims (q73/q74):
  *   - q73 membership is a pure function of the key — identical across
  *     reruns and repartitionings — the sample rate lands near the 12.5%
  *     keyspace cut, the split bands partition the sample, and the plan is
  *     MAP-ONLY (no hash-partitioned exchange anywhere; the only shuffle
  *     is the gate's final range sort);
  *   - q74 plans its row_number + filter as WindowGroupLimit, so every
  *     task truncates each stratum to the quota BEFORE the shuffle, takes
  *     exactly min(quota, stratum size) rows per stratum, and is likewise
  *     rerun-deterministic.
  */
class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("sampling-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q73 is deterministic, near the nominal rate, split-partitioned, and map-only") {
    val q = graft.SparkEntry.queries("q73_deterministic_sample")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "rerun changed the sample")

    val total = graft.Tables(spark, sf, "documents").count()
    val rate = a.length.toDouble / total
    assert(rate > 0.06 && rate < 0.20, s"sample rate $rate far from the 12.5% keyspace cut")

    val splits = a.map(_.getString(3)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(a.map(_.getString(3)).count(_ == "train") > a.length / 2,
      "train band (75% of the keyspace) should dominate")

    // map-only: no hash-partitioned exchange (the final ORDER BY is a
    // range exchange; that's the gate's, not the sampler's)
    val plan = q(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"hash sampling must not shuffle:\n$plan")
  }

  test("q76 packs every token exactly once into contiguous per-shard packs") {
    val rows = graft.SparkEntry.queries("q76_sequence_packing")(spark, sf).collect()
    assert(rows.nonEmpty)

    val docs = graft.Tables(spark, sf, "documents")
    val totalToks = docs.selectExpr("sum(size(split(text, ' ')))").collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum == totalToks,
      "packing must conserve tokens: every document lands in exactly one pack")

    // pack ids within a (source, shard) are contiguous from 0 (concat-then-
    // chunk leaves no empty pack below the last used one)
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rs) =>
      val ids = rs.map(_.getLong(2)).sorted
      assert(ids.head == 0L && ids.sameElements(0L until ids.length),
        s"shard $k has non-contiguous packs: ${ids.mkString(",")}")
    }
  }

  test("q74 rides WindowGroupLimit and fills each stratum to min(quota, size)") {
    val df = graft.SparkEntry.queries("q74_stratified_sample")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)

    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"stratified quota must pre-truncate map-side via WindowGroupLimit:\n$plan")

    val docs = graft.Tables(spark, sf, "documents")
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    sizes.foreach { case (src, n) =>
      assert(got.getOrElse(src, 0) == math.min(40L, n).toInt,
        s"stratum $src: got ${got.getOrElse(src, 0)}, want min(40, $n)")
    }
    // ranks within each stratum are 1..k with the hash order's determinism
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
  }
}
