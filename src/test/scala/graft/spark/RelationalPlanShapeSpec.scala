package graft.spark

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-shape assertions for the round-8 relational queries — the scale
  * claims in their Scaladoc, verified against the actual physical plan on
  * the sf0.001 fixtures. These are the properties that decide whether the
  * query survives a 100× scale-up, so they are regression-gated like
  * values are:
  *
  *   - q103: both window passes AND the per-session rollup ride ONE
  *     exchange (distribution on user_id satisfies all three);
  *   - q105: EXISTS / NOT EXISTS become semi/anti JOINS (never per-row
  *     subquery re-execution);
  *   - q107: the LATERAL aggregate is decorrelated to a grouped
  *     aggregate + join (no per-nation re-scan of customer).
  */
class RelationalPlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("relational-plan-shape-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def q(name: String): DataFrame =
    Relational.all.find(_.name == name).getOrElse(fail(s"no query $name"))
      .build(spark, sf)

  /** Execute (AQE finalizes the plan) and collect over the final plan,
    * descending into reused/adaptive wrappers. */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = pf.lift(p).toSeq
    val kids = p.children ++ p.subqueries ++ (p match {
      // AQE hides materialized stages behind QueryStageExec wrappers
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    })
    here ++ kids.flatMap(c => collect(c)(pf))
  }

  test("q103: windows + session rollup share a single hash shuffle") {
    val plan = finalPlan(q("q103_sessionize"))
    // one HASH exchange (user_id) feeds both window passes AND the final
    // aggregation; the only other exchange allowed is the presentation
    // ORDER BY's range partitioning
    val hashShuffles = collect(plan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.size == 1,
      s"expected ONE hash exchange (user_id) for windows + rollup, got ${hashShuffles.size}:\n$plan")
  }

  test("q105: EXISTS/NOT EXISTS plan as semi + anti joins") {
    val plan = finalPlan(q("q105_exists_correlated"))
    val joins = collect(plan) {
      case j: SortMergeJoinExec => j.joinType.sql
      case j: BroadcastHashJoinExec => j.joinType.sql
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.joinType.sql
    }
    assert(joins.exists(_.contains("SEMI")) && joins.exists(_.contains("ANTI")),
      s"expected semi+anti joins, got $joins:\n$plan")
  }

  test("q107: LATERAL aggregate decorrelates to agg + join (single customer scan)") {
    val plan = finalPlan(q("q107_lateral_join"))
    val scans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // decorrelation proof: customer is scanned ONCE (never once per nation
    // row); nation appears twice — the second is the count-bug domain
    // branch (distinct correlation keys), a constant factor, not per-row
    val customerScans = scans.count(_.relation.location.rootPaths.exists(_.toString.contains("customer")))
    assert(customerScans == 1,
      s"expected customer scanned once (decorrelated), got $customerScans:\n$plan")
    assert(scans.size <= 3, s"expected ≤3 scans total, got ${scans.size}:\n$plan")
    val joins = collect(plan) {
      case j: SortMergeJoinExec => j
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a real join from decorrelation:\n$plan")
  }

  test("q124: interval-overlap join plans as an EQUI-join, never nested-loop") {
    val plan = finalPlan(q("q124_interval_overlap_join"))
    val nested = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(nested.isEmpty,
      s"chunk bucketing must make the overlap join an equi-join:\n$plan")
    val equi = collect(plan) {
      case j: SortMergeJoinExec => j
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(equi.nonEmpty, s"expected a hash/merge equi-join on chunk:\n$plan")
  }

  test("q02: broadcastable orders → zero large exchanges (no lineitem shuffle)") {
    val plan = finalPlan(q("q02_revenue_by_segment"))
    // size-adaptive path: at fixture scale orders broadcasts, so the only
    // hash exchange is the 5-key segment aggregate — the 600k-row (at
    // sf0.1) l_orderkey pre-agg shuffle must NOT appear
    val hashShuffles = collect(plan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.size == 1,
      s"expected only the segment-agg exchange, got ${hashShuffles.size}:\n$plan")
    val bhj = collect(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 2, s"expected two broadcast joins:\n$plan")
  }

  test("q155: forward as-of is join-free — one exchange, a window, no join") {
    val plan = finalPlan(q("q155_asof_tolerance"))
    val joins = collect(plan) {
      case j: SortMergeJoinExec => j
      case j: BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(joins.isEmpty, s"q155 must not join — the RANGE frame does the work:\n$plan")
    val hashShuffles = collect(plan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.size == 1,
      s"expected ONE user_id exchange for the window, got ${hashShuffles.size}:\n$plan")
    val windows = collect(plan) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, s"expected a window with a RANGE frame:\n$plan")
  }

  test("q104: salted join equals plain join (parity, not just the oracle)") {
    val salted = q("q104_salted_skew_join").collect().map(_.toSeq)
    val plain = {
      val s = spark
      import s.implicits._
      graft.Tables(s, sf, "lineitem").select($"l_orderkey", $"l_quantity")
        .join(graft.Tables(s, sf, "orders").select($"o_orderkey", $"o_orderpriority"),
          org.apache.spark.sql.functions.col("l_orderkey") === org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.expr("CAST(l_quantity AS BIGINT)")).as("qty"))
        .orderBy($"o_orderpriority")
        .collect().map(_.toSeq)
    }
    assert(salted.toSeq == plain.toSeq)
  }

  test("q08: native as-of plans as AsOfJoinExec with at most one exchange per side") {
    // the headline bench query rides the custom operator (round 11) — a
    // planning regression (strategy not installed, extra exchanges, a
    // fallback to SMJ/BNLJ) would silently triple its cost
    val df = q("q08_asof_join_last_click_before_purchase")
    df.collect()
    val plan = finalPlan(df)
    val asof = collect(plan) { case a: graft.plans.AsOfJoinExec => a }
    assert(asof.size == 1, s"expected AsOfJoinExec:\n$plan")
    // the ORDER BY's rangepartitioning is presentation; the merge itself
    // must cost at most one hash exchange per side
    val hashExchanges = collect(plan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashExchanges.size <= 2,
      s"expected <=2 hash exchanges, got ${hashExchanges.size}:\n$plan")
    val joins = collect(plan) {
      case j: SortMergeJoinExec => j
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.isEmpty, s"no generic join should remain:\n$plan")
  }
}
