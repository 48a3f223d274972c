package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q02 is SIZE-ADAPTIVE: below the (inflation-corrected) broadcast
  * threshold it plans two broadcast joins with no pre-aggregation; above
  * it, lineitem pre-aggregates to one row per order and (round 16) the
  * order-level rows pre-aggregate again to one row per customer below the
  * customer join. The two branches MUST be result-identical — the driver's
  * oracle only ever exercises the broadcast branch (orders is tiny at the
  * correctness SFs), so this spec pins the pre-agg branch to the broadcast
  * branch bit-for-bit at both small SFs. q04's pre-agg-below-outer-join
  * rewrite is oracle-covered directly, but its null-restoring projection
  * (unmatched customers -> 0 / 0.0) is pinned here too.
  */
class Q02BranchParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("q02-branch-parity-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(name: String, sfDir: String, forcePreAgg: Boolean): Seq[String] = {
    // inflation 1 keeps tiny tables broadcastable; a huge factor forces the
    // pre-agg branch on the same data (the runtime-conf dial q02 reads)
    spark.conf.set("graft.broadcast.inflation",
      if (forcePreAgg) Int.MaxValue.toString else "1")
    try graft.SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
    finally spark.conf.unset("graft.broadcast.inflation")
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"q02 broadcast and pre-agg branches are row-identical at $sf") {
      val broadcastRows = run("q02_revenue_by_segment", sf, forcePreAgg = false)
      val preAggRows = run("q02_revenue_by_segment", sf, forcePreAgg = true)
      assert(broadcastRows == preAggRows)
      assert(broadcastRows.nonEmpty)
    }
  }

  test("q04 unmatched customers keep exact zero aggregates and schema") {
    // the driver fixtures have no order-less customers (every c_custkey
    // matches), so the outer join's unmatched path needs its own corpus:
    // customers 1..4, orders only for 1 and 3 (one with a NULL price)
    val s = spark; import s.implicits._
    val dir = "/tmp/graft_tt/q04_parity"
    Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 10L, Some(100.004)), (1L, 11L, Some(0.006)),
        (3L, 30L, None: Option[Double]))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = graft.SparkEntry.queries("q04_left_outer_customer_orders")(spark, dir)
    // schema parity with the pre-r16 aggregate form: non-null count column,
    // NULLABLE rounded double (sum's nullability), exact names
    val fields = df.schema.fields.map(f => (f.name, f.dataType.sql, f.nullable)).toSeq
    assert(fields == Seq(
      ("c_custkey", "BIGINT", true), // parquet scans surface nullable
      ("n_orders", "BIGINT", false),
      ("spend", "DOUBLE", true)))
    // unmatched -> (0, 0.0) exactly; NULL price counts the order, adds 0.0
    assert(df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == Seq(
      (1L, 2L, 100.01), (2L, 0L, 0.0), (3L, 1L, 0.0), (4L, 0L, 0.0)))
  }
}
