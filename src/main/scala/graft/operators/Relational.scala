package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2.11): scans, projection/filter,
  * every join flavor, aggregation (hash/partial+final, distinct, rollup/cube/
  * grouping sets), window functions, sort/limit/top-k, set ops, subqueries.
  *
  * Scale stance (100 TB): every query is a declarative DataFrame plan —
  * Catalyst pushes filters/projections into the parquet scan, chooses
  * broadcast vs shuffle joins (we hint `broadcast` only for genuinely small
  * dims), and AQE re-plans skew at runtime. No collect(), no driver loops.
  */
object Relational {

  private def T(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** q02's broadcastability probe, cached per data dir (immutable files). */
  private val q02OrdSizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, BigInt]()

  // ------------------------------------------------- exact percentiles
  // Count-bucketed exact percentile machinery (round 17, VERDICT item 2;
  // guide §5): Spark's exact percentile/median plans as an
  // ObjectHashAggregate whose per-group state is the whole value MULTISET —
  // one task per group at any core count, and a hot group OOMs an executor
  // at 100 TB. The same exact statistics come out of (group, value) count
  // buckets: one parallel partial+final hash aggregate over the raw rows,
  // then a cumulative-count window over the tiny distinct-value table, and
  // rank lookups that replicate Spark's PercentileBase arithmetic exactly
  // (verified against the decompiled 4.1.2 bytecode and pinned by
  // PercentileRewriteSpec on randomized data):
  //  - continuous median: position = (n-1)*0.5; 0-based lower/higher =
  //    floor/ceil(position); result = lowerVal when the ranks (or values)
  //    coincide, else (higher-position)*lowerVal + (position-lower)*higherVal;
  //  - percentile_disc(p), non-legacy: value at 1-based rank
  //    ceil(n*p) where n*p is the same DOUBLE product Spark computes, so
  //    float-representation edges behave identically.

  /** Append total-count `n` and cumulative count `cum` per (g ordered by v)
    * to a (g, v, cnt) count-bucket table. One exchange on g, one sort.
    */
  private[operators] def withCumCounts(counts: DataFrame, g: String, v: String): DataFrame = {
    val byG = Window.partitionBy(col(g))
    val ord = Window.partitionBy(col(g)).orderBy(col(v))
    counts
      .withColumn("n", sum(col("cnt")).over(byG))
      .withColumn("cum", sum(col("cnt")).over(ord))
  }

  /** The value at 1-based rank `r` within each group: the first v (in v
    * order) whose cumulative count reaches r — a full-partition window min.
    */
  private[operators] def valueAtRank(g: String, v: String, r: Column): Column =
    min(when(col("cum") >= r, col(v))).over(Window.partitionBy(col(g)))

  /** Spark's continuous exact median over the count buckets, as a per-row
    * (group-constant) column. Requires withCumCounts columns.
    */
  private[operators] def medianCol(g: String, v: String): Column = {
    val pos = (col("n") - 1).cast("double") * lit(0.5)
    val lower0 = floor(pos) // 0-based lower position (LONG)
    val higher0 = ceil(pos)
    val lo = valueAtRank(g, v, lower0 + 1)
    val hi = valueAtRank(g, v, higher0 + 1)
    when(lo === hi, lo.cast("double"))
      .otherwise((higher0.cast("double") - pos) * lo.cast("double")
        + (pos - lower0.cast("double")) * hi.cast("double"))
  }

  /** Spark's non-legacy percentile_disc(p) over the count buckets, as a
    * per-row (group-constant) column. Requires withCumCounts columns.
    */
  private[operators] def percentileDiscCol(g: String, v: String, p: Double): Column =
    valueAtRank(g, v, ceil(col("n").cast("double") * lit(p)))

  /** Shared (l_returnflag, cents) count buckets for q106/q131/q134: the one
    * aggregation that touches every row, partial+final and fully parallel.
    */
  private[operators] def centsCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "lineitem")
      .select($"l_returnflag",
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("c"))
      .filter($"c".isNotNull) // percentile aggregates ignore nulls
      .groupBy($"l_returnflag", $"c").agg(count(lit(1)).as("cnt"))
  }

  /** Shared body of q08/q45: as-of join via (user, day)-bucketed union +
    * window, hot-key safe. The big window runs per (user, day) — bounded
    * work per task no matter how hot a user is — and a per-user carry-over
    * window runs only over the tiny (user, day) summary table to propagate
    * the last click across bucket boundaries. The event table is scanned
    * and shuffled ONCE: the explicit repartition on (user_id, bucket) is
    * the single exchange, shared verbatim by both consumers (runtime
    * ReuseExchange — both subtrees are canonically identical, which the
    * explicit not-null filters below preserve; the join would otherwise
    * push isnotnull(bucket) into only one side and defeat reuse). The
    * window's distribution requirement is satisfied by it, and the summary
    * aggregate groups on exactly its keys, so neither adds a shuffle — and
    * the aggregate reads the raw shuffle output directly rather than
    * re-running the window's 5-key sort. Only purchases — a fraction of
    * events — reach the join, and the carried summary (one row per active
    * user-day) broadcasts.
    */
  private[operators] def asofBucketed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = T(s, d, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .withColumn("tag", when($"event_type" === "click", 0).otherwise(1))
      .withColumn("click_id", when($"event_type" === "click", $"event_id"))
      .withColumn("bucket", expr("unix_micros(ts) div 86400000000")) // day
      .filter($"user_id".isNotNull && $"bucket".isNotNull)
      .repartition($"user_id", $"bucket") // the ONE big shuffle, shared below
    // in-bucket as-of: bounded per (user, day) regardless of user heat
    val wLocal = Window.partitionBy($"user_id", $"bucket")
      .orderBy($"ts", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = e.withColumn("lc_local", last($"click_id", ignoreNulls = true).over(wLocal))
    // tiny summary: one row per (user, day) with the bucket's last click,
    // aggregated straight off the shared exchange (no second window pass)
    val summary = e.groupBy($"user_id", $"bucket")
      .agg(expr("max_by(click_id, struct(ts, tag, event_id)) FILTER (WHERE click_id IS NOT NULL)")
        .as("bucket_last_click"))
    // carry the last click across PRIOR buckets (per-user window over the
    // summary only: rows-per-user = active days, never the event count)
    val wCarry = Window.partitionBy($"user_id").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = summary.withColumn(
      "carry", last($"bucket_last_click", ignoreNulls = true).over(wCarry))
      .select($"user_id", $"bucket", $"carry")
    // join ONLY the purchases with the tiny carried summary
    local.filter($"tag" === 1)
      .select($"user_id", $"bucket", $"event_id", $"lc_local")
      .join(carried, Seq("user_id", "bucket"))
      .select($"event_id".as("purchase_id"),
        coalesce($"lc_local", $"carry", lit(-1L)).as("last_click_id"))
      .orderBy($"purchase_id")
  }

  // ---------------------------------------------------------------- q01
  // Hash aggregation, partial+final (TPC-H Q1 shape). Single shuffle on the
  // (tiny-cardinality) group key; map-side combine does nearly all the work.
  private val q01 = GQuery(
    "q01_pricing_summary",
    "filter + hash aggregate with map-side partial aggregation",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(avg(l_quantity), 4) AS avg_qty,
            round(avg(l_discount), 4) AS avg_disc,
            count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""".stripMargin),
    bench = true)

  // ---------------------------------------------------------------- q02
  // 3-way join + aggregate, SIZE-ADAPTIVE like a real optimizer: when
  // orders fits the broadcast threshold (its plan stats vs the session's
  // autoBroadcastJoinThreshold), the whole query is one lineitem scan →
  // two broadcast hash joins → 5-key partial agg — ZERO large exchanges
  // (the earlier hand-written pre-aggregation forced a full l_orderkey
  // shuffle that the broadcast plan never needed; measured −30% at
  // sf0.1). When orders is too big to broadcast (the 100 TB case), the
  // pre-aggregation below the join earns its shuffle: lineitem collapses
  // to one row per order BEFORE the sort-merge joins, so both joins and
  // the o_custkey exchange move ~4x fewer rows (Catalyst won't push a
  // partial agg below a join itself). Round 16 (optimization): the same
  // trick one level up — the order-level rows collapse to one row per
  // CUSTOMER before the customer join, so the o_custkey exchange and the
  // customer sort-merge join move |customers| rows instead of |orders|
  // (~10x fewer; sum-of-sums algebra, identical result), and the final
  // segment aggregate reads |customers| rows instead of |orders|.
  private val q02 = GQuery(
    "q02_revenue_by_segment",
    "multi-table equi-join (shuffle hash / sort-merge) + aggregate",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer").select($"c_custkey", $"c_mktsegment")
      val ord = T(s, d, "orders").select($"o_orderkey", $"o_custkey")
      val line = T(s, d, "lineitem")
        .select($"l_orderkey", ($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
      // Round 16 (optimization): the raw plan estimate is COMPRESSED parquet
      // bytes, but what the executors must hold is an UnsafeRow hash
      // relation — typically 4-8x larger (decompression + row headers + map
      // overhead). Comparing the raw estimate against the broadcast
      // threshold kept choosing the broadcast plan one scale rung past
      // where it stops being cheap (guide §3.1: size estimates are often
      // badly wrong — correct them with what you know). The inflation
      // factor is a conf dial (graft.broadcast.inflation, default 4) so a
      // deployment can calibrate it to its codec and row shape.
      val inflation = s.conf.getOption("graft.broadcast.inflation")
        .flatMap(_.toIntOption).getOrElse(4)
      // the raw estimate is a pure function of the immutable table files,
      // but computing it runs the optimizer over the sub-plan (~120 ms of
      // driver time per build) — cache it per data dir (metadata caching,
      // the same class as Spark's own file-listing cache)
      val rawEstimate = q02OrdSizeCache.computeIfAbsent(d,
        _ => ord.queryExecution.optimizedPlan.stats.sizeInBytes)
      val ordersBroadcastable =
        rawEstimate * inflation <=
          s.sessionState.conf.autoBroadcastJoinThreshold
      val joined =
        if (ordersBroadcastable)
          line.join(ord, line("l_orderkey") === ord("o_orderkey"))
            .join(cust, ord("o_custkey") === cust("c_custkey"))
            .groupBy($"c_mktsegment")
            .agg(round(sum($"rev"), 2).as("revenue"), count(lit(1)).as("n_lines"))
        else {
          val li = line.groupBy($"l_orderkey")
            .agg(sum($"rev").as("o_rev"), count(lit(1)).as("o_lines"))
          val perCust = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
            .groupBy($"o_custkey")
            .agg(sum($"o_rev").as("c_rev"), sum($"o_lines").as("c_lines"))
          perCust.join(cust, perCust("o_custkey") === cust("c_custkey"))
            .groupBy($"c_mktsegment")
            .agg(round(sum($"c_rev"), 2).as("revenue"), sum($"c_lines").as("n_lines"))
        }
      joined.orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            count(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment"""),
    bench = true)

  // ---------------------------------------------------------------- q03
  // Broadcast join: part is a small dim at any SF — explicitly broadcast so
  // the 100 TB fact side never shuffles for this join.
  private val q03 = GQuery(
    "q03_broadcast_join_brand_volume",
    "broadcast hash join (small dim x huge fact)",
    (s, d) => {
      import s.implicits._
      val li = T(s, d, "lineitem").select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val part = T(s, d, "part").select($"p_partkey", $"p_brand")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy($"p_brand")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("n_lines"))
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_price,
            count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
            ORDER BY p_brand"""),
    bench = true)

  // ---------------------------------------------------------------- q04
  // Round 16 (optimization): orders pre-aggregate to one row per custkey
  // BELOW the outer join (count/sum are mergeable partials; Catalyst
  // won't push an aggregate below an outer join itself), so the join and
  // its exchange move |customers-with-orders| rows instead of |orders|
  // (~10x fewer) and the post-join aggregate disappears. Unmatched
  // customers surface as null aggregates and are restored to the exact
  // original values (0 / 0.0) by the null-preserving projection.
  private val q04 = GQuery(
    "q04_left_outer_customer_orders",
    "left outer join preserving unmatched rows + aggregate",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer").select($"c_custkey")
      val ord = T(s, d, "orders").select($"o_custkey", $"o_orderkey", $"o_totalprice")
      val perCust = ord.groupBy($"o_custkey")
        .agg(count($"o_orderkey").as("cnt"),
          sum(coalesce($"o_totalprice", lit(0.0))).as("sp"))
      cust.join(perCust, cust("c_custkey") === perCust("o_custkey"), "left_outer")
        .select($"c_custkey",
          coalesce($"cnt", lit(0L)).as("n_orders"),
          // when/otherwise (not coalesce) keeps the column nullable, the
          // exact output schema the pre-r16 aggregate produced
          round(when($"sp".isNull, lit(0.0)).otherwise($"sp"), 2).as("spend"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
            round(sum(coalesce(o_totalprice, 0.0)), 2) AS spend
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
            ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q05
  private val q05 = GQuery(
    "q05_semi_join_big_lines",
    "left semi join (EXISTS) — dedup-free existence filter",
    (s, d) => {
      import s.implicits._
      val ord = T(s, d, "orders").select($"o_orderkey", $"o_orderstatus")
      val big = T(s, d, "lineitem").filter($"l_quantity" >= 48).select($"l_orderkey")
      ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus"""))

  // ---------------------------------------------------------------- q06
  private val q06 = GQuery(
    "q06_anti_join_customers_without_big_orders",
    "left anti join (NOT EXISTS)",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer").select($"c_custkey", $"c_name")
      val big = T(s, d, "orders").filter($"o_totalprice" > 400000).select($"o_custkey")
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
            ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q07
  // Theta/range join: non-equi condition against a tiny broadcast side →
  // BroadcastNestedLoopJoin; the fact side streams once, no shuffle.
  private val q07 = GQuery(
    "q07_range_join_price_bands",
    "non-equi (range) join against a broadcast inline dimension",
    (s, d) => {
      import s.implicits._
      val bands = Seq(
        ("b1_900_925", 900.0, 925.0),
        ("b2_925_950", 925.0, 950.0),
        ("b3_950_975", 950.0, 975.0),
        ("b4_975_1000", 975.0, 1000.0)).toDF("band", "lo", "hi")
      val part = T(s, d, "part").select($"p_retailprice")
      part.join(broadcast(bands),
          part("p_retailprice") >= bands("lo") && part("p_retailprice") < bands("hi"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_parts"), round(avg($"p_retailprice"), 4).as("avg_price"))
        .orderBy($"band")
    },
    Some("""WITH bands(band, lo, hi) AS (VALUES
              ('b1_900_925', 900.0, 925.0),
              ('b2_925_950', 925.0, 950.0),
              ('b3_950_975', 950.0, 975.0),
              ('b4_975_1000', 975.0, 1000.0))
            SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
            FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
            GROUP BY band
            ORDER BY band"""))

  /** Shared body of q08/q186: as-of join through the NATIVE AsOfJoin
    * operator — one exchange per side on user_id, per-partition
    * (key, time) sort, O(1) merge state, (ts, event_id) tie resolution.
    */
  private def nativeAsof(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = T(s, d, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    graft.plans.AsOfJoin.asofJoin(purchases, clicks,
      on = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
      rightTiebreakCols = Seq("event_id"))
      .select($"event_id".as("purchase_id"),
        coalesce($"right_event_id", lit(-1L)).as("last_click_id"))
      .orderBy($"purchase_id")
  }

  // ---------------------------------------------------------------- q08
  // As-of join through the NATIVE AsOfJoin operator (plans/AsOfJoin.scala
  // — custom logical node + Strategy + one-pass co-partitioned merge):
  // one exchange per side on user_id, per-partition (key, time) sort,
  // O(1) merge state. Measured 2.1× faster than the (user, day)-bucketed
  // union+window formulation this gate ran through round 11 (sf0.1
  // best-of-3: 0.29 s vs 0.61 s) — the merge never materializes the
  // union's null-padded columns through a window sort. The bucketed
  // variant REMAINS the answer for pathological single-key skew (a hot
  // user serializes into one merge task here) and still gates as q45.
  private val q08 = GQuery(
    "q08_asof_join_last_click_before_purchase",
    "as-of (most-recent-event) join via the native co-partitioned merge operator",
    (s, d) => nativeAsof(s, d),
    Some("""SELECT purchase_id, coalesce(c_id, -1) AS last_click_id FROM (
              SELECT p.event_id AS purchase_id, c.event_id AS c_id,
                     row_number() OVER (PARTITION BY p.event_id
                                        ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON c.user_id = p.user_id AND c.ts <= p.ts) t
            WHERE rn = 1
            ORDER BY purchase_id"""),
    bench = true)

  // ---------------------------------------------------------------- q186
  // q08's as-of semantics through the NATIVE AsOfJoin custom operator
  // (plans/AsOfJoin.scala: logical node → planner Strategy → one-pass
  // co-partitioned merge exec — SURVEY §7.3's full option-(c) ladder).
  // One exchange per side on user_id, per-partition (key, time) sort,
  // O(1) merge state; the tiebreak column reproduces the oracle's
  // (ts DESC, event_id DESC) tie resolution exactly. Same oracle as q08,
  // so the custom operator and the composed union+window plan are both
  // pinned to the identical answer.
  private val q186 = GQuery(
    "q186_native_asof_join",
    "native AsOfJoin operator (custom LogicalPlan + Strategy + merge exec)",
    (s, d) => nativeAsof(s, d),
    Some("""SELECT purchase_id, coalesce(c_id, -1) AS last_click_id FROM (
              SELECT p.event_id AS purchase_id, c.event_id AS c_id,
                     row_number() OVER (PARTITION BY p.event_id
                                        ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON c.user_id = p.user_id AND c.ts <= p.ts) t
            WHERE rn = 1
            ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- q187
  // Forward as-of through the same native operator: each click pairs
  // with the FIRST purchase at-or-after it by the same user — the
  // time-to-conversion attribution query (merge_asof direction=forward).
  // Identical plan shape to q186; forward peeks the right cursor instead
  // of buffering a candidate, so the state is still O(1).
  private val q187 = GQuery(
    "q187_native_asof_forward",
    "forward as-of (first event at-or-after) via the native operator",
    (s, d) => {
      import s.implicits._
      val ev = T(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      graft.plans.AsOfJoin.asofJoin(clicks, purchases,
        on = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        rightTiebreakCols = Seq("event_id"), direction = "forward")
        .select($"event_id".as("click_id"),
          coalesce($"right_event_id", lit(-1L)).as("next_purchase_id"))
        .orderBy($"click_id")
    },
    Some("""SELECT click_id, coalesce(p_id, -1) AS next_purchase_id FROM (
              SELECT c.event_id AS click_id, p.event_id AS p_id,
                     row_number() OVER (PARTITION BY c.event_id
                                        ORDER BY p.ts ASC, p.event_id ASC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'click') c
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
                ON p.user_id = c.user_id AND p.ts >= c.ts) t
            WHERE rn = 1
            ORDER BY click_id"""))

  // ---------------------------------------------------------------- q191
  // Bounded-lookback as-of through the native operator: the attribution
  // window most marketing/feature pipelines actually use ("last click
  // WITHIN AN HOUR before the purchase" — a stale click attributes
  // nothing). toleranceMicros rides the same merge; the oracle bounds
  // the inequality join symmetrically.
  private val q191 = GQuery(
    "q191_native_asof_tolerance",
    "as-of with bounded lookback (tolerance) via the native operator",
    (s, d) => {
      import s.implicits._
      val ev = T(s, d, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      graft.plans.AsOfJoin.asofJoin(purchases, clicks,
        on = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        rightTiebreakCols = Seq("event_id"),
        toleranceMicros = Some(3600L * 1000000L))
        .select($"event_id".as("purchase_id"),
          coalesce($"right_event_id", lit(-1L)).as("click_in_window"))
        .orderBy($"purchase_id")
    },
    Some("""SELECT purchase_id, coalesce(c_id, -1) AS click_in_window FROM (
              SELECT p.event_id AS purchase_id, c.event_id AS c_id,
                     row_number() OVER (PARTITION BY p.event_id
                                        ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON c.user_id = p.user_id AND c.ts <= p.ts
               AND c.ts >= p.ts - INTERVAL 1 HOUR) t
            WHERE rn = 1
            ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- q196
  // Skew-robust NATIVE as-of: q45's hot-key concern solved inside the
  // operator instead of by the union+window composition. saltBuckets=8
  // appends a deterministic left-row bucket to the merge keys and
  // replicates the (smaller) click history into each bucket — a hot
  // user's purchases split across 8 merge tasks while every bucket still
  // sees the user's full history, so the result is bit-identical (same
  // oracle as q08/q45/q186 pins all four formulations to one answer).
  // At 100 TB this is the dial: plain native merge for organic keys,
  // salted native merge when one key dominates, the bucketed composition
  // only if the RIGHT side is too big to replicate x8.
  private val q196 = GQuery(
    "q196_native_asof_salted",
    "skew-robust native as-of (salt-bucketed merge, right side replicated)",
    (s, d) => {
      import s.implicits._
      val ev = T(s, d, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      graft.plans.AsOfJoin.asofJoin(purchases, clicks,
        on = Seq("user_id"), leftTimeCol = "ts", rightTimeCol = "ts",
        rightTiebreakCols = Seq("event_id"), saltBuckets = 8)
        .select($"event_id".as("purchase_id"),
          coalesce($"right_event_id", lit(-1L)).as("last_click_id"))
        .orderBy($"purchase_id")
    },
    Some("""SELECT purchase_id, coalesce(c_id, -1) AS last_click_id FROM (
              SELECT p.event_id AS purchase_id, c.event_id AS c_id,
                     row_number() OVER (PARTITION BY p.event_id
                                        ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON c.user_id = p.user_id AND c.ts <= p.ts) t
            WHERE rn = 1
            ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- q09
  private val q09 = GQuery(
    "q09_agg_distinct_stats",
    "distinct aggregates + full numeric aggregate battery",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          countDistinct($"o_custkey").as("n_cust"),
          countDistinct($"o_orderpriority").as("n_prio"),
          round(sum($"o_totalprice"), 2).as("sum_price"),
          round(avg($"o_totalprice"), 4).as("avg_price"),
          round(min($"o_totalprice"), 2).as("min_price"),
          round(max($"o_totalprice"), 2).as("max_price"),
          round(stddev_samp($"o_totalprice"), 2).as("sd_price"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
            count(DISTINCT o_custkey) AS n_cust,
            count(DISTINCT o_orderpriority) AS n_prio,
            round(sum(o_totalprice), 2) AS sum_price,
            round(avg(o_totalprice), 4) AS avg_price,
            round(min(o_totalprice), 2) AS min_price,
            round(max(o_totalprice), 2) AS max_price,
            round(stddev_samp(o_totalprice), 2) AS sd_price
            FROM orders
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus"""))

  // ---------------------------------------------------------------- q10
  private val q10 = GQuery(
    "q10_rollup_region_nation",
    "ROLLUP hierarchy aggregate over a snowflake join",
    (s, d) => {
      import s.implicits._
      val cust = T(s, d, "customer").select($"c_custkey", $"c_nationkey")
      val nat = T(s, d, "nation")
      val reg = T(s, d, "region")
      val ord = T(s, d, "orders").select($"o_custkey", $"o_totalprice")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .select(
          coalesce($"r_name", lit("(all)")).as("region"),
          coalesce($"n_name", lit("(all)")).as("nation"),
          $"revenue", $"n_orders")
        .orderBy($"region", $"nation")
    },
    Some("""SELECT coalesce(r_name, '(all)') AS region,
                   coalesce(n_name, '(all)') AS nation,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY region, nation"""))

  // ---------------------------------------------------------------- q11
  private val q11 = GQuery(
    "q11_cube_returnflag_linestatus",
    "CUBE aggregate (all grouping-set combinations)",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce($"l_returnflag", lit("(all)")).as("rf"),
          coalesce($"l_linestatus", lit("(all)")).as("ls"),
          $"sum_qty", $"n")
        .orderBy($"rf", $"ls")
    },
    Some("""SELECT coalesce(l_returnflag, '(all)') AS rf,
                   coalesce(l_linestatus, '(all)') AS ls,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY rf, ls"""))

  // ---------------------------------------------------------------- q12
  private val q12 = GQuery(
    "q12_window_topk_per_customer",
    "ranking window function (row_number) + per-group top-k",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      T(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"rk", $"o_orderkey", round($"o_totalprice", 2).as("price"))
        .orderBy($"o_custkey", $"rk")
    },
    Some("""SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS price FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders) t
            WHERE rk <= 3
            ORDER BY o_custkey, rk"""),
    bench = true)

  // ---------------------------------------------------------------- q13
  private val q13 = GQuery(
    "q13_window_running_total",
    "cumulative window frame (rows unbounded preceding)",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          round(sum($"o_totalprice").over(w), 2).as("running_spend"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
            FROM orders
            ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q14
  private val q14 = GQuery(
    "q14_window_lag_delta",
    "lag/lead navigation window function",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T(s, d, "events")
        .select($"event_id", $"user_id",
          round(coalesce($"value" - lag($"value", 1).over(w), lit(0.0)), 2).as("delta"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id,
                   round(coalesce(value - lag(value, 1) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id), 0.0), 2) AS delta
            FROM events
            ORDER BY event_id"""))

  // ---------------------------------------------------------------- q15
  // Top-k: Catalyst compiles orderBy+limit into TakeOrderedAndProject —
  // per-partition heaps + driver merge, never a full sort at scale.
  private val q15 = GQuery(
    "q15_topk_orders",
    "global top-k (TakeOrderedAndProject, no full sort)",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", round($"o_totalprice", 2).as("price"))
    },
    Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10"""))

  // ---------------------------------------------------------------- q16
  private val q16 = GQuery(
    "q16_set_ops",
    "INTERSECT / EXCEPT / UNION set operations",
    (s, d) => {
      import s.implicits._
      val a = T(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("k"))
      val b = T(s, d, "orders").filter($"o_totalprice" > 300000)
        .select($"o_custkey".as("k")).distinct()
      a.intersect(b).withColumn("op", lit("intersect"))
        .unionAll(a.except(b).withColumn("op", lit("except")))
        .unionAll(a.union(b).distinct().withColumn("op", lit("union")))
        .orderBy($"op", $"k")
    },
    Some("""WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
                 b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
            SELECT k, 'intersect' AS op FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
            UNION ALL
            SELECT k, 'except' AS op FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
            UNION ALL
            SELECT k, 'union' AS op FROM (SELECT k FROM a UNION SELECT k FROM b)
            ORDER BY op, k"""))

  // ---------------------------------------------------------------- q17
  private val q17 = GQuery(
    "q17_string_functions",
    "scalar string function battery (codegen'd, no UDFs)",
    (s, d) => {
      import s.implicits._
      T(s, d, "part")
        .select(
          $"p_partkey",
          upper($"p_type").as("u"),
          lower($"p_brand").as("lo"),
          length($"p_name").as("len"),
          substring($"p_name", 1, 8).as("pre"),
          concat_ws("|", $"p_brand", $"p_type").as("cat"),
          instr($"p_name", "a").cast("int").as("pos_a"),
          reverse($"p_brand").as("rev"),
          lpad($"p_brand", 12, "*").as("pad"),
          translate($"p_type", "AEIOU", "aeiou").as("tr"),
          trim(lit("  x  ")).as("trm"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
                   upper(p_type) AS u,
                   lower(p_brand) AS lo,
                   CAST(length(p_name) AS INTEGER) AS len,
                   substr(p_name, 1, 8) AS pre,
                   concat_ws('|', p_brand, p_type) AS cat,
                   CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a,
                   reverse(p_brand) AS rev,
                   lpad(p_brand, 12, '*') AS pad,
                   translate(p_type, 'AEIOU', 'aeiou') AS tr,
                   trim('  x  ') AS trm
            FROM part
            ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q18
  private val q18 = GQuery(
    "q18_date_functions",
    "scalar date/time function battery",
    (s, d) => {
      import s.implicits._
      T(s, d, "orders")
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          quarter($"o_orderdate").as("q"),
          dayofmonth($"o_orderdate").as("dom"),
          $"o_orderdate".cast("date").as("od"),
          last_day($"o_orderdate").as("eom"),
          date_add($"o_orderdate".cast("date"), 30).as("plus30"),
          datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("age_days"),
          unix_micros($"o_orderdate").as("epoch_us"),
          date_format($"o_orderdate", "yyyy-MM").as("ym"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INTEGER) AS y,
                   CAST(month(o_orderdate) AS INTEGER) AS m,
                   CAST(quarter(o_orderdate) AS INTEGER) AS q,
                   CAST(day(o_orderdate) AS INTEGER) AS dom,
                   CAST(o_orderdate AS DATE) AS od,
                   last_day(CAST(o_orderdate AS DATE)) AS eom,
                   CAST(o_orderdate AS DATE) + 30 AS plus30,
                   CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS age_days,
                   epoch_us(o_orderdate) AS epoch_us,
                   strftime(o_orderdate, '%Y-%m') AS ym
            FROM orders
            ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q19
  private val q19 = GQuery(
    "q19_math_functions",
    "scalar math function battery + CASE/COALESCE",
    (s, d) => {
      import s.implicits._
      T(s, d, "part")
        .select(
          $"p_partkey",
          round(sqrt($"p_retailprice"), 6).as("sq"),
          ceil($"p_retailprice").as("ce"),
          floor($"p_retailprice").as("fl"),
          round(log($"p_retailprice"), 6).as("ln_p"),
          round(pow($"p_size", 2), 1).as("sz2"),
          ($"p_size" % 7).as("m7"),
          greatest($"p_size", lit(25)).as("gt"),
          least($"p_size", lit(25)).as("lt"),
          round(abs($"p_retailprice" - 950.0), 2).as("dist"),
          when($"p_size" >= 25, "big").otherwise("small").as("sz_class"),
          coalesce(nullif($"p_brand", lit("Brand#1")), lit("(b1)")).as("brand_or"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
                   round(sqrt(p_retailprice), 6) AS sq,
                   CAST(ceil(p_retailprice) AS BIGINT) AS ce,
                   CAST(floor(p_retailprice) AS BIGINT) AS fl,
                   round(ln(p_retailprice), 6) AS ln_p,
                   round(pow(p_size, 2), 1) AS sz2,
                   CAST(p_size % 7 AS INTEGER) AS m7,
                   CAST(greatest(p_size, 25) AS INTEGER) AS gt,
                   CAST(least(p_size, 25) AS INTEGER) AS lt,
                   round(abs(p_retailprice - 950.0), 2) AS dist,
                   CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS sz_class,
                   coalesce(nullif(p_brand, 'Brand#1'), '(b1)') AS brand_or
            FROM part
            ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q20
  private val q20 = GQuery(
    "q20_having_supplier_volume",
    "GROUP BY + HAVING post-aggregate filter",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .groupBy($"l_suppkey")
        .agg(round(sum($"l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
        .filter($"qty" > 100)
        .orderBy($"l_suppkey")
    },
    Some("""SELECT l_suppkey, round(sum(l_quantity), 2) AS qty, count(*) AS n
            FROM lineitem
            GROUP BY l_suppkey
            HAVING round(sum(l_quantity), 2) > 100
            ORDER BY l_suppkey"""))

  // ---------------------------------------------------------------- q21
  // Same SQL text runs on Spark (only the two referenced views registered)
  // and DuckDB — scalar + IN subqueries are decorrelated by Catalyst into
  // joins automatically.
  private val q21Sql =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""".stripMargin
  private val q21 = GQuery(
    "q21_subqueries",
    "scalar + IN subqueries (Catalyst decorrelation)",
    (s, d) => { Tables.register(s, d, "orders", "customer"); s.sql(q21Sql) },
    Some(q21Sql))

  // ---------------------------------------------------------------- q25
  private val q25Sql =
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      |       coalesce(l_linestatus, '(all)') AS ls,
      |       round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin
  private val q25 = GQuery(
    "q25_grouping_sets",
    "explicit GROUPING SETS aggregate",
    (s, d) => { Tables.register(s, d, "lineitem"); s.sql(q25Sql) },
    Some(q25Sql))

  // ---------------------------------------------------------------- q23
  // Pivot: Spark-side relational pivot; oracle expresses the same result as
  // conditional aggregation (portable ANSI form).
  private val q23 = GQuery(
    "q23_pivot_event_values",
    "pivot (wide conditional aggregation)",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .withColumn("cohort", ($"user_id" % 10).cast("int"))
        .groupBy($"cohort")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum($"value"), 2))
        .orderBy($"cohort")
    },
    Some("""SELECT CAST(user_id % 10 AS INTEGER) AS cohort,
                   round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
                   round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
                   round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
                   round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
            FROM events
            GROUP BY 1
            ORDER BY cohort"""))

  // ---------------------------------------------------------------- q24
  // explode = distributed flatMap: shuffle only the (token) agg, order+limit
  // is TakeOrdered. The canonical "tokenize the corpus" shape.
  private val q24 = GQuery(
    "q24_explode_top_tokens",
    "explode/unnest (generator) + aggregate + top-k",
    (s, d) => {
      import s.implicits._
      T(s, d, "documents")
        .select(explode(split($"text", " ")).as("token"))
        .filter($"token" =!= "")
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc)
        .limit(50)
    },
    Some("""SELECT token, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
            WHERE token <> ''
            GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT 50"""),
    bench = true)

  // ---------------------------------------------------------------- q26
  // JSON path extraction: Spark 4 Variant (parse_json + variant_get) — the
  // open-typed row model SURVEY §1.3 calls for; oracle uses DuckDB JSON.
  private val q26 = GQuery(
    "q26_json_extract_props",
    "semi-structured JSON field extraction (VariantType)",
    (s, d) => {
      import s.implicits._
      T(s, d, "events")
        .select($"event_type",
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(avg($"k"), 4).as("avg_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
                   round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
                   CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
                   CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
            FROM events
            GROUP BY event_type
            ORDER BY event_type"""))

  // ---------------------------------------------------------------- q94
  // Full outer join: both sides keep unmatched rows (BUILDING customers
  // with no F-status orders, and F-status customers outside BUILDING).
  // Portable ANSI — one shared SQL string. Catalyst plans SortMergeJoin
  // FullOuter; full outer cannot broadcast (both sides preserve), so the
  // shuffle is inherent and keyed correctly.
  private val q94Sql =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
      |       c.c_name,
      |       o.n_orders,
      |       o.total_f
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
      |FULL OUTER JOIN (
      |  SELECT o_custkey, count(*) AS n_orders,
      |         round(sum(o_totalprice), 2) AS total_f
      |  FROM orders WHERE o_orderstatus = 'F'
      |  GROUP BY o_custkey) o
      |ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin
  private val q94 = GQuery(
    "q94_full_outer_join",
    "full outer join (both sides preserved)",
    (s, d) => { Tables.register(s, d, "customer", "orders"); s.sql(q94Sql) },
    Some(q94Sql))

  // ---------------------------------------------------------------- q95
  // Unpivot/melt: wide measure columns to (measure, amount) rows via the
  // relational unpivot operator (Spark's Unpivot logical node — the
  // DataFrame.unpivot API); the oracle expresses the same result in the
  // portable UNION ALL form.
  private val q95 = GQuery(
    "q95_unpivot_melt",
    "unpivot/melt wide measures to long form",
    (s, d) => {
      import s.implicits._
      T(s, d, "lineitem")
        .groupBy($"l_returnflag".as("rf"))
        .agg(round(sum($"l_extendedprice"), 2).as("extendedprice"),
          round(sum($"l_discount"), 2).as("discount"),
          round(sum($"l_tax"), 2).as("tax"))
        .unpivot(Array($"rf"),
          Array($"extendedprice", $"discount", $"tax"), "measure", "amount")
        .orderBy($"rf", $"measure")
    },
    Some("""WITH wide AS (
              SELECT l_returnflag AS rf,
                     round(sum(l_extendedprice), 2) AS extendedprice,
                     round(sum(l_discount), 2) AS discount,
                     round(sum(l_tax), 2) AS tax
              FROM lineitem GROUP BY 1)
            SELECT rf, measure, amount FROM (
              SELECT rf, 'extendedprice' AS measure, extendedprice AS amount FROM wide
              UNION ALL
              SELECT rf, 'discount', discount FROM wide
              UNION ALL
              SELECT rf, 'tax', tax FROM wide) t
            ORDER BY rf, measure"""))

  // ---------------------------------------------------------------- q96
  // Distribution window functions: ntile / percent_rank / cume_dist. The
  // window ORDER includes the unique o_orderkey tiebreak, so every rank is
  // a strict position and the IEEE divisions (rank-1)/(n-1), c/n evaluate
  // over identical integers in both engines — bit-exact doubles, no
  // rounding needed. Shared SQL.
  private val q96Sql =
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin
  private val q96 = GQuery(
    "q96_window_distribution",
    "distribution window functions (ntile, percent_rank, cume_dist)",
    (s, d) => { Tables.register(s, d, "orders"); s.sql(q96Sql) },
    Some(q96Sql))

  // ---------------------------------------------------------------- q97
  // Ordered string aggregation (LISTAGG / string_agg): Spark side
  // canonicalizes collect_list's nondeterministic arrival order with
  // array_sort before joining — names are unique per group, so the sorted
  // concatenation is exactly the oracle's string_agg(... ORDER BY). The
  // per-group payload is bounded by the acctbal filter; an unbounded
  // group concat at corpus scale would want the explode/window form
  // instead of a single giant string.
  private val q97 = GQuery(
    "q97_listagg_sorted",
    "ordered group string concatenation (LISTAGG/string_agg)",
    (s, d) => {
      import s.implicits._
      T(s, d, "customer").filter($"c_acctbal" > 9000)
        .join(T(s, d, "nation"), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list($"c_name")), "|").as("names"))
        .orderBy($"n_name")
    },
    Some("""SELECT n_name, count(*) AS n,
                   string_agg(c_name, '|' ORDER BY c_name) AS names
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > 9000
            GROUP BY n_name
            ORDER BY n_name"""))

  // ---------------------------------------------------------------- q98
  // Time-interval RANGE window frame: per-user rolling 7-day event count
  // and value sum — the frame is defined by the ORDER key's VALUE
  // (ts >= current - 7 days), not row positions, so ties and gaps behave
  // identically in both engines. The summed quantity is integer cents
  // (floor of value*100 — floor, not round: engines disagree on
  // double-rounding modes but never on floor), so the windowed sum is
  // exact whatever order the frame accumulates in. Shared SQL.
  private val q98Sql =
    """SELECT event_id, user_id,
      |       count(*) OVER w AS n_7d,
      |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin
  private val q98 = GQuery(
    "q98_window_range_interval",
    "interval RANGE window frame (rolling 7-day per-user totals)",
    (s, d) => { Tables.register(s, d, "events"); s.sql(q98Sql) },
    Some(q98Sql))

  // ---------------------------------------------------------------- q99
  // Regex set extraction: regexp_extract_all + explode — the log/corpus
  // token-mining shape. Both engines find non-overlapping left-to-right
  // matches; the explicit capture-group index pins the one API default
  // that differs (Spark defaults to group 1, DuckDB to group 0).
  private val q99 = GQuery(
    "q99_regexp_extract_all",
    "regexp_extract_all + explode token mining",
    (s, d) => {
      import s.implicits._
      T(s, d, "documents")
        .select(explode(expr("regexp_extract_all(text, '(s[a-z]{4,})', 1)")).as("tok"))
        .groupBy($"tok")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok".asc)
        .limit(20)
    },
    Some("""SELECT tok, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '(s[a-z]{4,})', 1)) AS tok
                  FROM documents) t
            GROUP BY tok
            ORDER BY n DESC, tok ASC
            LIMIT 20"""))

  // ---------------------------------------------------------------- q100
  // Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys MATCH
  // each other — Catalyst plans EqualNullSafe as a real equi-join key
  // (shuffle on the coalesced key), not a theta join, so the operator
  // scales like any hash join. The nullif() manufactures a null stratum
  // from real data; output coalesces it so the ORDER key is null-free
  // (Spark sorts nulls first, DuckDB last — keep the divergence out).
  private val q100 = GQuery(
    "q100_null_safe_join",
    "null-safe equality join (<=> / IS NOT DISTINCT FROM)",
    (s, d) => {
      Tables.register(s, d, "orders")
      s.sql("""SELECT coalesce(d.p, '(urgent)') AS prio, count(*) AS n,
              |       round(sum(o.o_totalprice), 2) AS total
              |FROM orders o
              |JOIN (SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS p
              |      FROM orders) d
              |ON nullif(o.o_orderpriority, '1-URGENT') <=> d.p
              |GROUP BY d.p
              |ORDER BY prio""".stripMargin)
    },
    Some("""SELECT coalesce(d.p, '(urgent)') AS prio, count(*) AS n,
                   round(sum(o.o_totalprice), 2) AS total
            FROM orders o
            JOIN (SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS p
                  FROM orders) d
            ON nullif(o.o_orderpriority, '1-URGENT') IS NOT DISTINCT FROM d.p
            GROUP BY d.p
            ORDER BY prio"""))

  // --------------------------------------------------------------- q103
  // Gap-based sessionization — the clickstream → session rollup every
  // event pipeline needs: a session breaks after 30 idle minutes. Two
  // window passes share ONE sort (same partition/order → Spark plans a
  // single exchange + sort), and the final per-session rollup groups on
  // (user_id, sess_id) — a superset of the window's hash keys, so the
  // aggregation reuses the same distribution with no further shuffle.
  // Per-task work is bounded by a user's event count; at corpus scale a
  // pathological single user would want the q08-style day-bucket split.
  // Summed value is integer cents (floor — engines agree on floor,
  // not on double-rounding modes), so sums are order-independent exact.
  private val q103Sql =
    """WITH gaps AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, event_id, value,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM gaps
      |)
      |SELECT user_id, sess_id, count(*) AS n_events,
      |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM sess
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin
  private val q103 = GQuery(
    "q103_sessionize",
    "gap-based sessionization (30-min idle timeout) + per-session rollup",
    (s, d) => { Tables.register(s, d, "events"); s.sql(q103Sql) },
    Some(q103Sql))

  // --------------------------------------------------------------- q104
  // Hand-salted skew join, gated for EXACT parity with the plain join:
  // the fact side gets a deterministic per-row salt, the dim side is
  // replicated once per salt value, and the join key becomes
  // (key, salt) — a hot orderkey's rows now land on SALT different
  // reducers instead of one. Salting must never change RESULTS, only
  // placement; the oracle is the unsalted join, so the gate proves it.
  // This is the manual fallback for skew AQE can't fix (a single hot
  // key inside one partition); the dim-side blowup is ×SALT rows, fine
  // for dims that are orders(-of-magnitude) smaller than the fact.
  private val q104 = GQuery(
    "q104_salted_skew_join",
    "salted join (fact salt × replicated dim) — result-parity with plain join",
    (s, d) => {
      import s.implicits._
      val nSalt = 8
      val fact = T(s, d, "lineitem")
        .select($"l_orderkey", $"l_quantity")
        .withColumn("__salt", pmod(hash($"l_orderkey", $"l_quantity"), lit(nSalt)))
      val dim = T(s, d, "orders")
        .select($"o_orderkey", $"o_orderpriority")
        .withColumn("__salt", explode(array((0 until nSalt).map(lit): _*)))
      fact.join(dim,
          fact("l_orderkey") === dim("o_orderkey") && fact("__salt") === dim("__salt"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(l_quantity AS BIGINT)")).as("qty"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  // --------------------------------------------------------------- q105
  // Correlated EXISTS / NOT EXISTS in WHERE — Catalyst rewrites them to
  // left-semi and left-anti joins on the correlation key, so both
  // predicates scale like hash joins (shuffle on custkey), never as
  // per-row subquery execution. Shared SQL.
  private val q105Sql =
    """SELECT c_mktsegment, count(*) AS n
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 200000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F'
      |                    AND o2.o_totalprice < 10000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
  private val q105 = GQuery(
    "q105_exists_correlated",
    "correlated EXISTS + NOT EXISTS (semi/anti join plan)",
    (s, d) => { Tables.register(s, d, "customer", "orders"); s.sql(q105Sql) },
    Some(q105Sql))

  // --------------------------------------------------------------- q106
  // Exact ordered-set aggregates: median + percentile_disc over integer
  // cents. Cents make interpolation exact (midpoint of two bigints is a
  // double-exact .0/.5), and percentile_disc picks an ACTUAL value, so
  // both engines agree bit-for-bit.
  // Round 17 (optimization): computed over COUNT BUCKETS instead of
  // Spark's native ObjectHashAggregate value-multiset (one task per group,
  // OOM-by-design on a hot group at 100 TB) — a parallel partial+final
  // hash aggregate on (flag, cents) plus a cumulative window over the tiny
  // distinct-cents table; the rank arithmetic replicates PercentileBase
  // exactly (see the helpers above; PercentileRewriteSpec pins parity).
  private val q106 = GQuery(
    "q106_percentiles_exact",
    "exact median + percentile_disc (ordered-set aggregates)",
    (s, d) => {
      import s.implicits._
      val cc = withCumCounts(centsCounts(s, d), "l_returnflag", "c")
        .withColumn("__med", medianCol("l_returnflag", "c"))
        .withColumn("__p25", percentileDiscCol("l_returnflag", "c", 0.25))
      cc.groupBy($"l_returnflag")
        .agg(min($"__med").as("med_cents"),
          min($"__p25").cast("double").as("p25_cents"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   CAST(median(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS med_cents,
                   CAST(quantile_disc(CAST(floor(l_extendedprice * 100) AS BIGINT), 0.25) AS DOUBLE) AS p25_cents
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- q107
  // LATERAL correlated subquery (per-row scalar aggregate): Catalyst
  // decorrelates the lateral aggregate into a grouped aggregate joined
  // back on the correlation key — one shuffle each side, never per-row
  // re-execution. The empty-group semantics (agg with no GROUP BY always
  // yields a row) match DuckDB's LATERAL exactly.
  private val q107Sql =
    """SELECT n_name, t.n_cust, t.top_bal
      |FROM nation, LATERAL (
      |  SELECT count(*) AS n_cust, max(c_acctbal) AS top_bal
      |  FROM customer
      |  WHERE c_nationkey = n_nationkey) t
      |ORDER BY n_name""".stripMargin
  private val q107 = GQuery(
    "q107_lateral_join",
    "LATERAL correlated scalar-aggregate subquery",
    (s, d) => { Tables.register(s, d, "nation", "customer"); s.sql(q107Sql) },
    Some(q107Sql))

  // --------------------------------------------------------------- q108
  // Statistical aggregates (variance / stddev / correlation) computed
  // EXACTLY across engines: native stddev/corr stream doubles in
  // engine-specific orders (never hash-identical), so the moments
  // (n, Σx, Σx², Σy, Σy², Σxy) are accumulated as exact integers over
  // cents — Spark DECIMAL(38,0), DuckDB HUGEINT, both exact — and the
  // double arithmetic happens ONCE on identical integer inputs, making
  // sqrt/divide bit-deterministic. The moment sums are ordinary partial+
  // final hash aggregates, so the operator scales exactly like sum().
  private val q108 = GQuery(
    "q108_stats_moments",
    "exact stddev + correlation via integer moment sums",
    (s, d) => {
      Tables.register(s, d, "lineitem")
      s.sql("""SELECT l_returnflag,
              |  round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              |             / (CAST(n AS DOUBLE) * (n - 1))) / 100, 4) AS sd_price,
              |  round(CAST(n * sxy - sx * sy AS DOUBLE)
              |        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              |           * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_price_qty
              |FROM (
              |  SELECT l_returnflag,
              |         CAST(count(*) AS DECIMAL(38,0)) AS n,
              |         sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sx,
              |         sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
              |             * CAST(floor(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sxx,
              |         sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sy,
              |         sum(CAST(CAST(l_quantity AS BIGINT)
              |             * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS syy,
              |         sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
              |             * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sxy
              |  FROM lineitem GROUP BY l_returnflag)
              |ORDER BY l_returnflag""".stripMargin)
    },
    Some("""SELECT l_returnflag,
                   round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              / (CAST(n AS DOUBLE) * (n - 1))) / 100, 4) AS sd_price,
                   round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_price_qty
            FROM (
              SELECT l_returnflag,
                     count(*) AS n,
                     sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sx,
                     sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sxx,
                     sum(CAST(l_quantity AS BIGINT)) AS sy,
                     sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS syy,
                     sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         * CAST(l_quantity AS BIGINT)) AS sxy
              FROM lineitem GROUP BY l_returnflag)
            ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- q109
  // Conditional / boolean aggregates: count_if, bool_and, bool_or,
  // max_by — the quality-flag rollup shape. All exact (integers and
  // booleans), all ordinary hash aggregates. max_by's tie risk is pinned
  // by maximizing over a UNIQUE key (orderkey).
  private val q109Sql =
    """SELECT o_orderpriority,
      |       CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
      |       bool_and(o_totalprice > 1000) AS all_over_1k,
      |       bool_or(o_orderstatus = 'F') AS any_final,
      |       max_by(o_orderkey, o_orderkey) AS max_key
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
  private val q109 = GQuery(
    "q109_conditional_aggs",
    "count_if / bool_and / bool_or / max_by conditional aggregates",
    (s, d) => { Tables.register(s, d, "orders"); s.sql(q109Sql) },
    Some(q109Sql))

  // --------------------------------------------------------------- q110
  // Time-series resample + forward fill: per-user daily grid from the
  // user's own [first, last] active day (sequence + explode — map-side
  // off the tiny per-user span summary), left join of observed daily
  // totals onto the grid, then last_value IGNORE NULLS forward-fills
  // gaps. Everything keys on user_id (+day), so the shuffles are the
  // daily rollup and the per-user span/window — no all-pairs work — and
  // grids are bounded per user by their own activity span (a decade-long
  // span is ~4k rows, never a cross-join blowup). Integer cents keep the
  // filled values exact.
  private val q110 = GQuery(
    "q110_resample_ffill",
    "per-user daily resample (sequence/explode grid) + forward fill",
    (s, d) => {
      import s.implicits._
      val daily = T(s, d, "events")
        .filter($"user_id" <= 200)
        .groupBy($"user_id",
          expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
        .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
      val grid = daily.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id", explode(expr("sequence(d0, d1)")).as("day"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("cents_ffill", last($"cents", ignoreNulls = true).over(w))
        .select($"user_id", $"day", $"cents_ffill")
        .orderBy($"user_id", $"day")
    },
    Some("""WITH daily AS (
              SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM events WHERE user_id <= 200
              GROUP BY user_id, day),
            grid AS (
              SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
              FROM daily GROUP BY user_id)
            SELECT g.user_id, g.day,
                   last_value(d.cents IGNORE NULLS) OVER (
                     PARTITION BY g.user_id ORDER BY g.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ffill
            FROM grid g LEFT JOIN daily d
              ON g.user_id = d.user_id AND g.day = d.day
            ORDER BY g.user_id, g.day"""))

  // --------------------------------------------------------------- q111
  // Multiset (bag-semantics) set operations: INTERSECT ALL keeps the
  // minimum multiplicity per value, EXCEPT ALL subtracts multiplicities —
  // q16 covers only the DISTINCT forms. Spark plans both as a single
  // hash aggregate over tagged counts (no sort), sharing one shuffle on
  // the value key — scale-safe at any cardinality.
  private val q111 = GQuery(
    "q111_multiset_ops",
    "INTERSECT ALL / EXCEPT ALL multiset set operations",
    (s, d) => {
      import s.implicits._
      val a = T(s, d, "orders").filter($"o_totalprice" > 200000)
        .select($"o_custkey".as("k"))
      val b = T(s, d, "orders").filter($"o_orderstatus" === "F")
        .select($"o_custkey".as("k"))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
        .orderBy($"op", $"k")
    },
    Some("""WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000),
                 b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
            SELECT k, 'intersect_all' AS op FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
            UNION ALL
            SELECT k, 'except_all' AS op FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
            ORDER BY op, k"""))

  // --------------------------------------------------------------- q112
  // Gaps-and-islands: maximal runs of consecutive active days per user via
  // the classic day − row_number() group key. One shuffle on user_id
  // (distinct + window + final group all share it); island state is a
  // constant per row, so the window is a single pass — no self-join, no
  // recursion, scale-safe for arbitrarily long histories.
  private val q112 = GQuery(
    "q112_gaps_islands",
    "gaps-and-islands: maximal consecutive-day activity runs per user",
    (s, d) => {
      import s.implicits._
      val days = T(s, d, "events")
        .filter($"user_id" <= 300)
        .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      days.withColumn("grp", $"day" - row_number().over(w))
        .groupBy($"user_id", $"grp")
        .agg(min($"day").as("start_day"), max($"day").as("end_day"),
          count(lit(1)).as("len"))
        .filter($"len" >= 2)
        .select($"user_id", $"start_day", $"end_day", $"len")
        .orderBy($"user_id", $"start_day")
    },
    Some("""WITH days AS (
              SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
              FROM events WHERE user_id <= 300),
            marked AS (
              SELECT user_id, day,
                     day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
              FROM days)
            SELECT user_id, min(day) AS start_day, max(day) AS end_day,
                   CAST(count(*) AS BIGINT) AS len
            FROM marked GROUP BY user_id, grp
            HAVING count(*) >= 2
            ORDER BY user_id, start_day"""))

  // --------------------------------------------------------------- q113
  // Bitwise aggregates: BIT_AND / BIT_OR / BIT_XOR — order-insensitive,
  // so they combine map-side like any commutative hash aggregate (XOR
  // over a unique key column doubles as an order-free set digest, the
  // trick reconciliation pipelines use to diff table contents cheaply).
  private val q113Sql =
    """SELECT l_returnflag,
      |       bit_and(CAST(l_quantity AS BIGINT)) AS qty_and,
      |       bit_or(CAST(l_quantity AS BIGINT)) AS qty_or,
      |       bit_xor(CAST(l_quantity AS BIGINT)) AS qty_xor,
      |       bit_xor(l_orderkey) AS key_xor
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
  private val q113 = GQuery(
    "q113_bitwise_aggs",
    "BIT_AND / BIT_OR / BIT_XOR aggregates (order-free set digest)",
    (s, d) => { Tables.register(s, d, "lineitem"); s.sql(q113Sql) },
    Some(q113Sql))

  // --------------------------------------------------------------- q114
  // Window navigation battery: FIRST_VALUE ... IGNORE NULLS (first
  // non-open price per customer), NTH_VALUE over the full frame, and
  // LEAD with an explicit offset + default. One window partition keyed
  // on o_custkey — single shuffle, bounded per-customer frames.
  private val q114 = GQuery(
    "q114_window_navigation",
    "first_value IGNORE NULLS / nth_value / lead(offset, default) windows",
    (s, d) => {
      import s.implicits._
      val t = T(s, d, "orders").filter($"o_custkey" <= 500)
        .withColumn("closed_price",
          when($"o_orderstatus" === "O", lit(null)).otherwise($"o_totalprice"))
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wLead = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t.select($"o_custkey", $"o_orderkey",
          first($"closed_price", ignoreNulls = true).over(w).as("first_closed"),
          nth_value($"o_totalprice", 2).over(w).as("second_price"),
          lead($"o_totalprice", 2, -1.0).over(wLead).as("lead2_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""WITH t AS (
              SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                     CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS closed_price
              FROM orders WHERE o_custkey <= 500)
            SELECT o_custkey, o_orderkey,
                   first_value(closed_price IGNORE NULLS) OVER w AS first_closed,
                   nth_value(o_totalprice, 2) OVER w AS second_price,
                   lead(o_totalprice, 2, -1.0) OVER w AS lead2_price
            FROM t
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_custkey, o_orderkey"""))

  // --------------------------------------------------------------- q115
  // CDC latest-record upsert (SCD-1 merge analog): keep only the newest
  // version per key by (event time, tiebreak key) — the batch equivalent
  // of MERGE INTO ... WHEN MATCHED UPDATE. row_number over a per-key
  // window, one shuffle on the merge key; AQE handles hot keys. The
  // deterministic tiebreak (orderkey desc) makes replays idempotent.
  private val q115 = GQuery(
    "q115_upsert_latest",
    "CDC latest-record dedup (SCD-1 upsert): newest row per key",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey".as("latest_key"),
          $"o_orderdate".as("latest_date"), $"o_totalprice".as("latest_price"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey AS latest_key, o_orderdate AS latest_date,
                   o_totalprice AS latest_price
            FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
            ORDER BY o_custkey"""))

  // --------------------------------------------------------------- q120
  // Schema-aligned union (UNION BY NAME): columns match by NAME, not
  // position, and columns missing from one side null-fill — the shape
  // every multi-source ingest union needs (position-based UNION silently
  // misaligns). Pure map-side concatenation: no shuffle beyond the
  // final presentation sort.
  private val q120 = GQuery(
    "q120_union_by_name",
    "unionByName with allowMissingColumns (null-filled schema alignment)",
    (s, d) => {
      import s.implicits._
      val a = T(s, d, "nation")
        .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"))
      val b = T(s, d, "supplier").filter($"s_suppkey" <= 50)
        .select(($"s_suppkey" + 1000).cast("long").as("k"), $"s_acctbal".as("bal"))
      a.unionByName(b, allowMissingColumns = true)
        .select($"k", $"name", $"bal")
        .orderBy($"k")
    },
    Some("""WITH a AS (SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name FROM nation),
                 b AS (SELECT CAST(s_suppkey + 1000 AS BIGINT) AS k, s_acctbal AS bal
                       FROM supplier WHERE s_suppkey <= 50)
            SELECT k, name, bal FROM (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
            ORDER BY k"""))

  // --------------------------------------------------------------- q122
  // Deterministic per-group MODE: the built-in mode() is tie-nondeterministic
  // in both engines, so the gate computes it as count + row_number with an
  // explicit total order (count desc, value asc) — the only mode a
  // reproducible pipeline should ship. Two shuffles: the (group, value)
  // count (map-side partial combine) and the per-group window over the
  // already-tiny count table. Scale-safe at any cardinality: the window
  // partitions on the group key and its input is one row per distinct
  // value, not per source row.
  private val q122 = GQuery(
    "q122_mode_per_group",
    "deterministic per-group mode (count + tie-broken row_number)",
    (s, d) => {
      import s.implicits._
      val c = T(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_quantity".cast("long").as("qty"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"l_returnflag").orderBy($"n".desc, $"qty")
      c.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"l_returnflag", $"qty".as("mode_qty"), $"n".as("mode_count"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH c AS (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                     CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY 1, 2)
            SELECT l_returnflag, qty AS mode_qty, n AS mode_count
            FROM c
            QUALIFY row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY n DESC, qty) = 1
            ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- q123
  // Equi-width histogram over a fixed domain: bucket = clamped integer
  // floor-division — pure map work, then a 12-key hash aggregate with
  // map-side combine, so the shuffle moves 12 rows per task no matter the
  // input size. (Spark's width_bucket exists, but explicit arithmetic is
  // engine-portable and keeps the bucket math auditable.)
  private val q123Sql =
    """SELECT bucket,
      |       CAST(bucket * 50000 AS BIGINT) AS lo,
      |       CAST((bucket + 1) * 50000 AS BIGINT) AS hi,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(min(o_totalprice), 2) AS min_price,
      |       round(max(o_totalprice), 2) AS max_price
      |FROM (SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 11) AS bucket,
      |             o_totalprice
      |      FROM orders) t
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin
  private val q123 = GQuery(
    "q123_histogram_equiwidth",
    "equi-width histogram via clamped integer bucketing (12 buckets)",
    (s, d) => { Tables.register(s, d, "orders"); s.sql(q123Sql) },
    Some(q123Sql))

  // --------------------------------------------------------------- q124
  // Interval-overlap join (interval × interval), chunk-bucketed: the naive
  // plan is a theta join (a.s < b.e AND b.s < a.e) — BroadcastNestedLoop
  // or a full cross product, quadratic at scale. Instead each interval
  // explodes onto the fixed-width time chunks it covers (≤ 2 chunks here:
  // interval length ≤ 7 days, chunk width 7 days) and the join becomes an
  // EQUI-join on the chunk key + residual overlap predicate — one hash
  // shuffle each side, per-chunk work bounded by temporal density, never
  // by corpus size. distinct() collapses pairs that meet in two chunks.
  // This is the standard range-bucketing trick (same family as the as-of
  // join's day buckets, q08).
  private val q124 = GQuery(
    "q124_interval_overlap_join",
    "interval-overlap join via time-chunk bucketing (equi-join, not theta)",
    (s, d) => {
      import s.implicits._
      def ivals(f: DataFrame => DataFrame, key: String): DataFrame =
        f(T(s, d, "orders"))
          .select($"o_orderkey".as(key),
            expr("unix_micros(o_orderdate) div 86400000000").as("s"),
            (expr("unix_micros(o_orderdate) div 86400000000") +
              ($"o_orderkey" % 7) + lit(1)).as("e"))
      val a = ivals(_.filter($"o_custkey" <= 150), "a_key")
        .withColumn("chunk", explode(expr("sequence(s div 7, (e - 1) div 7)")))
        .select($"a_key", $"s".as("a_s"), $"e".as("a_e"), $"chunk")
      val b = ivals(_.filter($"o_custkey" > 150 && $"o_custkey" <= 300 &&
          $"o_orderstatus" === "F"), "b_key")
        .withColumn("chunk", explode(expr("sequence(s div 7, (e - 1) div 7)")))
        .select($"b_key", $"s".as("b_s"), $"e".as("b_e"), $"chunk")
      a.join(b, a("chunk") === b("chunk") &&
          a("a_s") < b("b_e") && b("b_s") < a("a_e"))
        .select($"a_key", $"b_key",
          (least($"a_e", $"b_e") - greatest($"a_s", $"b_s")).as("overlap_days"))
        .distinct()
        .orderBy($"a_key", $"b_key")
    },
    Some("""WITH a AS (
              SELECT o_orderkey AS a_key,
                     CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS s,
                     CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
                       + o_orderkey % 7 + 1 AS e
              FROM orders WHERE o_custkey <= 150),
            b AS (
              SELECT o_orderkey AS b_key,
                     CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS s,
                     CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
                       + o_orderkey % 7 + 1 AS e
              FROM orders
              WHERE o_custkey > 150 AND o_custkey <= 300 AND o_orderstatus = 'F')
            SELECT a.a_key, b.b_key,
                   least(a.e, b.e) - greatest(a.s, b.s) AS overlap_days
            FROM a JOIN b ON a.s < b.e AND b.s < a.e
            ORDER BY a_key, b_key"""))

  // --------------------------------------------------------------- q127
  // Graph analytics: triangle counting on the co-purchase graph (parts
  // appearing in the same order). Edges orient low→high id so each
  // triangle is counted exactly once; the wedge join (e1.b = e2.a) then
  // closes against e3 — two hash-shuffle joins on vertex keys, no
  // enumeration beyond wedges. Per-order pair generation is bounded by
  // order size (≤ 7 lines), so the map stage never goes quadratic in the
  // corpus. At 100 TB the standard refinement is degree-based orientation
  // (orient toward the higher-degree endpoint) to bound wedge counts on
  // hub vertices; id-orientation is kept here because the oracle must
  // reproduce it exactly.
  private val q127 = GQuery(
    "q127_triangle_count",
    "triangle counting via oriented wedge join (co-purchase graph)",
    (s, d) => {
      import s.implicits._
      val li = T(s, d, "lineitem").filter($"l_partkey" <= 300)
        .select($"l_orderkey", $"l_partkey").distinct()
      val e = li.as("x").join(li.as("y"),
          $"x.l_orderkey" === $"y.l_orderkey" && $"x.l_partkey" < $"y.l_partkey")
        .select($"x.l_partkey".as("a"), $"y.l_partkey".as("b")).distinct()
      val tri = e.as("e1")
        .join(e.as("e2"), $"e1.b" === $"e2.a")
        .join(e.as("e3"), $"e1.a" === $"e3.a" && $"e2.b" === $"e3.b")
        .agg(count(lit(1)).as("n_triangles"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(tri) // two 1-row sides
    },
    Some("""WITH li AS (
              SELECT DISTINCT l_orderkey, l_partkey
              FROM lineitem WHERE l_partkey <= 300),
            e AS (
              SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM li x JOIN li y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(count(*) AS BIGINT)
                    FROM e e1
                    JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles"""))

  // --------------------------------------------------------------- q128
  // Iterative graph computation: 3 PageRank iterations in EXACT integer
  // arithmetic (rank scaled by 1e12, floor division everywhere) so the
  // result is bit-deterministic and oracle-checkable — float PageRank can
  // never hash-match across engines. Damping 0.85 = 17/20 in integers;
  // dangling mass is dropped (the standard simplification). Each round is
  // one join-aggregate keyed on vertex ids; at real scale the loop
  // checkpoints per round exactly like connectedComponents
  // (TrainingData.scala) to truncate lineage — 3 bounded rounds here.
  // N (one scalar) is computed once driver-side, as any production job
  // would.
  private val q128 = GQuery(
    "q128_pagerank_integer",
    "fixed-iteration PageRank in exact integer arithmetic (top 10)",
    (s, d) => {
      import s.implicits._
      val e = T(s, d, "lineitem")
        .select(($"l_suppkey" % 50).as("src"), ($"l_partkey" % 50).as("dst"))
        .filter($"src" =!= $"dst").distinct()
      val nodes = e.select($"src".as("id")).union(e.select($"dst".as("id")))
        .distinct()
      val deg = e.groupBy($"src").agg(count(lit(1)).as("od"))
      val n = nodes.count()
      var r = nodes.select($"id", lit(1000000000000L / n).as("r"))
      for (_ <- 1 to 3) {
        val contrib = e.join(r, e("src") === r("id")).join(deg, "src")
          .select($"dst".as("id"), expr("r div od").as("c"))
          .groupBy($"id").agg(sum($"c").as("c"))
        r = nodes.join(contrib, Seq("id"), "left")
          .select($"id",
            (lit(150000000000L / n) +
              expr("(17 * coalesce(c, CAST(0 AS BIGINT))) div 20")).as("r"))
      }
      r.select($"id", $"r".as("rank_scaled"))
        .orderBy($"rank_scaled".desc, $"id").limit(10)
    },
    Some("""WITH e AS (
              SELECT DISTINCT l_suppkey % 50 AS src, l_partkey % 50 AS dst
              FROM lineitem WHERE l_suppkey % 50 <> l_partkey % 50),
            nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
            p AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
            deg AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY src),
            r0 AS (SELECT id, 1000000000000 // (SELECT n FROM p) AS r FROM nodes),
            c1 AS (SELECT e.dst AS id, CAST(sum(r0.r // deg.od) AS BIGINT) AS c
                   FROM e JOIN r0 ON r0.id = e.src JOIN deg ON deg.src = e.src
                   GROUP BY e.dst),
            r1 AS (SELECT nodes.id, 150000000000 // (SELECT n FROM p)
                          + (17 * coalesce(c1.c, 0)) // 20 AS r
                   FROM nodes LEFT JOIN c1 ON c1.id = nodes.id),
            c2 AS (SELECT e.dst AS id, CAST(sum(r1.r // deg.od) AS BIGINT) AS c
                   FROM e JOIN r1 ON r1.id = e.src JOIN deg ON deg.src = e.src
                   GROUP BY e.dst),
            r2 AS (SELECT nodes.id, 150000000000 // (SELECT n FROM p)
                          + (17 * coalesce(c2.c, 0)) // 20 AS r
                   FROM nodes LEFT JOIN c2 ON c2.id = nodes.id),
            c3 AS (SELECT e.dst AS id, CAST(sum(r2.r // deg.od) AS BIGINT) AS c
                   FROM e JOIN r2 ON r2.id = e.src JOIN deg ON deg.src = e.src
                   GROUP BY e.dst),
            r3 AS (SELECT nodes.id, 150000000000 // (SELECT n FROM p)
                          + (17 * coalesce(c3.c, 0)) // 20 AS r
                   FROM nodes LEFT JOIN c3 ON c3.id = nodes.id)
            SELECT CAST(id AS BIGINT) AS id, CAST(r AS BIGINT) AS rank_scaled
            FROM r3 ORDER BY rank_scaled DESC, id LIMIT 10"""))

  // --------------------------------------------------------------- q129
  // Incremental aggregate maintenance (materialized-view merge): the base
  // period's PRE-AGGREGATED summary merges with the delta period's
  // summary by re-aggregating the union — valid because count/sum are
  // mergeable partial aggregates (the same algebra Spark's partial+final
  // hash aggregation uses inside one query). This is the 100 TB shape for
  // daily rollups: never recompute history, aggregate the new partition
  // and merge. The gate proves merge == full recompute via the oracle.
  private val q129 = GQuery(
    "q129_incremental_agg_merge",
    "incremental materialized-view maintenance: base ⊎ delta pre-aggregates == full recompute",
    (s, d) => {
      import s.implicits._
      val orders = T(s, d, "orders")
      val cut = lit("1997-01-01").cast("timestamp")
      def summarize(df: DataFrame): DataFrame =
        df.groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
      summarize(orders.filter($"o_orderdate" < cut))
        .unionByName(summarize(orders.filter($"o_orderdate" >= cut)))
        .groupBy($"o_orderpriority")
        .agg(sum($"n").as("n_orders"), sum($"cents").as("sum_cents"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM orders
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  // --------------------------------------------------------------- q131
  // Winsorization (percentile capping): per-group exact p05/p95 bounds
  // over integer cents (q106's cross-engine-exact ordered-set path), then
  // values clip to the bounds. Two passes — the bounds table is one row
  // per group and broadcasts back onto the stream — the standard shape
  // for outlier-robust feature pipelines at scale (approx_percentile
  // substitutes for the bounds pass when exactness isn't required).
  private val q131 = GQuery(
    "q131_winsorize",
    "winsorization: exact p05/p95 percentile capping per group",
    (s, d) => {
      // Round 17 (optimization): bounds AND clip statistics both come out
      // of the same (flag, cents) count buckets — one parallel aggregate
      // over the raw rows replaces the native multiset percentile AND the
      // whole second pass (the bounds join re-scanned every row; weighted
      // sums over the bucket table are identical by distributivity).
      import s.implicits._
      val cc = withCumCounts(centsCounts(s, d), "l_returnflag", "c")
        .withColumn("__lo", percentileDiscCol("l_returnflag", "c", 0.05))
        .withColumn("__hi", percentileDiscCol("l_returnflag", "c", 0.95))
      cc.groupBy($"l_returnflag")
        .agg(min($"__lo").as("lo_cents"),
          min($"__hi").as("hi_cents"),
          // coalesce pins count_if's non-nullable output schema
          coalesce(sum(when($"c" < $"__lo", $"cnt")), lit(0L)).as("n_clipped_lo"),
          coalesce(sum(when($"c" > $"__hi", $"cnt")), lit(0L)).as("n_clipped_hi"),
          sum(least(greatest($"c", $"__lo"), $"__hi") * $"cnt").as("sum_wins_cents"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH b AS (
              SELECT l_returnflag,
                CAST(quantile_disc(CAST(floor(l_extendedprice * 100) AS BIGINT), 0.05) AS BIGINT) AS lo,
                CAST(quantile_disc(CAST(floor(l_extendedprice * 100) AS BIGINT), 0.95) AS BIGINT) AS hi
              FROM lineitem GROUP BY l_returnflag)
            SELECT l.l_returnflag, b.lo AS lo_cents, b.hi AS hi_cents,
                   CAST(count_if(l.c < b.lo) AS BIGINT) AS n_clipped_lo,
                   CAST(count_if(l.c > b.hi) AS BIGINT) AS n_clipped_hi,
                   CAST(sum(least(greatest(l.c, b.lo), b.hi)) AS BIGINT) AS sum_wins_cents
            FROM (SELECT l_returnflag, CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
                  FROM lineitem) l
            JOIN b ON b.l_returnflag = l.l_returnflag
            GROUP BY l.l_returnflag, b.lo, b.hi
            ORDER BY l.l_returnflag"""))

  // --------------------------------------------------------------- q132
  // Markov transition matrix over per-user event sequences: lead() pairs
  // each event with its successor inside the user's timeline, then one
  // hash aggregate counts the (state → next) matrix. One shuffle on
  // user_id for the window (per-user frames are bounded by that user's
  // history; a hot user would pre-split by (user, day) exactly like the
  // as-of join), one map-side-combined aggregate on the 25-cell matrix.
  // The (ts, event_id) sort key is a total order, so successor choice is
  // deterministic in both engines.
  private val q132 = GQuery(
    "q132_markov_transitions",
    "event-sequence Markov transition counts (lead window + matrix aggregate)",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T(s, d, "events").filter($"user_id" <= 500)
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type", $"next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type", $"next_type")
    },
    Some("""WITH seq AS (
              SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS next_type
              FROM events WHERE user_id <= 500)
            SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
            ORDER BY event_type, next_type"""))

  // --------------------------------------------------------------- q133
  // Ordered funnel (view → click-after-view → purchase-after-click): each
  // stage is a keyed min-timestamp aggregate joined to the previous
  // stage's frontier with a strict time predicate. Every join is an
  // equi-join on user_id — all three stages share the same shuffle key,
  // so at scale this is one partitioning reused down the chain (funnel
  // depth adds stages, not shuffle width). The chained-join form beats a
  // per-user collect_list sort at 100 TB: no per-user memory, no skew
  // beyond what AQE already handles.
  private val q133 = GQuery(
    "q133_funnel_stages",
    "ordered event funnel: stage frontiers via keyed min-after joins",
    (s, d) => {
      import s.implicits._
      val e = T(s, d, "events").select($"user_id", $"event_type", $"ts")
      val v = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val c = e.filter($"event_type" === "click").as("e")
        .join(v, Seq("user_id")).filter($"ts" > $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val p = e.filter($"event_type" === "purchase").as("e")
        .join(c, Seq("user_id")).filter($"ts" > $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
                 c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                       JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
                       WHERE e.event_type = 'click' GROUP BY e.user_id),
                 p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                       JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
                       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
                   (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
                   (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_view_click_purchase"""))

  // --------------------------------------------------------------- q134
  // Median absolute deviation (the robust dispersion stat): median over
  // integer cents, then median of |x − med| — two exact ordered-set
  // passes, bounds broadcast between them (q131's winsorize shape).
  // Exactness across engines: median of BIGINT is .0/.5-exact in DOUBLE,
  // |c − med| stays exactly representable, and the second median picks
  // from those exact values.
  private val q134 = GQuery(
    "q134_mad_robust",
    "median absolute deviation via two exact ordered-set passes",
    (s, d) => {
      // Round 17 (optimization): both medians come out of count buckets —
      // the raw rows are aggregated ONCE to (flag, cents, cnt); the
      // deviation pass regroups that tiny table to (flag, |c − med|, Σcnt)
      // and applies the same cumulative-window median. The original's
      // second full scan + join of every row against the bounds — and both
      // ObjectHashAggregate multisets — disappear.
      import s.implicits._
      val cc1 = withCumCounts(centsCounts(s, d), "l_returnflag", "c")
        .withColumn("__med", medianCol("l_returnflag", "c"))
      val dev = cc1
        .select($"l_returnflag", $"__med".as("med"),
          abs($"c" - $"__med").as("dv"), $"cnt")
        .groupBy($"l_returnflag", $"med", $"dv")
        .agg(sum($"cnt").as("cnt"))
      val cc2 = withCumCounts(dev, "l_returnflag", "dv")
        .withColumn("__mad", medianCol("l_returnflag", "dv"))
      cc2.groupBy($"l_returnflag")
        .agg(min($"med").as("median_cents"), min($"__mad").as("mad_cents"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH m AS (
              SELECT l_returnflag,
                     CAST(median(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS med
              FROM lineitem GROUP BY l_returnflag)
            SELECT l.l_returnflag, m.med AS median_cents,
                   CAST(median(abs(CAST(floor(l.l_extendedprice * 100) AS BIGINT) - m.med)) AS DOUBLE) AS mad_cents
            FROM lineitem l JOIN m ON m.l_returnflag = l.l_returnflag
            GROUP BY l.l_returnflag, m.med
            ORDER BY l.l_returnflag"""))

  // --------------------------------------------------------------- q143
  // SCD-2 validity-interval reconstruction: a change stream becomes
  // [valid_from, valid_to) dimension history — each version's end is the
  // NEXT version's start (lead over the per-key timeline), the newest
  // version stays open (null end, flagged is_current). One window shuffle
  // on the dimension key; the complement of q115's SCD-1 latest-only
  // upsert. The presentation sort keys on (key, valid_from, version key)
  // — a total order with no nulls (valid_to's nulls stay OUT of the sort,
  // DuckDB sorts NULLS LAST vs Spark's NULLS FIRST).
  private val q143 = GQuery(
    "q143_scd2_intervals",
    "SCD-2 history build: change stream → [valid_from, valid_to) intervals + current flag",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      T(s, d, "orders").filter($"o_custkey" <= 300)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("valid_to", lead($"o_orderdate", 1).over(w))
        .select($"o_custkey", $"o_orderkey",
          $"o_orderdate".as("valid_from"), $"valid_to",
          $"valid_to".isNull.as("is_current"), $"o_totalprice".as("price"))
        .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
                   lead(o_orderdate) OVER w AS valid_to,
                   lead(o_orderdate) OVER w IS NULL AS is_current,
                   o_totalprice AS price
            FROM orders
            WHERE o_custkey <= 300
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, valid_from, o_orderkey"""))

  // ---------------------------------------------------------------- q146
  // Full three-action MERGE INTO (the lakehouse upsert statement): a
  // change set with update/delete/insert ops applied to a base snapshot —
  // WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE /
  // WHEN NOT MATCHED AND op<>'D' THEN INSERT. Complements q115 (SCD-1
  // latest-record upsert) and q143 (SCD-2 history). One full-outer
  // shuffle join on the merge key — at 100 TB this is the canonical
  // MERGE plan (both sides hash-partitioned on key; AQE handles skew),
  // with no driver-side state.
  private val q146 = GQuery(
    "q146_merge_into",
    "MERGE INTO: matched-update / matched-delete / not-matched-insert in one pass",
    (s, d) => {
      import s.implicits._
      val orders = T(s, d, "orders")
      val base = orders.filter($"o_orderkey" % 5 =!= 0)
        .select($"o_orderkey", $"o_totalprice".as("price"), $"o_orderstatus".as("status"))
      val chg = orders.filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey",
          when($"o_orderkey" % 2 === 0, "D").otherwise("U").as("op"),
          ($"o_totalprice" + 1000.0).as("new_price"))
      base.join(chg, Seq("o_orderkey"), "full_outer")
        .filter($"op".isNull || $"op" =!= "D") // matched-delete AND insert-of-delete both drop
        .select($"o_orderkey",
          when($"op".isNull, $"price").otherwise($"new_price").as("price"),
          when($"op".isNull, $"status")
            .when($"price".isNull, "I").otherwise("U").as("status"))
        .filter($"o_orderkey" <= 3000)
        .orderBy($"o_orderkey")
    },
    Some("""WITH base AS (
              SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status
              FROM orders WHERE o_orderkey % 5 <> 0),
            chg AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 2 = 0 THEN 'D' ELSE 'U' END AS op,
                     o_totalprice + 1000.0 AS new_price
              FROM orders WHERE o_orderkey % 3 = 0)
            SELECT o_orderkey,
                   CASE WHEN op IS NULL THEN price ELSE new_price END AS price,
                   CASE WHEN op IS NULL THEN status
                        WHEN price IS NULL THEN 'I' ELSE 'U' END AS status
            FROM base FULL OUTER JOIN chg USING (o_orderkey)
            WHERE (op IS NULL OR op <> 'D') AND o_orderkey <= 3000
            ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q147
  // Recursive hierarchy traversal (WITH RECURSIVE analog): label every
  // node of a forest with its root and depth by iterative frontier
  // propagation — the org-chart / BOM-explosion shape. The forest is
  // derived deterministically from part (parent = key div 10; keys < 10
  // are roots) so the DuckDB oracle can rebuild it with WITH RECURSIVE.
  // Scale: each round joins ONLY the previous frontier against the node
  // table (never the accumulated result), localCheckpoint truncates
  // lineage per round, and rounds = tree depth (log10 of the key space),
  // with a loud guard against runaway depth. Money sums ride as exact
  // integer cents (the q108 idiom).
  private val q147 = GQuery(
    "q147_recursive_hierarchy",
    "recursive hierarchy: root/depth labeling by frontier propagation",
    (s, d) => {
      import s.implicits._
      val nodes = T(s, d, "part")
        .select($"p_partkey".as("node"),
          expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val roots = nodes.filter($"node" < 10)
        .select($"node", $"node".as("root"), lit(0).as("depth"), $"cents")
      val children = nodes.filter($"node" >= 10)
      var labeled = roots
      var frontier = roots
      var rounds = 0
      var done = false
      while (!done) {
        rounds += 1
        require(rounds <= 30, s"hierarchy depth exceeded 30 rounds — cycle?")
        val next = children
          .join(frontier.select($"node".as("parent"), $"root", $"depth"),
            expr("node div 10") === $"parent")
          .select($"node", $"root", ($"depth" + 1).as("depth"), $"cents")
          .localCheckpoint()
        if (next.isEmpty) done = true
        else { labeled = labeled.union(next); frontier = next }
      }
      labeled.groupBy($"root", $"depth")
        .agg(count(lit(1)).as("n"),
          (sum($"cents").cast("double") / 100.0).as("subtotal"))
        .orderBy($"root", $"depth")
    },
    Some("""WITH RECURSIVE r AS (
              SELECT p_partkey AS node, p_partkey AS root, 0 AS depth,
                     CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
              FROM part WHERE p_partkey < 10
              UNION ALL
              SELECT p.p_partkey, r.root, r.depth + 1,
                     CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
              FROM part p JOIN r ON p.p_partkey // 10 = r.node
              WHERE p.p_partkey >= 10)
            SELECT root, CAST(depth AS INTEGER) AS depth,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS DOUBLE) / 100.0 AS subtotal
            FROM r GROUP BY root, depth ORDER BY root, depth"""))

  // ---------------------------------------------------------------- q148
  // Deterministic per-group reservoir sample: k survivors per group,
  // chosen by hash rank (md5 of the key) — the engine-portable draw that
  // any re-run, any engine, any partitioning reproduces bit-for-bit.
  // This is the grouped counterpart of TrainingData.sampleDeterministic
  // (q73): map-side hash, one bounded per-group window — no global sort,
  // no RNG state, scale-safe at any group cardinality.
  private val q148 = GQuery(
    "q148_grouped_reservoir",
    "deterministic per-group reservoir sample by hash rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      T(s, d, "documents").select($"doc_id", $"lang")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .orderBy($"lang", $"rk")
    },
    Some("""SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk
            FROM (SELECT doc_id, lang,
                         row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                  FROM documents)
            WHERE rk <= 3 ORDER BY lang, rk"""))

  // ---------------------------------------------------------------- q149
  // Per-group OLS regression (price ~ quantity): slope / intercept from
  // exact integer moment sums — the q108 idiom extended to the regression
  // lane. Both engines evaluate the IDENTICAL closed-form expression over
  // identical integer moments, so the doubles agree to the bit before
  // rounding. One partial+final aggregation; map-side combine keeps the
  // shuffle at |groups| rows.
  private val q149 = GQuery(
    "q149_ols_regression",
    "per-group OLS slope/intercept via exact integer moments",
    (s, d) => {
      Tables.register(s, d, "lineitem")
      s.sql("""SELECT l_returnflag,
              |  round(CAST(n * sxy - sx * sy AS DOUBLE)
              |        / CAST(n * sxx - sx * sx AS DOUBLE) / 100, 6) AS slope,
              |  round((CAST(sy AS DOUBLE)
              |         - CAST(n * sxy - sx * sy AS DOUBLE)
              |           / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |        / CAST(n AS DOUBLE) / 100, 4) AS intercept
              |FROM (
              |  SELECT l_returnflag,
              |         CAST(count(*) AS DECIMAL(38,0)) AS n,
              |         sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sx,
              |         sum(CAST(CAST(l_quantity AS BIGINT)
              |             * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sxx,
              |         sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sy,
              |         sum(CAST(CAST(l_quantity AS BIGINT)
              |             * CAST(floor(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sxy
              |  FROM lineitem GROUP BY l_returnflag)
              |ORDER BY l_returnflag""".stripMargin)
    },
    Some("""SELECT l_returnflag,
                   round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE) / 100, 6) AS slope,
                   round((CAST(sy AS DOUBLE)
                          - CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE) / 100, 4) AS intercept
            FROM (
              SELECT l_returnflag,
                     count(*) AS n,
                     sum(CAST(l_quantity AS BIGINT)) AS sx,
                     sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                     sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sy,
                     sum(CAST(l_quantity AS BIGINT)
                         * CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sxy
              FROM lineitem GROUP BY l_returnflag)
            ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- q153
  // Exponentially-weighted smoothing in EXACT integer arithmetic: the
  // time-series denoising pass (trend extraction, anomaly baselines)
  // with dyadic weights 16/8/4/2 over the last four observations, so the
  // weighted sum stays a BIGINT — no double accumulation, no cross-engine
  // summation-order risk. One window shuffle on user_id with a bounded
  // 4-lag frame; scales exactly like lag().
  private val q153 = GQuery(
    "q153_ewma_smooth",
    "dyadic-weight EWMA smoothing in exact integer arithmetic (bounded lags)",
    (s, d) => {
      Tables.register(s, d, "events")
      s.sql("""SELECT event_id, user_id,
              |       16 * cents
              |       + 8 * coalesce(lag(cents, 1) OVER w, 0)
              |       + 4 * coalesce(lag(cents, 2) OVER w, 0)
              |       + 2 * coalesce(lag(cents, 3) OVER w, 0) AS smooth_x16
              |FROM (SELECT event_id, user_id, ts,
              |             CAST(floor(value * 100) AS BIGINT) AS cents
              |      FROM events WHERE event_type = 'purchase')
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              |ORDER BY user_id, ts, event_id""".stripMargin)
    },
    Some("""SELECT event_id, user_id,
                   16 * cents
                   + 8 * coalesce(lag(cents, 1) OVER w, 0)
                   + 4 * coalesce(lag(cents, 2) OVER w, 0)
                   + 2 * coalesce(lag(cents, 3) OVER w, 0) AS smooth_x16
            FROM (SELECT event_id, user_id, ts,
                         CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM events WHERE event_type = 'purchase')
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, ts, event_id"""))

  // --------------------------------------------------------------- q155
  // Forward as-of join with a bounded tolerance (the attribution shape:
  // each click finds the FIRST purchase by the same user within one day
  // AFTER it — complement of q08's backward last-click-before-purchase).
  // Implemented join-free: one shuffle on user_id, then a RANGE frame of
  // [0, +1 day] over epoch-micros finds min(purchase ts) per click —
  // per-user-day bounded work, no per-row re-scan, and tie semantics
  // (purchase at the identical microsecond counts) are inherited from the
  // RANGE frame exactly as the oracle's p.us >= c.us predicate states.
  private val q155 = GQuery(
    "q155_asof_tolerance",
    "forward as-of with tolerance via RANGE frame (join-free attribution)",
    (s, d) => {
      import s.implicits._
      val e = T(s, d, "events")
        .select($"event_id", $"user_id", $"event_type",
          expr("unix_micros(ts)").as("us"))
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(0L, 86400000000L)
      e.withColumn("next_purchase_us",
          min(when($"event_type" === "purchase", $"us")).over(w))
        .filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"next_purchase_us")
        .orderBy($"event_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
                       FROM events),
                 c AS (SELECT * FROM e WHERE event_type = 'click')
            SELECT c.event_id, c.user_id, min(p.us) AS next_purchase_us
            FROM c LEFT JOIN e p
              ON p.user_id = c.user_id AND p.event_type = 'purchase'
             AND p.us >= c.us AND p.us <= c.us + 86400000000
            GROUP BY c.event_id, c.user_id
            ORDER BY c.event_id"""))

  // --------------------------------------------------------------- q156
  // Label indexing (StringIndexer shape): categorical values ranked by
  // frequency (ties broken lexically) get dense integer ids — the
  // feature-encoding step before any model training. Pure rank
  // arithmetic over a tiny grouped aggregate: one shuffle on the label,
  // one window over the already-small distinct set.
  private val q156Sql =
    """SELECT c_mktsegment AS label, CAST(count(*) AS BIGINT) AS n,
      |       CAST(row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) - 1
      |            AS BIGINT) AS label_idx
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY label_idx""".stripMargin
  private val q156 = GQuery(
    "q156_label_index",
    "frequency-ranked dense label ids (deterministic tie-break)",
    (s, d) => { Tables.register(s, d, "customer"); s.sql(q156Sql) },
    Some(q156Sql))

  // --------------------------------------------------------------- q158
  // Equal-frequency binning via ntile over a deterministic total order
  // (cents, then unique orderkey): the quantile-bucketing feature
  // transform, exact in both engines because ntile is pure rank
  // arithmetic — no percentile interpolation, no doubles. The global
  // sort is the one unavoidable cost; at 100 TB the same transform runs
  // per-partition-key or over a deterministic sample.
  private val q158Sql =
    """SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |       min(cents) AS lo_cents, max(cents) AS hi_cents
      |FROM (SELECT CAST(ntile(8) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bin,
      |             cents
      |      FROM (SELECT o_orderkey,
      |                   CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |            FROM orders))
      |GROUP BY bin
      |ORDER BY bin""".stripMargin
  private val q158 = GQuery(
    "q158_equifreq_binning",
    "equal-frequency quantile binning via deterministic ntile",
    (s, d) => { Tables.register(s, d, "orders"); s.sql(q158Sql) },
    Some(q158Sql))

  // --------------------------------------------------------------- q160
  // BM25 relevance ranking (Robertson/Lucene form, k1=1.2, b=0.75): the
  // standard retrieval scorer, entirely as grouped aggregates + one
  // broadcast-size term table. Every model input (tf, df, dl, N, Σdl) is
  // an exact integer aggregate; the floating-point formula is evaluated
  // ONCE per (doc, term) on identical integers with identical expression
  // shape in both engines, and the two per-term contributions add
  // commutatively — so round(4) is hash-stable (the q108/q138 integer-
  // moments discipline). The query's terms are derived deterministically
  // from the corpus (first two tokens lexically), keeping the gate
  // self-contained.
  private val q160SparkSql =
    """WITH tok AS (
      |  SELECT doc_id, t
      |  FROM (SELECT doc_id, explode(split(text, ' ')) AS t FROM documents)
      |  WHERE length(t) >= 4),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |                 CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
      |terms AS (SELECT t FROM (SELECT DISTINCT t FROM tok) ORDER BY t LIMIT 2),
      |dfreq AS (SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |          FROM tok JOIN terms USING (t) GROUP BY t),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok JOIN terms USING (t) GROUP BY doc_id, t)
      |SELECT tf.doc_id AS doc_id,
      |       round(sum(ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      |                 * (tf.tf * 2.2)
      |                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
      |                    / (CAST(total_dl AS DOUBLE) / n_docs)))), 4) AS bm25
      |FROM tf JOIN dfreq USING (t) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
      |GROUP BY tf.doc_id
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 50""".stripMargin
  private val q160 = GQuery(
    "q160_bm25_ranking",
    "BM25 retrieval scoring from exact integer corpus statistics",
    (s, d) => { Tables.register(s, d, "documents"); s.sql(q160SparkSql) },
    Some(q160SparkSql
      .replace("explode(split(text, ' '))", "unnest(string_split(text, ' '))")))

  val all: Seq[GQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q15, q16, q17, q18, q19, q20, q21, q23, q24, q25, q26,
    q94, q95, q96, q97, q98, q99, q100, q103, q104, q105, q106, q107,
    q108, q109, q110, q111, q112, q113, q114, q115, q120,
    q122, q123, q124, q127, q128, q129, q131, q132, q133, q134, q143,
    q146, q147, q148, q149, q153, q155, q156, q158, q160, q186, q187, q191,
    q196)
}
