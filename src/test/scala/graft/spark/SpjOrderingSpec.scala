package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Storage-partitioned reads: the hive layout the graft sinks write IS a
  * physical clustering, so with spark.sql.sources.v2.bucketing.enabled
  * the scan reports KeyGroupedPartitioning and Spark plans group-bys and
  * joins on the partition columns WITHOUT a shuffle; the sidecars'
  * write-order `sorted` flag additionally lets the scan report a
  * per-partition output ordering so downstream local sorts are elided.
  * Every plan-shape assertion is paired with a value-exactness check —
  * a wrongly-claimed partitioning or ordering would corrupt results, so
  * exactness is the point, not a formality.
  */
class SpjOrderingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("graft-spj-spec")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("spj-ordering-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def collectPlan[T](df: org.apache.spark.sql.DataFrame)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect(pf)
  }

  private def writePartitioned(name: String): String = {
    val s = spark; import s.implicits._
    val out = dir.resolve(name).toString
    (0L until 1200L).map(i => (i, i % 6, s"v-$i"))
      .toDF("id", "g", "tag")
      .repartition($"g") // one part file per leaf (clustered write)
      .write.format("graft-json").partitionBy("g")
      .mode("overwrite").save(out)
    out
  }

  private def withSpj(f: => Unit): Unit = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("group-by on the partition column aggregates without a shuffle") {
    val out = writePartitioned("agg")
    withSpj {
      val df = spark.read.format("graft-json")
        .schema("id LONG, tag STRING, g LONG").load(out)
        .groupBy("g").agg(count(lit(1)).as("n"), sum("id").as("s"))
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val expect = (0L until 1200L).groupBy(_ % 6).toSeq.map { case (g, ids) =>
        (g, ids.size.toLong, ids.sum)
      }.sortBy(_._1)
      assert(rows == expect)
      assert(collectPlan(df) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"expected shuffle-free aggregation:\n${df.queryExecution.executedPlan}")
    }
    // without the conf the same query still answers exactly (shuffled)
    val df2 = spark.read.format("graft-json")
      .schema("id LONG, tag STRING, g LONG").load(out)
      .groupBy("g").agg(count(lit(1)).as("n"))
    assert(df2.collect().map(_.getLong(1)).sum == 1200L)
  }

  test("storage-partitioned join: co-partitioned layouts join with zero exchanges") {
    val a = writePartitioned("spj-a")
    val b = writePartitioned("spj-b")
    withSpj {
      val fa = spark.read.format("graft-json")
        .schema("id LONG, tag STRING, g LONG").load(a)
        .groupBy("g").agg(sum("id").as("sa"))
      val fb = spark.read.format("graft-json")
        .schema("id LONG, tag STRING, g LONG").load(b)
        .groupBy("g").agg(count(lit(1)).as("nb"))
      val joined = fa.join(fb, "g")
      val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val expect = (0L until 1200L).groupBy(_ % 6).toSeq.map { case (g, ids) =>
        (g, ids.sum, ids.size.toLong)
      }.sortBy(_._1)
      assert(rows == expect)
      assert(collectPlan(joined) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"expected a zero-exchange storage-partitioned join:\n" +
          joined.queryExecution.executedPlan)
    }
  }

  test("sidecar sorted flag: sorted sink output reports ordering, unsorted does not") {
    val s = spark; import s.implicits._
    val sortedOut = dir.resolve("sorted").toString
    (0L until 900L).map(i => (i, s"t-$i"))
      .toDF("id", "tag")
      .repartitionByRange(3, $"id").sortWithinPartitions("id")
      .write.format("graft-json").mode("overwrite").save(sortedOut)

    val scanOrd = spark.read.format("graft-json").load(sortedOut)
      .queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.ordering
      }.flatten
    assert(scanOrd.exists(_.nonEmpty),
      "sorted files must surface an output ordering on the scan")

    // an unsorted write claims nothing
    val unsortedOut = dir.resolve("unsorted").toString
    (0L until 900L).map(i => ((i * 37) % 900, s"t-$i"))
      .toDF("id", "tag").coalesce(1)
      .write.format("graft-json").mode("overwrite").save(unsortedOut)
    val scanOrd2 = spark.read.format("graft-json").load(unsortedOut)
      .queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.ordering
      }.flatten
    assert(!scanOrd2.exists(_.nonEmpty), "unsorted files must claim no ordering")

    // option escape hatch
    val scanOrd3 = spark.read.format("graft-json").option("reportordering", "false")
      .load(sortedOut).queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.ordering
      }.flatten
    assert(!scanOrd3.exists(_.nonEmpty))
  }

  test("SPJ on raw scans: merge join on the partition column needs no exchange and no sort") {
    // partition-col ordering is trivial (constant per partition) and the
    // scan reports it, so a partition-keyed merge join of the RAW scans
    // plans with neither exchange nor local sort — file-against-file
    val s = spark; import s.implicits._
    val a = writePartitioned("sortfree-a")
    val b = writePartitioned("sortfree-b")
    withSpj {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val ra = spark.read.format("graft-json")
          .schema("id LONG, tag STRING, g LONG").load(a)
        val rb = spark.read.format("graft-json")
          .schema("id LONG, tag STRING, g LONG").load(b)
        val joined = ra.join(rb, Seq("g"))
          .groupBy().agg(count(lit(1)).as("n"))
        // 6 groups × 200 × 200 pairs
        assert(joined.collect()(0).getLong(0) == 6L * 200 * 200)
        // the only exchange is the final 1-row gather for the global
        // count (SinglePartition) — the JOIN itself moves no data
        val joinShuffles = collectPlan(joined) {
          case e: ShuffleExchangeExec
              if !e.outputPartitioning.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical.SinglePartition.type] => e
        }
        assert(joinShuffles.isEmpty,
          s"expected a shuffle-free join:\n${joined.queryExecution.executedPlan}")
        assert(collectPlan(joined) { case e: SortExec => e }.isEmpty,
          s"expected the reported partition-col ordering to elide the SMJ sorts:\n" +
            joined.queryExecution.executedPlan)
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("projections that drop the partition column drop the claims (no resolution errors)") {
    val out = writePartitioned("proj")
    withSpj {
      // ordering/partitioning must not reference pruned-away columns
      val ids = spark.read.format("graft-json")
        .schema("id LONG, tag STRING, g LONG").load(out)
        .select("id").orderBy("id").limit(3)
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(0L, 1L, 2L))
    }
  }

  test("sorted-flag detection is conservative: nulls after values break the claim") {
    import FileStats._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType)))
    def snap(vals: Seq[java.lang.Long]): Boolean = {
      val c = new FileStatsCollector(schema)
      vals.foreach { v =>
        c.observe(org.apache.spark.sql.catalyst.InternalRow(
          if (v == null) null else v.longValue))
      }
      c.snapshot(1L).cols("x").sorted
    }
    assert(snap(Seq(1L, 2L, 2L, 5L)))
    assert(snap(Seq(null, null, 1L, 3L)))   // NULLS FIRST
    assert(!snap(Seq(1L, null, 2L)))        // null after a value
    assert(!snap(Seq(1L, 3L, 2L)))          // decrease
    assert(snap(Seq.empty))                 // vacuously sorted
  }
}
