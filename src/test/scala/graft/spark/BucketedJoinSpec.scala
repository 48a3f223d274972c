package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q61's scale claim, verified against the physical plan: a join of two
  * tables bucketed on the join key plans as a SortMergeJoin with NO
  * shuffle exchange on either input (the buckets are already co-located).
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("bucketed-join-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // AQE wraps finalized stages in leaf QueryStageExec nodes; flatten the
  // whole tree so the collector sees through them.
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("bucketed join plans with zero exchanges under the SMJ") {
    val df = graft.SparkEntry.queries("q61_bucketed_colocated_join")(
      spark, "/root/testdata/sf0.001")
    // materialize so AQE finalizes the plan it actually ran
    assert(df.collect().nonEmpty)
    val nodes = flatten(df.queryExecution.executedPlan)
    val smjs = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a SortMergeJoin, got:\n${nodes.head}")
    val shufflesBelowJoin = flatten(smjs.head).collect { case e: ShuffleExchangeExec => e }
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n${smjs.head}")
  }
}
