package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q52's scale claims, verified against the plans it actually runs:
  *   - the inverted-list probe is a BroadcastHashJoin on the centroid id
  *     (the big `assigned` side never shuffles for the probe), and
  *   - NO array-typed literal appears anywhere in the optimized plan —
  *     centroids reach the executors via a broadcast relation, not as
  *     `typedlit` vectors baked into the plan (which would grow the plan
  *     with the data and hold every centroid in driver memory twice).
  */
class IvfPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("ivf-plan-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("q52 probes via BroadcastHashJoin and bakes no array literals into the plan") {
    val df = graft.SparkEntry.queries("q52_ann_ivf")(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)

    val nodes = flatten(df.queryExecution.executedPlan)
    val bhjs = nodes.collect { case j: BroadcastHashJoinExec => j }
    assert(bhjs.nonEmpty,
      s"expected the nprobe list probe to be a BroadcastHashJoin, got:\n${nodes.head}")

    val arrayLits = df.queryExecution.optimizedPlan.flatMap(_.expressions.flatMap(_.collect {
      case l @ Literal(_, _: ArrayType) => l
    }))
    assert(arrayLits.isEmpty,
      s"centroids must travel as a broadcast relation, not plan literals: $arrayLits")
  }
}
