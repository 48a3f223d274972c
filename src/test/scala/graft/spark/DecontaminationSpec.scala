package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q75's scale claim: the eval-suite shingle index is the BUILD side of a
  * BroadcastHashJoin, so the training corpus (the unbounded side) streams
  * through map-only — no shuffle of the big side. Also pins that flagged
  * pairs really do share >= 2 distinct shingles (recomputed naively here).
  */
class DecontaminationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("decontamination-spec")
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

  test("q75 broadcasts the eval suite and flags true shingle overlaps") {
    val df = graft.SparkEntry.queries("q75_decontaminate")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "the sf0.001 corpus is known to contain overlaps")

    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"the shingle screen must be a broadcast join:\n${nodes.head}")

    // recompute one flagged pair's overlap naively
    def shingles(text: String): Set[String] = {
      val w = text.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val texts = graft.Tables(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(5).foreach { r =>
      val (t, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val shared = shingles(texts(t)).intersect(shingles(texts(b))).size
      assert(shared == n, s"pair ($t, $b): reported $n shared shingles, naive recount $shared")
      assert(t % 97 != 0 && b % 97 == 0, "sides swapped")
    }
  }
}
