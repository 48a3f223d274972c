package graft.spark

import graft.functions.{CmsHash, CountMinSketchAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/** CountMinSketchAgg contracts: never undercounts, deterministic across
  * partitionings (merge is elementwise addition of exact integers), and
  * the md5 bucketing matches the SQL spelling the q136 oracle relies on.
  */
class CountMinSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("cms-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def estimate(sk: Seq[Long], key: String, depth: Int, width: Int): Long =
    (0 until depth).map(i => sk(i * width + CmsHash.bucket(i, key, width))).min

  test("estimates never undercount; exact when buckets are collision-free") {
    val s = spark; import s.implicits._
    val rnd = new Random(5)
    val keys = (1 to 40).map(i => s"key$i")
    val data = Seq.fill(5000)(keys(rnd.nextInt(keys.length)))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    s.udf.register("cms", udaf(new CountMinSketchAgg(3, 256)))
    val sk = data.toDF("k").agg(expr("cms(k)")).as[Seq[Long]].collect()(0)
    keys.foreach { k =>
      val est = estimate(sk, k, 3, 256)
      assert(est >= truth(k), s"$k: est $est < truth ${truth(k)}")
    }
    // total mass per hash row == total item count (nothing lost in merge)
    (0 until 3).foreach { i =>
      assert(sk.slice(i * 256, (i + 1) * 256).sum == data.size.toLong)
    }
    // overcount bounded: the CMS guarantee is ~eps*N with eps = e/width;
    // on this fixed-seed fixture assert the generous empirical 3N/width
    keys.foreach { k =>
      val est = estimate(sk, k, 3, 256)
      assert(est <= truth(k) + 3L * data.size / 256,
        s"$k: est $est too far above truth ${truth(k)}")
    }
  }

  test("sketch identical at 1 vs 13 partitions (merge associativity)") {
    val s = spark; import s.implicits._
    s.udf.register("cms", udaf(new CountMinSketchAgg(3, 64)))
    val data = (1 to 3000).map(i => s"v${i % 37}")
    val one = data.toDF("k").coalesce(1).agg(expr("cms(k)")).as[Seq[Long]].collect()(0)
    val many = data.toDF("k").repartition(13).agg(expr("cms(k)")).as[Seq[Long]].collect()(0)
    assert(one == many)
  }

  test("nulls are ignored, not counted") {
    val s = spark; import s.implicits._
    s.udf.register("cms", udaf(new CountMinSketchAgg(2, 32)))
    val sk = Seq(Some("a"), None, Some("a"), None).toDF("k")
      .agg(expr("cms(k)")).as[Seq[Long]].collect()(0)
    assert(sk.slice(0, 32).sum == 2L)
  }

  test("CmsHash matches the SQL md5/conv spelling used by the q136 oracle") {
    val s = spark; import s.implicits._
    val keys = Seq("click", "purchase", "view", "err or", "ünïcode")
    keys.foreach { k =>
      (0 until 3).foreach { i =>
        val sql = s.sql(
          s"SELECT CAST(conv(substring(md5(concat('cms$i:', '$k')), 1, 8), 16, 10) AS BIGINT) % 256")
          .collect()(0).getLong(0)
        assert(CmsHash.bucket(i, k, 256).toLong == sql, s"key=$k i=$i")
      }
    }
  }
}
