package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement (round 20, judge item 4): the two-level extract
  * shape's consumer-side cost — nested `meta.geo.lat` extraction vs the
  * SAME values as flat top-level columns, both through the vectorized
  * graft-json scan. The delta bounds what scan-level leaf-flattening
  * could ever buy.
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("twolevel-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val li = Tables(spark, sfDir, "lineitem")
    // 10x rows so parse dominates planning
    val big = li.withColumn("r", explode(array((0 until 10).map(lit): _*))).drop("r")

    val nestedDir = "/tmp/graft_probe_twolevel_nested"
    val flatDir = "/tmp/graft_probe_twolevel_flat"
    big.select($"l_orderkey",
      struct(
        struct($"l_quantity".as("lat"), $"l_extendedprice".as("lon"),
          $"l_returnflag".as("src")).as("geo"),
        $"l_discount".as("score"), $"l_linestatus".as("tag")).as("meta"))
      .repartition(8).write.format("graft-json").mode("overwrite").save(nestedDir)
    big.select($"l_orderkey",
        $"l_quantity".as("lat"), $"l_extendedprice".as("lon"),
        $"l_returnflag".as("src"), $"l_discount".as("score"),
        $"l_linestatus".as("tag"))
      .repartition(8).write.format("graft-json").mode("overwrite").save(flatDir)

    val nestedSchema = "l_orderkey BIGINT, meta STRUCT<geo: STRUCT<lat: DOUBLE, " +
      "lon: DOUBLE, src: STRING>, score: DOUBLE, tag: STRING>"
    val flatSchema = "l_orderkey BIGINT, lat DOUBLE, lon DOUBLE, src STRING, " +
      "score DOUBLE, tag STRING"

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def nested(vec: Boolean): Double = time {
      spark.read.format("graft-json").schema(nestedSchema)
        .option("vectorized", vec.toString).load(nestedDir)
        .select($"meta.geo.lat", $"meta.geo.src", $"meta.score")
        .write.format("noop").mode("overwrite").save()
    }
    def flat(vec: Boolean): Double = time {
      spark.read.format("graft-json").schema(flatSchema)
        .option("vectorized", vec.toString).load(flatDir)
        .select($"lat", $"src", $"score")
        .write.format("noop").mode("overwrite").save()
    }
    // warmup then best-of-5 each, interleaved
    nested(true); flat(true); nested(false); flat(false)
    val nv = (1 to 5).map(_ => nested(true)).min
    val fv = (1 to 5).map(_ => flat(true)).min
    val nr = (1 to 5).map(_ => nested(false)).min
    val fr = (1 to 5).map(_ => flat(false)).min
    println(f"TWOLEVEL-PROBE nested_vec=$nv%.3f flat_vec=$fv%.3f " +
      f"nested_row=$nr%.3f flat_row=$fr%.3f " +
      f"nested_vec/flat_vec=${nv / fv}%.2f nested_vec_speedup_vs_row=${nr / nv}%.2f")
    spark.stop()
  }
}
