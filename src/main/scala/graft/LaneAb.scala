package graft

import org.apache.spark.sql.SparkSession

/** Scoped container-lane runner (ad-hoc A/B, not a driver surface):
  * runs the paired columnar-vs-row lanes at the given data dir so a
  * whole-tree A/B doesn't pay for the full bench. Usage:
  * `sbt "runMain graft.LaneAb /tmp/graft_sf1 twolevel elemcontainers"`.
  */
object LaneAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val lanes = if (args.length > 1) args.tail.toSet
      else Set("nested", "array", "arraystruct", "twolevel", "structarray",
        "elemcontainers", "childstructarr", "threelevel")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-lane-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def show(name: String)(r: => (Double, Double, Double)): Unit =
      if (lanes(name)) { val (v, w, x) = r; println(f"$name%s vec=$v%.3f row=$w%.3f ratio=$x%.2f") }
    show("nested")(NestedColumnarBench.run(spark, dir))
    show("array")(ArrayColumnarBench.run(spark, dir))
    show("arraystruct")(ArrayStructColumnarBench.run(spark, dir))
    show("twolevel")(TwoLevelColumnarBench.run(spark, dir))
    show("structarray")(StructArrayColumnarBench.run(spark, dir))
    show("elemcontainers")(ElemContainersColumnarBench.run(spark, dir))
    show("childstructarr")(ChildStructArrColumnarBench.run(spark, dir))
    show("threelevel")(ThreeLevelColumnarBench.run(spark, dir))
    spark.stop()
  }
}
