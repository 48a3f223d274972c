package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc decomposition of the blocked string-kernel joins (q163/q135):
  * separates pair production (the brand-blocked self-join) from kernel
  * evaluation, and times the raw kernel in a driver loop for a per-eval
  * floor. Usage: sbt "runMain graft.ProbeJw"
  */
object ProbeJw {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-jw")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Tables.register(spark, sfDir, "part")

    // driver-loop kernel floor
    val names = Tables(spark, sfDir, "part").select($"p_name").as[String].collect()
    println(s"names=${names.length}, avg len=${names.map(_.length).sum / names.length}")
    val u = names.map(org.apache.spark.unsafe.types.UTF8String.fromString)
    var acc = 0.0
    var k = 0
    val evals = 4000000
    // warmup
    while (k < evals) { acc += graft.functions.JaroWinklerImpl.compute(
      u(k % u.length), u(((k.toLong * 7919 + 13) % u.length).toInt)); k += 1 }
    val t0 = System.nanoTime()
    k = 0
    while (k < evals) { acc += graft.functions.JaroWinklerImpl.compute(
      u(k % u.length), u(((k.toLong * 7919 + 13) % u.length).toInt)); k += 1 }
    val perEval = (System.nanoTime() - t0).toDouble / evals
    println(f"kernel per-eval ${perEval}%.0f ns (acc=$acc%.1f)")

    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 2).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9 }
      println(f"$label%-22s best ${ts.min}%7.3f s")
    }
    time("pairs-no-kernel") {
      spark.sql("""SELECT count(*) FROM part a JOIN part b
                   ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey""")
        .write.format("noop").mode("overwrite").save()
    }
    time("pairs+jw-agg") {
      spark.sql("""SELECT count(*), sum(jaro_winkler(a.p_name, b.p_name))
                   FROM part a JOIN part b
                   ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey""")
        .write.format("noop").mode("overwrite").save()
    }
    time("q163-shape") {
      SparkEntry.queries("q163_jaro_winkler_linkage")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
