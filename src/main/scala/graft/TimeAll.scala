package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc whole-surface timer (optimization-round measurement tool, not a
  * driver surface): times EVERY registered query at SPARK_GRAFT_SF_DIR
  * through the noop sink (guide §1.4 — full plan executes, no sink cost),
  * one warmup + best-of-N per query, and prints a sorted `sec,name` table
  * so the expensive operators are found by measurement instead of guesses.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.TimeAll [passes] [namePrefix...]"
  */
object TimeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val prefixes = args.drop(if (args.headOption.exists(_.toIntOption.isDefined)) 1 else 0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-timeall")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.registry.filter(q =>
      prefixes.isEmpty || prefixes.exists(q.name.startsWith))
    def once(q: GQuery): Double = {
      val t0 = System.nanoTime()
      try {
        spark.sparkContext.setJobDescription(q.name)
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[timeall] ${q.name} FAILED: ${e.getMessage}")
        -1.0
      } finally spark.sparkContext.setJobDescription(null)
    }
    val rows = qs.map { q =>
      once(q) // warmup (JIT + footer caches)
      val ts = (1 to passes).map(_ => once(q))
      q.name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    println("=== timeall (best of " + passes + ", noop sink, sf=" + sfDir + ") ===")
    rows.sortBy(-_._2).foreach { case (n, t) => println(f"$t%9.3f  $n") }
    println(f"TOTAL ${rows.map(_._2).filter(_ > 0).sum}%.3f over ${rows.size} queries, " +
      s"failed ${rows.count(_._2 < 0)}")
    spark.stop()
  }
}
