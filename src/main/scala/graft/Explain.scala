package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more registered
  * queries — the plan-audit loop ("is this the plan I'd want at 100 TB?").
  *
  * Usage: sbt "runMain graft.Explain q02_revenue_by_segment [q03_...]"
  *        (SPARK_GRAFT_SF_DIR overrides the data dir; default sf0.01)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match the Verify/Bench sessions (round 16) so printed plans are
      // the plans those surfaces actually run
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (flags, queryArgs) = args.toSeq.partition(_.startsWith("-"))
    val run = flags.contains("-run") // execute, then print the FINAL adaptive plan
    val timed = flags.contains("-time") // best-of-3 wall seconds per query (A/B tool)
    val names = if (queryArgs.nonEmpty) queryArgs else Seq("q01_pricing_summary")
    names.foreach { name =>
      println(s"===== $name =====")
      if (timed) {
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"TIME $name best-of-3 = $best%.3f s")
      } else {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (run) {
          // count() executes distributed; the rows never ship to the
          // driver (this is a dev tool, but it should still model the
          // discipline the library preaches)
          println(s"rows=${df.count()}")
          println(df.queryExecution.executedPlan.toString)
        } else df.explain("formatted")
      }
    }
    spark.stop()
  }
}
