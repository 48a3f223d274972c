package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc headline-decomposition probe (optimization-round measurement
  * tool, not a driver surface): splits each bench query's wall time into
  * build (footer reads + analysis) vs execution, and A/Bs the
  * parquet-NTZ read path (`spark.sql.parquet.inferTimestampNTZ.enabled`)
  * that decides whether Tables.apply must graft a cast-Project over every
  * timestamp-bearing scan.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.ProbeOverhead [ntzoff]"
  */
object ProbeOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ntzOff = args.contains("ntzoff")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (ntzOff)
      b.config("spark.sql.parquet.inferTimestampNTZ.enabled", "false") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bench = SparkEntry.benchQueries
    bench.foreach { q => // warmup
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    (1 to 3).foreach { pass =>
      bench.foreach { q =>
        val t0 = System.nanoTime()
        val df = q.build(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"pass$pass ${q.name}%-45s build ${(t1 - t0) / 1e3}%9.0f us  exec ${(t2 - t1) / 1e3}%9.0f us")
      }
    }
    spark.stop()
  }
}
