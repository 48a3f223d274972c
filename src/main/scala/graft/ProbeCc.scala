package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Ad-hoc connected-components job-count probe (round-17 measurement tool,
  * not a driver surface): counts Spark jobs launched by one
  * TrainingData.connectedComponents call over a path graph (worst-case
  * round count), so the VERDICT item-7 "job count per round halves" claim
  * is checkable by running this on the before/after trees.
  *
  * Usage: sbt "runMain graft.ProbeCc [nNodes]"
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(512)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-probe-cc")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val t0 = System.nanoTime()
    val comp = graft.api.TrainingData.connectedComponents(nodes, edges)
    val distinctComps = comp.select("comp").distinct().count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"path-$n: components=$distinctComps jobs=${jobs.get} wall=$wall%.2f s")
    require(distinctComps == 1, s"path graph must be one component, got $distinctComps")
    spark.stop()
  }
}
