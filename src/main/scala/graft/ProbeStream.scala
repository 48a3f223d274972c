package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ad-hoc streaming-gate decomposition probe (round-17 measurement tool,
  * not a driver surface): runs the named streaming queries with a
  * StreamingQueryListener attached and prints, per micro-batch, the
  * engine's own duration breakdown (triggerExecution / queryPlanning /
  * addBatch / getBatch / walCommit / commitOffsets / stateOperators) —
  * the probe table VERDICT r16 item 4 asks for on q63/q55: is the wall
  * per-batch machinery, state-store cost, or a semantic clock floor?
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProbeStream q63_... [more]"
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-stream")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q63_stream_stream_join", "q55_flatmap_state_timeout")

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        def d(k: String): Long = Option(dur.get(k)).map(_.longValue).getOrElse(-1L)
        val state = p.stateOperators.map { so =>
          s"rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}"
        }.mkString(" | ")
        batches.add(
          f"batch=${p.batchId}%3d rows=${p.numInputRows}%7d " +
            f"trigger=${d("triggerExecution")}%6d addBatch=${d("addBatch")}%6d " +
            f"getBatch=${d("getBatch")}%4d latestOffset=${d("latestOffset")}%5d " +
            f"planning=${d("queryPlanning")}%5d wal=${d("walCommit")}%4d " +
            f"commitOffs=${d("commitOffsets")}%4d  [$state]")
      }
    })

    names.foreach { name =>
      batches.clear()
      println(s"===== $name =====")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the last progress event land
      batches.forEach(b => println(b))
      println(f"TOTAL wall $wall%.3f s over ${batches.size} micro-batches")
    }
    spark.stop()
  }
}
