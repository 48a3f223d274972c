package graft.spark

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** ListState accumulator: emits (key, count-so-far, ordered-joined values)
  * every batch — state must carry across micro-batches.
  */
class ListCollectProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long, String)] {
  @transient private var st: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getListState[Long]("vals", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, String)] = {
    rows.foreach(r => st.appendValue(r._2))
    val all = st.get().toSeq.sorted
    Iterator.single((key, all.size.toLong, all.mkString(",")))
  }
}

/** MapState counter: per-key map of subkey → occurrence count. */
class MapCountProcessor extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
  @transient private var st: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[(Long, String, Long)] = {
    rows.foreach { r =>
      val prev = if (st.containsKey(r._2)) st.getValue(r._2) else 0L
      st.updateValue(r._2, prev + 1L)
    }
    st.iterator().map { case (sub, n) => (key, sub, n) }
  }
}

/** The Spark 4 transformWithState API beyond q139's ValueState: ListState
  * and MapState variables on the RocksDB provider, with state proven to
  * persist ACROSS micro-batches (two staged files + maxFilesPerTrigger=1
  * force two batches).
  */
class TransformWithStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("transform-with-state-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Stage two parquet files (one per micro-batch under maxFilesPerTrigger=1). */
  private def stage(dir: String, a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Unit = {
    val s = spark; import s.implicits._
    val p = java.nio.file.Paths.get(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    java.nio.file.Files.createDirectories(p)
    Seq(("a_first", a), ("b_second", b)).foreach { case (name, rows) =>
      val tmp = p.resolve(name + "_tmp")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(
        q => q.getFileName.toString.startsWith("part-")).findFirst.get
      java.nio.file.Files.move(part, p.resolve(name + ".parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("ListState accumulates across micro-batches") {
    val s = spark; import s.implicits._
    val dir = "/tmp/graft_tws_spec/list"
    stage(dir, Seq((1L, 10L), (1L, 11L), (2L, 20L)), Seq((1L, 12L), (2L, 21L)))
    val schema = s.read.parquet(dir).schema
    val out = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select($"k".as[Long], $"v".as[Long])
      .groupByKey(_._1)
      .transformWithState(new ListCollectProcessor, TimeMode.None(), OutputMode.Update(),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
    val q = out.toDF("k", "n", "vals")
      .writeStream.format("memory").queryName("tws_list")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = s.table("tws_list").as[(Long, Long, String)].collect()
    // final (largest-n) emission per key must hold the union of both batches
    val finalByKey = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    assert(finalByKey(1L)._3 == "10,11,12" && finalByKey(1L)._2 == 3L)
    assert(finalByKey(2L)._3 == "20,21" && finalByKey(2L)._2 == 2L)
    // key 1 was emitted in both batches with GROWING state — the cross-batch proof
    assert(rows.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(2L, 3L))
  }

  test("MapState counts per subkey across micro-batches") {
    val s = spark; import s.implicits._
    val dir = "/tmp/graft_tws_spec/map"
    val p = java.nio.file.Paths.get(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    java.nio.file.Files.createDirectories(p)
    Seq(("a_first", Seq((1L, "x"), (1L, "x"), (1L, "y"))),
        ("b_second", Seq((1L, "x"), (2L, "z")))).foreach { case (name, rows) =>
      val tmp = p.resolve(name + "_tmp")
      rows.toDF("k", "sub").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(
        q => q.getFileName.toString.startsWith("part-")).findFirst.get
      java.nio.file.Files.move(part, p.resolve(name + ".parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    val schema = s.read.parquet(dir).schema
    val out = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select($"k".as[Long], $"sub".as[String])
      .groupByKey(_._1)
      .transformWithState(new MapCountProcessor, TimeMode.None(), OutputMode.Update(),
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong))
    val q = out.toDF("k", "sub", "n")
      .writeStream.format("memory").queryName("tws_map")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = s.table("tws_map").as[(Long, String, Long)].collect()
    // final count per (k, sub) = max emission (counts only grow)
    val finalCounts = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).max).toMap
    assert(finalCounts == Map((1L, "x") -> 3L, (1L, "y") -> 1L, (2L, "z") -> 1L))
  }
}
