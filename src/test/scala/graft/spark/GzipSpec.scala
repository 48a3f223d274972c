package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Paths}

/** Gzip ingest paths the q77 gate doesn't reach: malformed-record recovery
  * (seek/positioned-read are emulated on gzip by reopen+skip — exactly the
  * code the happy path never runs), PERMISSIVE corrupt-line capture,
  * planning unsplittability, and COUNT(*) pushdown through the
  * decompressing reader.
  */
class GzipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = Files.createTempDirectory("graft-gzip-spec")

  private def gzWrite(name: String, content: String): String = {
    val p = dir.resolve(name)
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(p))
    try out.write(content.getBytes("UTF-8")) finally out.close()
    p.toString
  }

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("gzip-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def rows(n: Int, bad: Set[Int] = Set.empty): String =
    (0 until n).map { i =>
      if (bad(i)) s"""{"id": $i, "v": oops}""" // bare token: fails in place
      else s"""{"id": $i, "v": "val-$i"}"""
    }.mkString("", "\n", "\n")

  test("gzip json reads whole and never splits, whatever maxsplitbytes says") {
    val p = gzWrite("clean.jsonl.gz", rows(200))
    val df = spark.read.format("graft-json")
      .option("maxsplitbytes", "64") // would mean dozens of splits if honored
      .load(p)
    assert(df.count() == 200)
    assert(df.rdd.getNumPartitions == 1, "a gzip member must stay one partition")
    assert(df.selectExpr("sum(id)").collect()(0).getLong(0) == 199L * 200 / 2)
  }

  test("dropmalformed resyncs inside a gzip stream (emulated seek)") {
    val p = gzWrite("bad.jsonl.gz", rows(100, bad = Set(13, 57)))
    val df = spark.read.format("graft-json")
      .option("badrecords", "drop")
      .load(p)
    // read BOTH columns: a pruned scan would byte-skip the malformed value
    // with error-check elision (documented) and never trigger the resync
    val kept = df.select("id", "v").collect()
    val ids = kept.map(_.getLong(0)).toSet
    assert(kept.length == 98 && !ids(13) && !ids(57),
      s"expected 98 clean rows, got ${kept.length}")
    assert(kept.forall(_.getString(1).startsWith("val-")))
  }

  test("permissive mode captures the corrupt gzip line bytes") {
    val p = gzWrite("perm.jsonl.gz", rows(20, bad = Set(7)))
    val df = spark.read.format("graft-json")
      .option("badrecords", "keep")
      .load(p)
    val all = df.select("id", "v", "_corrupt_record").collect()
    val corrupt = all.filter(!_.isNullAt(2)).map(_.getString(2))
    assert(corrupt.length == 1 && corrupt(0).contains("\"id\": 7"),
      s"corrupt capture: ${corrupt.mkString("|")}")
    assert(all.length == 20) // 19 clean + 1 corrupt-record row
  }

  test("COUNT(*) pushdown runs through the decompressing reader") {
    val p = gzWrite("count.jsonl.gz", rows(321))
    val df = spark.read.format("graft-json").load(p).selectExpr("count(*) AS n")
    assert(df.collect()(0).getLong(0) == 321)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("countStar"), s"expected pushed COUNT(*):\n$scan")
  }

  test("graft-json sink writes gzip members that round-trip through the reader") {
    val s = spark; import s.implicits._
    val outDir = dir.resolve("sinkout").toString
    val src = (1L to 300L).map(i => (i, s"payload-$i")).toDF("id", "payload")
    src.repartition(3).write.format("graft-json")
      .option("compression", "gzip").mode("overwrite").save(outDir)

    val files = Files.list(Paths.get(outDir)).toArray.map(_.toString)
      .filterNot(p => p.contains(".stage") || Paths.get(p).getFileName.toString.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".jsonl.gz")),
      s"expected .jsonl.gz parts: ${files.mkString(",")}")

    val back = spark.read.format("graft-json").load(outDir)
    assert(back.count() == 300)
    assert(back.selectExpr("sum(id)").collect()(0).getLong(0) == 300L * 301 / 2)
    assert(back.rdd.getNumPartitions == files.length, "one partition per gzip member")
  }

  test("zstd json reads whole, drops malformed, and round-trips the sink") {
    val s = spark; import s.implicits._
    // read: zstd member with a corrupt line
    val p = dir.resolve("z.jsonl.zst")
    val out = new com.github.luben.zstd.ZstdOutputStream(Files.newOutputStream(p))
    try out.write(rows(80, bad = Set(11)).getBytes("UTF-8")) finally out.close()
    val df = spark.read.format("graft-json").option("badrecords", "drop").load(p.toString)
    val kept = df.select("id", "v").collect()
    assert(kept.length == 79 && !kept.map(_.getLong(0)).toSet(11))
    assert(df.rdd.getNumPartitions == 1)

    // write: sink round-trip
    val outDir = dir.resolve("zsink").toString
    (1L to 120L).map(i => (i, s"z-$i")).toDF("id", "payload")
      .repartition(2).write.format("graft-json")
      .option("compression", "zstd").mode("overwrite").save(outDir)
    val files = Files.list(Paths.get(outDir)).toArray.map(_.toString)
      .filterNot(f => f.contains(".stage") || Paths.get(f).getFileName.toString.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".jsonl.zst")),
      s"expected .jsonl.zst parts: ${files.mkString(",")}")
    val back = spark.read.format("graft-json").load(outDir)
    assert(back.selectExpr("count(*)", "sum(id)").collect()(0).toSeq == Seq(120L, 120L * 121 / 2))
  }

  test("gzip and plain reads agree under random corruption (differential)") {
    val rng = new scala.util.Random(0xC0DEC)
    (1 to 4).foreach { trial =>
      val bad = Seq.fill(rng.nextInt(6))(rng.nextInt(150)).toSet
      val content = rows(150, bad)
      val plain = dir.resolve(s"diff$trial.jsonl")
      Files.write(plain, content.getBytes("UTF-8"))
      val gz = gzWrite(s"diff$trial.jsonl.gz", content)
      def readAll(p: String): Seq[(Long, String)] =
        spark.read.format("graft-json").option("badrecords", "drop").load(p)
          .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val a = readAll(plain.toString)
      val b = readAll(gz)
      assert(a == b, s"trial $trial (bad=$bad): plain ${a.size} rows vs gzip ${b.size}")
      assert(a.size >= 150 - bad.size * 2) // each bad line costs at most itself + successor
    }
  }

  test("json streaming auto-switches to whole-file admission for gzip input") {
    val s = spark; import s.implicits._
    val streamDir = dir.resolve("stream")
    Files.createDirectories(streamDir)
    gzWrite("stream/a.jsonl.gz", rows(30))
    gzWrite("stream/b.jsonl.gz",
      (30 until 75).map(i => s"""{"id": $i, "v": "val-$i"}""").mkString("", "\n", "\n"))
    val schema = spark.read.format("graft-json").load(streamDir.toString).schema
    val q = spark.readStream.format("graft-json")
      .schema(schema)
      .option("maxfilespertrigger", "1") // two micro-batches
      .load(streamDir.toString)
      .groupBy().agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"id").as("s"))
      .writeStream.format("memory").queryName("gz_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val r = spark.table("gz_stream").collect()(0)
    assert(r.getLong(0) == 75 && r.getLong(1) == 74L * 75 / 2, r.toString)
  }

  test("admission mode is pinned in the checkpoint: a mode flip fails fast") {
    val s = spark; import s.implicits._
    val streamDir = dir.resolve("pinned")
    Files.createDirectories(streamDir)
    Files.write(streamDir.resolve("a.jsonl"), rows(20).getBytes("UTF-8"))
    val ckpt = dir.resolve("pinned-ckpt").toString
    val sink = dir.resolve("pinned-sink").toString
    val schema = spark.read.format("graft-json").load(streamDir.toString).schema
    def start() = spark.readStream.format("graft-json")
      .schema(schema)
      .load(streamDir.toString)
      .writeStream.format("parquet") // memory sink can't recover checkpoints
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    start().awaitTermination() // first run pins byte admission
    assert(spark.read.parquet(sink).count() == 20)

    // a compressed file lands: a fresh resolution would auto-flip to
    // whole-file admission, reinterpreting the committed byte offset as a
    // file index — the pinned mode must fail fast instead
    gzWrite("pinned/b.jsonl.gz",
      (20 until 40).map(i => s"""{"id": $i, "v": "val-$i"}""").mkString("", "\n", "\n"))
    val e = intercept[Exception] { start().awaitTermination() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("admission mode")),
      s"expected the pinned-admission error, got: $e")
  }

  test("gzip csv reads with header and types") {
    val p = gzWrite("t.csv.gz", "a,b\r\n" + (1 to 50).map(i => s"$i,x$i").mkString("\r\n") + "\r\n")
    val df = spark.read.format("graft-csv").option("linesep", "\r\n").load(p)
    assert(df.count() == 50)
    assert(df.selectExpr("sum(CAST(a AS LONG))").collect()(0).getLong(0) == 25L * 51)
  }
}
