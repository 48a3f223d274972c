package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Paths}

/** Intra-file BLOCK skipping — the parquet row-group analog for the graft
  * line formats: the sinks record per-block (byte range, rows, min/max/
  * nulls) lanes in the stats sidecars at writer-guaranteed row
  * boundaries, and planning turns a pushed filter into exact surviving
  * byte ranges read with no realignment.
  *
  * Soundness under test:
  *  - blocks tile the file exactly (contiguous, 0..len, rows add up)
  *  - filtered reads over block-pruned plans equal the unpruned read
  *    (boundary rows exactly once — the off-by-one graveyard)
  *  - a POISONED pruned block never fails or contaminates a filtered
  *    read (the zero-bytes-read proof), while a full read does fail
  *  - merged non-contiguous survivors, dataskipping opt-out, CSV parity,
  *    drop-malformed resync inside a surviving block
  */
class BlockSkippingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-block-skip")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("block-skipping-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  private def dir(name: String): String = root.resolve(name).toString

  /** One sorted single-file table: id ascending, ~40 B rows, 4 KiB blocks. */
  private def writeSorted(d: String, format: String, n: Int = 4000): DataFrame = {
    val df = spark.range(n.toLong).toDF("id")
      .withColumn("v", concat(lit("val_"), format_string("%06d", col("id"))))
      .repartition(1).sortWithinPartitions("id")
    df.write.format(format).mode("overwrite")
      .option("blockbytes", "4096").save(d)
    df
  }

  private def onlyDataFile(d: String, ext: String): Path = {
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(d)).map(_.getPath)
      .filter(p => p.getName.endsWith(ext) && !p.getName.startsWith("."))
    assert(files.length === 1, s"expected one data file, got ${files.toSeq}")
    files.head
  }

  test("writer records blocks that tile the file; rows and bounds add up") {
    val d = dir("tile")
    writeSorted(d, "graft-json")
    val f = onlyDataFile(d, ".jsonl")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(f).getLen
    val st = FileStats.load(fs, f).get
    val blocks = st.validBlocks(len)
    assert(blocks.length > 10, s"expected many 4KiB blocks, got ${blocks.length}")
    assert(blocks.map(_.rows).sum === st.rows)
    // sorted write ⇒ per-block id ranges are increasing and disjoint
    val idRanges = blocks.map(b => (b.cols("id").min.asInstanceOf[Long],
      b.cols("id").max.asInstanceOf[Long]))
    idRanges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"block id ranges overlap: $idRanges")
    case _ => () }
    // the MANIFEST is block-less by design (the one-small-read-per-
    // directory invariant): blocks live only in the per-file sidecar,
    // read lazily for files file-level pruning kept
    val fromManifest = FileStats.loadManifest(fs, f.getParent).get(f.getName)
    assert(fromManifest.blocks.isEmpty)
    assert(fromManifest.rows === st.rows) // ranges/counts still compacted
  }

  test("csv: a reordered append never block-splits (hdr gate); reads stay name-keyed") {
    val d = dir("csv-reorder")
    val df = writeSorted(d, "graft-csv")
    // a legal evolution append with the SAME columns in a different
    // physical order — positional mid-file ranges would silently swap
    // cells, so its file must refuse block pruning and read whole
    val s = spark
    import s.implicits._
    (4000L until 4200L).map(i => (s"val_%06d".format(i), i)).toDF("v", "id")
      .repartition(1).sortWithinPartitions("id")
      .write.format("graft-csv").mode("append").option("blockbytes", "512").save(d)
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(d)).map(_.getPath)
      .filter(p => p.getName.endsWith(".csv") && !p.getName.startsWith("."))
    assert(files.length === 2)
    // both files DO carry blocks; only the table-ordered one may use them
    files.foreach { f =>
      val st = FileStats.load(fs, f).get
      assert(st.validBlocks(fs.getFileStatus(f).getLen).nonEmpty)
      assert(st.header.isDefined)
    }
    val expected = (3990L until 4200L).map(i => (i, s"val_%06d".format(i)))
    val got = spark.read.format("graft-csv").load(d)
      .filter(col("id") >= 3990L).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
  }

  test("filtered read equals the unpruned read while pruning most blocks (json)") {
    val d = dir("prune-json")
    val df = writeSorted(d, "graft-json")
    val expected = df.filter(col("id") >= 100L && col("id") < 200L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    GraftScan.lastBlocksPruned.set(-1)
    val got = spark.read.format("graft-json").load(d)
      .filter(col("id") >= 100L && col("id") < 200L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    assert(GraftScan.lastBlocksPruned.get > 10,
      s"expected block pruning, pruned=${GraftScan.lastBlocksPruned.get}")
    // boundary-exactness sweep: every id-range cut line lands somewhere in
    // a block interior or boundary — all rows exactly once
    val all = spark.read.format("graft-json").load(d)
      .filter(col("id") >= 0L).orderBy("id") // trivially-true pushed filter
      .collect().map(_.getLong(0)).toSeq
    assert(all === (0L until 4000L))
  }

  test("poisoned pruned block: filtered read stays exact; full read fails") {
    val d = dir("poison")
    val df = writeSorted(d, "graft-json")
    val f = onlyDataFile(d, ".jsonl")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(f).getLen
    val blocks = FileStats.load(fs, f).get.validBlocks(len)
    // poison a block that id < 100 can never select (same length — the
    // sidecar binding must stay valid)
    val victim = blocks.find(_.cols("id").min.asInstanceOf[Long] >= 1000L).get
    val p = Paths.get(f.toUri)
    val bytes = Files.readAllBytes(p)
    java.util.Arrays.fill(bytes, victim.start.toInt, victim.end.toInt, '#'.toByte)
    bytes(victim.end.toInt - 1) = '\n'.toByte
    Files.write(p, bytes)
    Files.deleteIfExists(p.getParent.resolve("." + p.getFileName + ".crc"))
    val expected = df.filter(col("id") < 100L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = spark.read.format("graft-json").load(d)
      .filter(col("id") < 100L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    // the poison is real: a full (unfiltered) strict read must fail.
    // (count() would answer from the sidecar metadata — which is itself
    // the zero-bytes-read design working — so force row materialization)
    intercept[Exception] {
      spark.read.format("graft-json").load(d).select("id", "v").collect()
    }
    // and opting out of data skipping must fail even the filtered read
    intercept[Exception] {
      spark.read.format("graft-json").option("dataskipping", "false").load(d)
        .filter(col("id") < 100L).count()
    }
  }

  test("non-contiguous survivors merge into runs and read exactly (IN filter)") {
    val d = dir("runs")
    val df = writeSorted(d, "graft-json")
    val wanted = Seq(5L, 1500L, 3999L)
    val expected = df.filter(col("id").isin(wanted: _*))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    GraftScan.lastBlocksPruned.set(-1)
    val got = spark.read.format("graft-json").load(d)
      .filter(col("id").isin(wanted: _*))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    assert(GraftScan.lastBlocksPruned.get > 10)
  }

  test("csv: blocks record, prune, and read exactly (header owned by block 0)") {
    val d = dir("prune-csv")
    val df = writeSorted(d, "graft-csv")
    val f = onlyDataFile(d, ".csv")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(f).getLen
    assert(FileStats.load(fs, f).get.validBlocks(len).length > 10)
    val expected = df.filter(col("id") >= 3900L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    GraftScan.lastBlocksPruned.set(-1)
    val got = spark.read.format("graft-csv").load(d)
      .filter(col("id") >= 3900L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    assert(GraftScan.lastBlocksPruned.get > 10)
  }

  test("blockbytes=0 disables recording; unsorted files still read exactly") {
    val d = dir("off")
    spark.range(1000).toDF("id")
      .repartition(1)
      .write.format("graft-json").mode("overwrite")
      .option("blockbytes", "0").save(d)
    val f = onlyDataFile(d, ".jsonl")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(f).getLen
    assert(FileStats.load(fs, f).get.validBlocks(len).isEmpty)
    assert(spark.read.format("graft-json").load(d)
      .filter(col("id") === 7L).count() === 1L)
  }

  test("drop-malformed resync inside a surviving block stays block-local") {
    val d = dir("resync")
    val df = writeSorted(d, "graft-json")
    val f = onlyDataFile(d, ".jsonl")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(f).getLen
    val blocks = FileStats.load(fs, f).get.validBlocks(len)
    // corrupt ONE ROW in the id>=3900 region's first block (same length)
    val tail = blocks.find(_.cols("id").max.asInstanceOf[Long] >= 3900L).get
    val p = Paths.get(f.toUri)
    val bytes = Files.readAllBytes(p)
    // clobber the first row of that block, keeping its '\n'
    var e = tail.start.toInt
    while (bytes(e) != '\n') e += 1
    java.util.Arrays.fill(bytes, tail.start.toInt, e, 'x'.toByte)
    Files.write(p, bytes)
    Files.deleteIfExists(p.getParent.resolve("." + p.getFileName + ".crc"))
    val got = spark.read.format("graft-json")
      .schema("id BIGINT, v STRING")
      .option("badrecords", "drop").load(d)
      .filter(col("id") >= 3900L).count()
    // the clobbered row is the block's FIRST row (sorted write ⇒ its id is
    // the block min); it was lost iff it matched the filter — every other
    // row, including the rest of the corrupt row's own block, survives
    val clean = df.filter(col("id") >= 3900L).count()
    val expected =
      if (tail.cols("id").min.asInstanceOf[Long] >= 3900L) clean - 1 else clean
    assert(got === expected, s"got=$got expected=$expected clean=$clean")
  }
}
