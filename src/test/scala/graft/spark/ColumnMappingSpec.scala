package graft.spark

import graft.api.TrainingData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** ALTER TABLE ... RENAME COLUMN via column mapping (the Delta shape,
  * name-based): renames are schema-only commits — the physical key in
  * data files never changes — so zero data moves, old files keep
  * reading, time travel shows each epoch's own names, and appends/COW
  * rewrites keep serializing under the physical key.
  */
class ColumnMappingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-colmap")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("column-mapping-spec")
      .config("spark.sql.shuffle.partitions", "2")
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

  private def write(d: String, n: Long, mode: String,
      format: String = "graft-json", cols: (String, String) = ("id", "v")): Unit = {
    val s = spark
    import s.implicits._
    (0L until n).map(i => (i, s"s$i")).toDF(cols._1, cols._2)
      .repartition(1).write.format(format).mode(mode).save(d)
  }

  test("rename is schema-only: zero data movement, old files keep reading") {
    val d = dir("basic")
    write(d, 20L, "overwrite")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).sortBy(_._1).toSeq
    val before = dataFiles()
    val v = TrainingData.alterTableRenameColumn(spark, d, "v", "label")
    assert(v === 1L)
    assert(dataFiles() === before, "rename must not touch any data file")
    // schemaless read serves the NEW logical name with the old values
    val df = spark.read.format("graft-json").load(d)
    assert(df.columns.toSeq === Seq("id", "label"))
    val got = df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === (0L until 20L).map(i => (i, s"s$i")))
    // explicit logical schema reads the same values
    val exp = spark.read.format("graft-json").schema("id BIGINT, label STRING")
      .load(d).orderBy("id").collect().map(_.getString(1))
    assert(exp.toSeq === (0L until 20L).map(i => s"s$i"))
    // versionAsOf BEFORE the rename serves the OLD name
    val old = spark.read.format("graft-json")
      .option("versionasof", "0").load(d)
    assert(old.columns.toSeq === Seq("id", "v"))
    assert(old.count() === 20L)
  }

  test("appends after a rename serialize under the PHYSICAL key") {
    val d = dir("append")
    write(d, 10L, "overwrite")
    TrainingData.alterTableRenameColumn(spark, d, "v", "label")
    // append with the NEW logical name
    write(d, 5L, "append", cols = ("id", "label"))
    // all 15 rows read under the logical name, across both vintages
    val got = spark.read.format("graft-json").load(d)
      .orderBy("id").collect().map(_.getString(1))
    assert(got.length === 15)
    assert(got.forall(_ != null), "an appended file wrote the wrong physical key")
    // and the appended file's raw bytes carry the PHYSICAL key 'v'
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newest = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .maxBy(_.getModificationTime).getPath
    val head = {
      val in = fs.open(newest)
      val buf = new Array[Byte](200)
      val n = in.read(buf); in.close()
      new String(buf, 0, math.max(n, 0), "UTF-8")
    }
    assert(head.contains("\"v\":"), s"expected physical key in $head")
    assert(!head.contains("\"label\":"), s"unexpected logical key in $head")
  }

  test("chained renames keep the ORIGINAL physical key; renaming back dissolves the mapping") {
    val d = dir("chain")
    write(d, 8L, "overwrite")
    TrainingData.alterTableRenameColumn(spark, d, "v", "a")
    TrainingData.alterTableRenameColumn(spark, d, "a", "b")
    val rec = TrainingData.tableSchema(spark, d).get
    assert(GraftSources.physicalName(rec("b")) === "v")
    assert(spark.read.format("graft-json").load(d)
      .orderBy("id").collect().map(_.getString(1)).head === "s0")
    // rename back to the physical name: mapping dissolves
    TrainingData.alterTableRenameColumn(spark, d, "b", "v")
    val rec2 = TrainingData.tableSchema(spark, d).get
    assert(!rec2("v").metadata.contains(GraftSources.PhysicalNameKey))
    assert(spark.read.format("graft-json").load(d).count() === 8L)
  }

  test("filters on a renamed column are exact (residual); non-renamed columns keep pruning") {
    val d = dir("filters")
    val s = spark
    import s.implicits._
    (0L until 400L).map(i => (i, s"s$i")).toDF("id", "v")
      .repartitionByRange(4, $"id").sortWithinPartitions("id")
      .write.format("graft-json").mode("overwrite").save(d)
    TrainingData.alterTableRenameColumn(spark, d, "v", "label")
    val df = spark.read.format("graft-json").schema("id BIGINT, label STRING").load(d)
    // filter on the RENAMED column: exact through the residual
    assert(df.filter($"label" === "s123").collect().map(_.getLong(0)).toSeq === Seq(123L))
    // filter on the untouched column still file-prunes
    GraftScan.lastStatsPruned.set(-1)
    assert(df.filter($"id" >= 300L).count() === 100L)
    assert(GraftScan.lastStatsPruned.get >= 2,
      s"id pruning lost under mapping: ${GraftScan.lastStatsPruned.get}")
  }

  test("COW delete and optimize keep working on a renamed table (new-name DDL)") {
    val d = dir("cow")
    write(d, 30L, "overwrite")
    TrainingData.alterTableRenameColumn(spark, d, "v", "label")
    val ddl = "id BIGINT, label STRING"
    // stale DDL with the OLD name refuses (the rail keys on logical names)
    val e = intercept[Exception] {
      TrainingData.deleteWhere(spark, d, "id BIGINT, v STRING", "id < 5")
    }
    assert(e.getMessage.contains("label"), e.getMessage)
    TrainingData.deleteWhere(spark, d, ddl, "id < 5")
    assert(spark.read.format("graft-json").schema(ddl).load(d).count() === 25L)
    // the rewritten file must carry the PHYSICAL key
    TrainingData.deleteWhereDV(spark, d, ddl, "label = 's7'")
    assert(spark.read.format("graft-json").schema(ddl)
      .option("snapshot", "true").load(d).count() === 24L)
    TrainingData.optimizeTable(spark, d, ddl)
    val got = spark.read.format("graft-json").schema(ddl).load(d)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === (5L until 30L).filterNot(_ == 7L).map(i => (i, s"s$i")))
  }

  test("csv and avro round the mapping too") {
    for (fmt <- Seq("graft-csv", "graft-avro")) {
      val d = dir(s"fmt-${fmt.stripPrefix("graft-")}")
      write(d, 12L, "overwrite", format = fmt)
      TrainingData.alterTableRenameColumn(spark, d, "v", "label")
      write(d, 3L, "append", format = fmt, cols = ("id", "label"))
      val df = spark.read.format(fmt).schema("id BIGINT, label STRING").load(d)
      val got = df.orderBy("id").collect().map(_.getString(1))
      assert(got.length === 15, fmt)
      assert(got.forall(_ != null), s"$fmt lost values under mapping")
    }
  }

  test("refusals: partition columns, collisions, physical-name squatting") {
    val d = dir("rails")
    val s = spark
    import s.implicits._
    (0L until 10L).map(i => (i, i % 2, s"s$i")).toDF("id", "grp", "v")
      .write.format("graft-json").mode("overwrite")
      .option("partitionby", "grp").save(d)
    // partition column
    val e1 = intercept[Exception] {
      TrainingData.alterTableRenameColumn(spark, d, "grp", "bucket")
    }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    // collision with an existing logical name
    val e2 = intercept[Exception] {
      TrainingData.alterTableRenameColumn(spark, d, "v", "id")
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // after v -> label, adding a fresh 'v' squats the physical key: refuse
    TrainingData.alterTableRenameColumn(spark, d, "v", "label")
    val e3 = intercept[Exception] {
      TrainingData.alterTableAddColumn(spark, d, "v", "DOUBLE")
    }
    assert(e3.getMessage.contains("PHYSICAL"), e3.getMessage)
    // a mergeschema append adding 'v' hits the same rail
    val e4 = intercept[Exception] {
      (0L until 2L).map(i => (i, i % 2, s"x$i", 1.5)).toDF("id", "grp", "label", "v")
        .write.format("graft-json").mode("append")
        .option("partitionby", "grp").option("mergeschema", "true").save(d)
    }
    assert(e4.getMessage != null)
    // renaming ANOTHER column onto the reserved physical key: refuse
    TrainingData.alterTableAddColumn(spark, d, "extra", "DOUBLE")
    val e5 = intercept[Exception] {
      TrainingData.alterTableRenameColumn(spark, d, "extra", "v")
    }
    assert(e5.getMessage.contains("PHYSICAL"), e5.getMessage)
  }
}
