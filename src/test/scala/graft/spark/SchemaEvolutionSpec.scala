package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

/** Schema tracking + evolution for the graft table protocol
  * (docs/TABLE_FORMAT.md "Schema tracking"):
  *
  *  - every batch commit records the table schema in its log entry, and a
  *    schemaless read uses it — typed (dates stay dates), zero data bytes
  *    sampled, versionAsOf returns the schema AS OF that version;
  *  - appends are ENFORCED against it: a type change refuses loudly, a
  *    new column requires option("mergeschema","true") and merges in as a
  *    nullable column (old rows read back null), a column the write omits
  *    is fine (new rows read back null);
  *  - the schema survives checkpoint + expireLogHistory, overwrite resets
  *    it, logschema=false opts back into sampling inference, and a
  *    user-provided read schema always wins.
  */
class SchemaEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-schema-evo")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("schema-evolution-spec")
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

  private def v1(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
  }
  private def v2(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((3L, "c", 0.5), (4L, "d", 1.5)).toDF("id", "name", "score")
  }

  test("schemaless read uses the recorded schema: typed, ordered, versioned") {
    val d = dir("basic")
    val s = spark
    import s.implicits._
    // a date column is the acid test: the JSON text serializes it as an
    // ISO string, so sampling inference reads STRING — only the recorded
    // schema can give the date back
    val df = Seq((1L, java.sql.Date.valueOf("2026-01-02")), (2L, null))
      .toDF("id", "d")
      .select($"id", $"d".cast(DateType).as("d"))
    df.write.format("graft-json").mode("overwrite").save(d)

    val back = spark.read.format("graft-json").load(d)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("d", DateType)))
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), Option(r.getDate(1)).map(_.toString))).toSeq ===
      Seq((1L, Some("2026-01-02")), (2L, None)))

    // sampling opt-out: the date column degrades to the string the file holds
    val sampled = spark.read.format("graft-json").option("logschema", "false").load(d)
    assert(sampled.schema("d").dataType === StringType)

    // user-provided schema always wins over the log
    val forced = spark.read.format("graft-json")
      .schema("id INT, d STRING").load(d)
    assert(forced.schema("id").dataType === IntegerType)
  }

  test("mergeschema append: new nullable column, old rows null, time travel keeps the old schema") {
    val d = dir("merge")
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    v2(spark).write.format("graft-json").mode("append")
      .option("mergeschema", "true").save(d)

    val back = spark.read.format("graft-json").load(d)
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    val rows = back.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, "a", null), (2L, "b", null), (3L, "c", 0.5), (4L, "d", 1.5)))

    // schema AS OF version 0: the old two-column world
    val v0 = spark.read.format("graft-json").option("versionAsOf", "0").load(d)
    assert(v0.columns.toSeq === Seq("id", "name"))
    assert(v0.count() === 2)
  }

  test("append with a new column and no mergeschema refuses loudly; nothing is written") {
    val d = dir("refuse-new")
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    val e = intercept[Exception] {
      v2(spark).write.format("graft-json").mode("append").save(d)
    }
    assert(e.getMessage.contains("mergeschema"), e.getMessage)
    assert(spark.read.format("graft-json").load(d).count() === 2)
  }

  test("type change refuses even with mergeschema") {
    val d = dir("refuse-type")
    val s = spark
    import s.implicits._
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    val retyped = Seq(("5", "e")).toDF("id", "name") // id STRING, was BIGINT
    val e = intercept[Exception] {
      retyped.write.format("graft-json").mode("append")
        .option("mergeschema", "true").save(d)
    }
    assert(e.getMessage.contains("type change"), e.getMessage)
  }

  test("numeric widening: int/long appends widen the recorded type; avro refuses") {
    val d = dir("widen")
    val s = spark
    import s.implicits._
    // base table records INT
    Seq((1, 1.5f)).toDF("k", "x").write.format("graft-json").mode("overwrite").save(d)
    assert(spark.read.format("graft-json").load(d).schema("k").dataType === IntegerType)
    // a LONG/DOUBLE append widens the recorded schema (no option needed)
    Seq((2L, 2.5)).toDF("k", "x").write.format("graft-json").mode("append").save(d)
    val widened = spark.read.format("graft-json").load(d)
    assert(widened.schema("k").dataType === LongType)
    assert(widened.schema("x").dataType === DoubleType)
    assert(widened.orderBy("k").select($"k").as[Long].collect().toSeq === Seq(1L, 2L))
    // and the NARROW direction still writes fine (values re-parse wider)
    Seq((3, 3.5f)).toDF("k", "x").write.format("graft-json").mode("append").save(d)
    assert(spark.read.format("graft-json").load(d).count() === 3)
    assert(spark.read.format("graft-json").load(d).schema("k").dataType === LongType)
    // long -> int is NOT a narrowing of the recorded type
    // (recorded stays LONG above); a non-widening change still refuses
    val e = intercept[Exception] {
      Seq(("s", 1.0)).toDF("k", "x").write.format("graft-json").mode("append").save(d)
    }
    assert(e.getMessage.contains("type change"), e.getMessage)

    // avro: binary encodings differ — widening refused
    val ad = dir("widen-avro")
    Seq((1, "a")).toDF("k", "v").write.format("graft-avro").mode("overwrite").save(ad)
    val e2 = intercept[Exception] {
      Seq((2L, "b")).toDF("k", "v").write.format("graft-avro").mode("append").save(ad)
    }
    assert(e2.getMessage.contains("type change"), e2.getMessage)
  }

  test("subset append is fine: omitted column reads back null; column order stays the table's") {
    val d = dir("subset")
    val s = spark
    import s.implicits._
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    // missing 'name'
    Seq(9L).toDF("id").write.format("graft-json").mode("append").save(d)
    val back = spark.read.format("graft-json").load(d)
    assert(back.columns.toSeq === Seq("id", "name"))
    assert(back.filter($"id" === 9L).select($"name").collect().head.isNullAt(0))
  }

  test("overwrite resets the schema; avro records and enforces too") {
    val d = dir("reset")
    val s = spark
    import s.implicits._
    v2(spark).write.format("graft-json").mode("overwrite").save(d)
    // overwrite with a DIFFERENT, incompatible schema is fine
    Seq(("x", 1)).toDF("k", "v").write.format("graft-json").mode("overwrite").save(d)
    assert(spark.read.format("graft-json").load(d).columns.toSeq === Seq("k", "v"))

    val ad = dir("avro")
    Seq((1L, "a")).toDF("id", "name").write.format("graft-avro").mode("overwrite").save(ad)
    val e = intercept[Exception] {
      Seq((2L, "b", 1.0)).toDF("id", "name", "score")
        .write.format("graft-avro").mode("append").save(ad)
    }
    assert(e.getMessage.contains("mergeschema"), e.getMessage)
  }

  test("csv: recorded schema gives typed columns back; merge + old-row nulls") {
    val d = dir("csv")
    v1(spark).write.format("graft-csv").mode("overwrite").save(d)
    v2(spark).write.format("graft-csv").mode("append")
      .option("mergeschema", "true").save(d)
    val back = spark.read.format("graft-csv").load(d)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType)))
    val rows = back.orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, null), (2L, null), (3L, 0.5), (4L, 1.5)))
  }

  test("schema survives checkpoint + expireLogHistory") {
    val d = dir("ckpt")
    val s = spark
    import s.implicits._
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    v2(spark).write.format("graft-json").mode("append")
      .option("mergeschema", "true").save(d)
    (0 until 3).foreach { i =>
      Seq((10L + i, s"r$i", 2.0)).toDF("id", "name", "score")
        .write.format("graft-json").mode("append").save(d)
    }
    graft.api.TrainingData.checkpointLog(spark, d)
    graft.api.TrainingData.expireLogHistory(spark, d)
    val back = spark.read.format("graft-json").load(d)
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    assert(back.schema("score").dataType === DoubleType)
    // the raw pre-checkpoint entries are gone: the schema came from the
    // checkpoint's own `s` line
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = GraftCommitLog.versions(fs, new Path(d))
    assert(vs.min > 0L)
    assert(GraftCommitLog.schemaAsOf(fs, new Path(d), vs.max).isDefined)
  }

  test("partitioned table: recorded schema keeps the logical column order and types") {
    val d = dir("part")
    val s = spark
    import s.implicits._
    Seq((1L, "us", 0.1), (2L, "de", 0.2)).toDF("id", "region", "w")
      .write.format("graft-json").option("partitionby", "region")
      .mode("overwrite").save(d)
    val back = spark.read.format("graft-json").load(d)
    // logical order (id, region, w) — not the inference layout order
    // (data cols then partition cols at the end)
    assert(back.columns.toSeq === Seq("id", "region", "w"))
    assert(back.schema("region").dataType === StringType)
    assert(back.orderBy("id").select($"region").as[String].collect().toSeq === Seq("us", "de"))
    // withFilePath still rides on top of the recorded schema
    val wf = spark.read.format("graft-json").option("withfilepath", "true").load(d)
    assert(wf.columns.toSeq === Seq("id", "region", "w", "_graft_file"))
  }

  test("ALTER add/drop column: schema-only entries, time travel, resurfacing") {
    val d = dir("alter")
    val s = spark
    import s.implicits._
    v2(spark).write.format("graft-json").mode("overwrite").save(d) // v0: (id,name,score)
    graft.api.TrainingData.alterTableDropColumn(spark, d, "score") // v1
    assert(spark.read.format("graft-json").load(d).columns.toSeq === Seq("id", "name"))
    // time travel BEFORE the drop still reads the column — logical drop
    val v0 = spark.read.format("graft-json").option("versionAsOf", "0").load(d)
    assert(v0.columns.contains("score"))
    assert(v0.filter($"score".isNotNull).count() === 2)
    graft.api.TrainingData.alterTableAddColumn(spark, d, "rank", "BIGINT") // v2
    val withRank = spark.read.format("graft-json").load(d)
    assert(withRank.columns.toSeq === Seq("id", "name", "rank"))
    assert(withRank.filter($"rank".isNull).count() === 2)
    // re-adding the dropped NAME resurfaces the old values — the
    // documented text-format deviation from Delta's column-mapping drop
    graft.api.TrainingData.alterTableAddColumn(spark, d, "score", "DOUBLE")
    assert(spark.read.format("graft-json").load(d)
      .filter($"score".isNotNull).count() === 2)
    // refusals: duplicate add, unknown drop, append that still carries a
    // dropped column needs mergeschema (it is a NEW column again)
    intercept[Exception] {
      graft.api.TrainingData.alterTableAddColumn(spark, d, "id", "BIGINT")
    }
    intercept[Exception] {
      graft.api.TrainingData.alterTableDropColumn(spark, d, "nope")
    }
  }

  test("a schema conflict on a plain batch append is LOUD, never silently unlogged") {
    val d = dir("conflict-loud")
    v1(spark).write.format("graft-json").mode("overwrite").save(d) // records (id,name)
    // a schema-CHANGING commit (ours != base) whose base no longer
    // matches the record: append() must rethrow — swallowing it would
    // report success while the files stay unlogged (vacuumOrphans food)
    val stale = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    val ours = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, extra DOUBLE")
    val e = intercept[java.util.ConcurrentModificationException] {
      GraftCommitLog.append(spark.sparkContext.hadoopConfiguration, d,
        Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
          GraftCommit("phantom.jsonl")),
        Nil, ours, stale)
    }
    assert(e.getMessage.contains("UNLOGGED"), e.getMessage)
  }

  test("append to an existing UNTRACKED directory does not start tracking") {
    val d = dir("legacy")
    val s = spark
    import s.implicits._
    v2(spark).write.format("graft-json").mode("overwrite").save(d)
    // simulate a legacy table: the log predates schema tracking
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(GraftCommitLog.logDir(new Path(d)), true)
    // a SUBSET append must not record (a,b) as the table schema — the
    // older files' third column would vanish from schemaless reads
    Seq((9L, "z")).toDF("id", "name").write.format("graft-json").mode("append").save(d)
    val back = spark.read.format("graft-json").load(d)
    assert(back.columns.toSet === Set("id", "name", "score"))
    assert(back.filter($"score".isNotNull).count() === 2)
    assert(GraftCommitLog.schemaAsOf(fs, new Path(d),
      GraftCommitLog.versions(fs, new Path(d)).max).isEmpty)
  }

  test("schema conflict policy: plain appends defer, schema-changers abort") {
    val d = dir("lost-update")
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    v2(spark).write.format("graft-json").mode("append")
      .option("mergeschema", "true").save(d) // records (id, name, score)
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def recorded = GraftCommitLog.schemaAsOf(fs, new Path(d),
      GraftCommitLog.versions(fs, new Path(d)).max).get
    // a PLAIN append that resolved before the merge (base == ours == the
    // old 2-column schema): its entry lands WITHOUT a schema line — the
    // mergeschema-added column survives, nothing regresses
    val stale = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING")
    GraftCommitLog.appendEntry(spark.sparkContext.hadoopConfiguration, d,
      adds = Seq("racer.jsonl.phantom"), schema = stale, schemaBase = stale)
    assert(recorded.fieldNames.toSeq === Seq("id", "name", "score"))
    // a SCHEMA-CHANGING commit resolved against the stale base (ours !=
    // base != cur) must abort loudly instead of silently rewriting the
    // record either way
    val staleChanged = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, extra DOUBLE")
    intercept[java.util.ConcurrentModificationException] {
      GraftCommitLog.appendEntry(spark.sparkContext.hadoopConfiguration, d,
        adds = Seq("racer2.jsonl.phantom"), schema = staleChanged,
        schemaBase = stale)
    }
    assert(recorded.fieldNames.toSeq === Seq("id", "name", "score"))
    // ...and a racing ALTER DROP is equally protected: a plain append
    // resolved pre-drop cannot resurrect the dropped column
    graft.api.TrainingData.alterTableDropColumn(spark, d, "score")
    val preDrop = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, score DOUBLE")
    GraftCommitLog.appendEntry(spark.sparkContext.hadoopConfiguration, d,
      adds = Seq("racer3.jsonl.phantom"), schema = preDrop, schemaBase = preDrop)
    assert(recorded.fieldNames.toSeq === Seq("id", "name"))
  }

  test("schemaAsOf survives a corrupt checkpoint (older s-lines still found)") {
    val d = dir("ckpt-corrupt")
    v2(spark).write.format("graft-json").mode("overwrite").save(d) // v0 has `s`
    graft.api.TrainingData.checkpointLog(spark, d) // checkpoint at v0, with schema
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ck = GraftCommitLog.checkpointFile(new Path(d), 0L)
    val out = fs.create(ck, true)
    try out.write("#### corrupt ####\n".getBytes("UTF-8")) finally out.close()
    // schema-less raw commits on top (direct appendEntry records no `s`)
    GraftCommitLog.appendEntry(spark.sparkContext.hadoopConfiguration, d,
      adds = Seq("x.jsonl.phantom"))
    // the suffix has no schema lines and the checkpoint is unreadable —
    // the fallback walks the pre-checkpoint raw entries
    val recorded = GraftCommitLog.schemaAsOf(fs, new Path(d),
      GraftCommitLog.versions(fs, new Path(d)).max)
    assert(recorded.exists(_.fieldNames.toSeq === Seq("id", "name", "score")))
  }

  test("COW maintenance with a stale DDL refuses (silent column loss rail)") {
    val d = dir("cow-stale")
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    v2(spark).write.format("graft-json").mode("append")
      .option("mergeschema", "true").save(d)
    assert(graft.api.TrainingData.tableSchema(spark, d).get.fieldNames.toSeq ===
      Seq("id", "name", "score"))
    val e = intercept[Exception] {
      graft.api.TrainingData.deleteWhere(spark, d,
        "id BIGINT, name STRING", "id = 3") // misses 'score'
    }
    assert(e.getMessage.contains("score"), e.getMessage)
    // nothing was rewritten
    assert(spark.read.format("graft-json").load(d).count() === 4)
  }

  test("COW maintenance on an evolved table keeps the merged schema") {
    val d = dir("cow")
    v1(spark).write.format("graft-json").mode("overwrite").save(d)
    v2(spark).write.format("graft-json").mode("append")
      .option("mergeschema", "true").save(d)
    graft.api.TrainingData.deleteWhere(spark, d,
      "id BIGINT, name STRING, score DOUBLE", "id = 3")
    val back = spark.read.format("graft-json").load(d)
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    assert(back.count() === 3)
    val s = spark
    import s.implicits._
    assert(!back.select($"id").as[Long].collect().contains(3L))
  }
}
