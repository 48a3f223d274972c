package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.Files

import graft.api.TrainingData

/** The maintenance-SQL front (GraftSqlParser via GraftSparkExtensions):
  * DESCRIBE HISTORY / RESTORE / OPTIMIZE / VACUUM / DELETE / UPDATE over
  * graft-logged table paths, routed to the TrainingData machinery —
  * results must match the API row-for-row; everything else delegates.
  */
class SqlMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val root = Files.createTempDirectory("graft-sqlmaint")
  private val schema = "id BIGINT, v STRING"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sql-maintenance-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
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

  private def writeTable(d: String, n: Long = 100L, parts: Int = 2,
      format: String = "graft-json"): Unit = {
    val s = spark
    import s.implicits._
    (0L until n).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(parts).write.format(format).mode("overwrite").save(d)
  }

  private def snapIds(d: String, format: String = "graft-json"): Seq[Long] =
    spark.read.format(format).schema(schema).option("snapshot", "true")
      .load(d).collect().map(_.getLong(0)).sorted.toSeq

  test("DELETE FROM '<path>' WHERE routes to deleteWhereDV (schema+format from the log)") {
    val d = dir("del")
    writeTable(d)
    val out = spark.sql(s"DELETE FROM '$d' WHERE id % 10 = 0").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L), "both files get vectors")
    assert(snapIds(d) === (0L until 100L).filterNot(_ % 10 == 0))
    // the delete landed as vectors (merge-on-read), not a rewrite
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = GraftCommitLog.liveStateAsOf(fs,
      new org.apache.hadoop.fs.Path(d), 1L)
    assert(state.values.forall(_ != null))
  }

  test("UPDATE '<path>' SET ... WHERE routes to updateWhereDV; WHERE is mandatory") {
    val d = dir("upd")
    writeTable(d)
    spark.sql(s"UPDATE '$d' SET v = concat(v, '!') WHERE id < 5")
    val got = spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === (0L until 100L).map(i => (i, if (i < 5) s"r$i!" else s"r$i")))
    // multi-assignment with a function call containing commas and a
    // quoted WHERE inside a string literal — the top-level splitter only
    val d2 = dir("upd2")
    writeTable(d2, n = 10L, parts = 1)
    spark.sql(s"UPDATE '$d2' SET v = concat(v, ',', 'WHERE'), id = id + 100 WHERE id = 3")
    val got2 = spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got2.contains((103L, "r3,WHERE")), got2.mkString(", "))
    val e = intercept[Exception] { spark.sql(s"UPDATE '$d2' SET v = 'x'") }
    assert(e.getMessage.contains("WHERE"), e.getMessage)
  }

  test("DESCRIBE HISTORY matches tableHistory row-for-row") {
    val d = dir("hist")
    writeTable(d)
    spark.sql(s"DELETE FROM '$d' WHERE id = 7")
    val viaSql = spark.sql(s"DESCRIBE HISTORY '$d'").collect().toSeq
    val viaApi = TrainingData.tableHistory(spark, d).collect().toSeq
    assert(viaSql === viaApi)
    assert(viaSql.map(_.getString(2)) === Seq("delete-vector", "append"))
  }

  test("RESTORE TABLE TO VERSION/TIMESTAMP matches restoreTable semantics") {
    val d = dir("restore")
    val conf = spark.sparkContext.hadoopConfiguration
    val tsKey = GraftCommitLog.CommitTimestampKey
    try {
      conf.setLong(tsKey, 1000L); writeTable(d)                       // v0
      conf.setLong(tsKey, 2000L)
      spark.sql(s"DELETE FROM '$d' WHERE id >= 50")                   // v1
      conf.setLong(tsKey, 3000L)
      val v = spark.sql(s"RESTORE TABLE '$d' TO VERSION AS OF 0").collect()
      assert(v.map(_.getLong(0)).toSeq === Seq(2L))
      assert(snapIds(d) === (0L until 100L))
      // timestamp form: at/after the latest commit clamps to a no-op (-1)
      val noop = spark.sql(s"RESTORE TABLE '$d' TO TIMESTAMP AS OF 9000")
        .collect()
      assert(noop.map(_.getLong(0)).toSeq === Seq(-1L))
      // and a mid-history timestamp restores the version it resolves to
      conf.setLong(tsKey, 4000L)
      val back = spark.sql(s"RESTORE TABLE '$d' TO TIMESTAMP AS OF 2500")
        .collect()
      assert(back.map(_.getLong(0)).toSeq === Seq(3L))
      assert(snapIds(d) === (0L until 50L))
    } finally conf.unset(tsKey)
  }

  test("OPTIMIZE compacts and purges vectors; VACUUM reports orphans") {
    val d = dir("opt")
    writeTable(d, parts = 3)
    spark.sql(s"DELETE FROM '$d' WHERE id % 3 = 0")
    val n = spark.sql(s"OPTIMIZE '$d'").collect()
    assert(n.head.getLong(0) > 0L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootP = new org.apache.hadoop.fs.Path(d)
    val state = GraftCommitLog.liveStateAsOf(fs, rootP,
      GraftCommitLog.versions(fs, rootP).max)
    assert(state.values.forall(_ == null), "OPTIMIZE must purge the masks")
    assert(snapIds(d) === (0L until 100L).filterNot(_ % 3 == 0))
    // plant an orphan; DRY RUN lists it without touching it, VACUUM removes
    val orphan = new org.apache.hadoop.fs.Path(d, "rogue.json")
    val out = fs.create(orphan, true)
    try out.write("{\"id\": 999, \"v\": \"x\"}\n".getBytes("UTF-8"))
    finally out.close()
    val dry = spark.sql(s"VACUUM '$d' DRY RUN").collect().map(_.getString(0))
    assert(dry.toSeq === Seq("rogue.json"))
    assert(fs.exists(orphan), "DRY RUN must not delete")
    val gone = spark.sql(s"VACUUM '$d'").collect().map(_.getString(0))
    assert(gone.toSeq === Seq("rogue.json"))
    assert(!fs.exists(orphan))
  }

  test("OPTIMIZE WHERE scopes to partitions; ZORDER BY clusters") {
    val d = dir("optwhere")
    val s = spark
    import s.implicits._
    (0L until 60L).map(i => (i, s"r$i", i % 3)).toDF("id", "v", "k")
      .repartition(2)
      .write.format("graft-json").option("partitionby", "k")
      .mode("overwrite").save(d)
    val viaSql = spark.sql(s"OPTIMIZE '$d' WHERE k = 1").collect()
      .head.getLong(0)
    assert(viaSql > 0L, "the k=1 partition must compact")
    val got = spark.read.format("graft-json")
      .schema("id BIGINT, v STRING, k BIGINT").option("snapshot", "true")
      .load(d).collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 60L))
    // zorder form parses and runs (clustering correctness is covered by
    // OptimizeScopeSpec; here the SQL surface must route the columns)
    val d2 = dir("optz")
    writeTable(d2, parts = 3)
    assert(spark.sql(s"OPTIMIZE '$d2' ZORDER BY (id)").collect()
      .head.getLong(0) > 0L)
    assert(snapIds(d2) === (0L until 100L))
  }

  test("format resolves from the live files: avro and csv tables route too") {
    val d = dir("avro")
    writeTable(d, format = "graft-avro")
    spark.sql(s"DELETE FROM '$d' WHERE id % 4 = 1")
    assert(snapIds(d, "graft-avro") === (0L until 100L).filterNot(_ % 4 == 1))
    val dc = dir("csv")
    writeTable(dc, format = "graft-csv")
    spark.sql(s"UPDATE '$dc' SET v = upper(v) WHERE id < 3")
    val got = spark.read.format("graft-csv").schema(schema)
      .option("snapshot", "true").load(dc)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got.take(3) === Seq((0L, "R0"), (1L, "R1"), (2L, "R2")))
  }

  test("DELETE/UPDATE predicates on partition columns work (phase-1 serves k=v)") {
    val d = dir("partpred")
    val s = spark
    import s.implicits._
    (0L until 60L).map(i => (i, s"r$i", i % 3)).toDF("id", "v", "k")
      .repartition(2)
      .write.format("graft-json").option("partitionby", "k")
      .mode("overwrite").save(d)
    // the resolved DDL excludes k (it is a layout column), but the
    // phase-1 scan serves it from the k=v directories — the most common
    // maintenance predicate shape must resolve
    spark.sql(s"DELETE FROM '$d' WHERE k = 1")
    val after = spark.read.format("graft-json")
      .schema("id BIGINT, v STRING, k BIGINT").option("snapshot", "true")
      .load(d).collect().map(_.getLong(0)).sorted.toSeq
    assert(after === (0L until 60L).filterNot(_ % 3 == 1))
    // mixed data + partition predicate, and SET against it
    spark.sql(s"UPDATE '$d' SET v = concat(v, '+') WHERE k = 2 AND id < 10")
    val got = spark.read.format("graft-json")
      .schema("id BIGINT, v STRING, k BIGINT").option("snapshot", "true")
      .load(d).collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === (0L until 60L).filterNot(_ % 3 == 1).map(i =>
      (i, if (i % 3 == 2 && i < 10) s"r$i+" else s"r$i")))
    // duplicate SET targets are rejected, not silently last-wins
    val e = intercept[Exception] {
      spark.sql(s"UPDATE '$d' SET v = 'a', v = 'b' WHERE id = 0")
    }
    assert(e.getMessage.contains("more than once"), e.getMessage)
  }

  test("MERGE INTO upserts by key (whenMatched replace, whenNotMatched insert)") {
    val d = dir("merge")
    writeTable(d, n = 10L, parts = 1)
    val n = spark.sql(
      s"""MERGE INTO '$d'
         |USING (SELECT id, concat('new-', CAST(id AS STRING)) AS v
         |       FROM range(8, 12)) ON (id)""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 4L)
    val got = spark.read.format("graft-json").schema(schema)
      .option("snapshot", "true").load(d)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === (0L until 12L).map(i =>
      (i, if (i >= 8) s"new-$i" else s"r$i")))
    // parity with the API on a fresh twin table
    val d2 = dir("merge-api")
    writeTable(d2, n = 10L, parts = 1)
    TrainingData.upsert(spark, d2, schema,
      spark.sql("SELECT id, concat('new-', CAST(id AS STRING)) AS v FROM range(8, 12)"),
      Seq("id"))
    assert(snapIds(d2) === snapIds(d))
  }

  test("ALTER TABLE path dialect: ADD / RENAME / DROP COLUMN route to the log") {
    val d = dir("alter")
    writeTable(d, n = 10L, parts = 1)
    assert(spark.sql(s"ALTER TABLE '$d' ADD COLUMN score DOUBLE")
      .collect().head.getLong(0) === 1L)
    val withNew = spark.read.format("graft-json")
      .schema("id BIGINT, v STRING, score DOUBLE").option("snapshot", "true")
      .load(d)
    assert(withNew.count() === 10L)
    assert(withNew.filter("score IS NULL").count() === 10L,
      "pre-ALTER rows serve the added column as NULL")
    assert(spark.sql(s"ALTER TABLE '$d' RENAME COLUMN v TO body")
      .collect().head.getLong(0) === 2L)
    val renamed = TrainingData.tableSchema(spark, d).get
    assert(renamed.fieldNames.toSeq === Seq("id", "body", "score"))
    assert(spark.sql(s"ALTER TABLE '$d' DROP COLUMN score")
      .collect().head.getLong(0) === 3L)
    assert(TrainingData.tableSchema(spark, d).get.fieldNames.toSeq ===
      Seq("id", "body"))
  }

  test("REORG TABLE APPLY (PURGE) materializes deletion vectors") {
    val d = dir("reorg")
    writeTable(d, parts = 2)
    spark.sql(s"DELETE FROM '$d' WHERE id % 10 = 0")
    assert(spark.sql(s"REORG TABLE '$d' APPLY (PURGE)")
      .collect().head.getLong(0) === 2L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootP = new org.apache.hadoop.fs.Path(d)
    val state = GraftCommitLog.liveStateAsOf(fs, rootP,
      GraftCommitLog.versions(fs, rootP).max)
    assert(state.values.forall(_ == null), "masks must be gone after purge")
    assert(snapIds(d) === (0L until 100L).filterNot(_ % 10 == 0))
  }

  test("DELETE FROM a CATALOG graft table routes through SupportsDelete") {
    val d = dir("catalog-del")
    writeTable(d)
    spark.sql("DROP TABLE IF EXISTS graft_del_t")
    spark.sql(s"""CREATE TABLE graft_del_t (id BIGINT, v STRING)
                 |USING `graft-json` LOCATION '$d'""".stripMargin)
    try {
      // the standard SQL form — no path dialect, no API
      spark.sql("DELETE FROM graft_del_t WHERE id % 10 = 0 OR v = 'r7'")
      assert(snapIds(d) ===
        (0L until 100L).filterNot(i => i % 10 == 0 || i == 7))
      // it landed as merge-on-read vectors, not a rewrite
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rootP = new org.apache.hadoop.fs.Path(d)
      val state = GraftCommitLog.liveStateAsOf(fs, rootP,
        GraftCommitLog.versions(fs, rootP).max)
      assert(state.values.exists(_ != null))
      // string ops and IN render too
      spark.sql("DELETE FROM graft_del_t WHERE v LIKE 'r1%' AND id IN (11, 12)")
      assert(!snapIds(d).contains(11L) && !snapIds(d).contains(12L))
      assert(snapIds(d).contains(13L))
      // an unconditioned DELETE empties the table (truncate semantics)
      spark.sql("DELETE FROM graft_del_t")
      assert(snapIds(d).isEmpty)
      // TRUNCATE TABLE rides the same hook (TruncatableTable default)
      writeTable(d)
      spark.sql("TRUNCATE TABLE graft_del_t")
      assert(snapIds(d).isEmpty)
    } finally spark.sql("DROP TABLE graft_del_t")
    // avro twin through the same hook
    val da = dir("catalog-del-avro")
    writeTable(da, format = "graft-avro")
    spark.sql("DROP TABLE IF EXISTS graft_del_a")
    spark.sql(s"""CREATE TABLE graft_del_a (id BIGINT, v STRING)
                 |USING `graft-avro` LOCATION '$da'""".stripMargin)
    try {
      spark.sql("DELETE FROM graft_del_a WHERE id >= 90")
      assert(snapIds(da, "graft-avro") === (0L until 90L))
    } finally spark.sql("DROP TABLE graft_del_a")
  }

  test("catalog DELETE literal rendering round-trips quotes and backslashes") {
    val d = dir("catalog-esc")
    val s = spark
    import s.implicits._
    Seq((1L, """a\b"""), (2L, "o'clock"), (3L, "plain"))
      .toDF("id", "v").repartition(1)
      .write.format("graft-json").mode("overwrite").save(d)
    spark.sql("DROP TABLE IF EXISTS graft_esc_t")
    spark.sql(s"""CREATE TABLE graft_esc_t (id BIGINT, v STRING)
                 |USING `graft-json` LOCATION '$d'""".stripMargin)
    try {
      // the condition's literals contain a backslash and a quote: the
      // V2→SQL rendering must re-escape them for Spark's lexer or the
      // delete would miss (or throw) — and startswith routes through the
      // function form, not LIKE-ESCAPE
      spark.sql("""DELETE FROM graft_esc_t WHERE v = 'a\\b' OR v LIKE 'o\'%'""")
      assert(snapIds(d) === Seq(3L))
    } finally spark.sql("DROP TABLE graft_esc_t")
  }

  test("catalog DELETE precedence and typed literals render exactly") {
    val d = dir("catalog-prec")
    val s = spark
    import s.implicits._
    Seq((1L, "x", 1.1f), (1L, "y", 2.5f), (2L, "x", 1.1f), (3L, "x", 1.1f))
      .toDF("id", "v", "f").repartition(1)
      .write.format("graft-json").mode("overwrite").save(d)
    spark.sql("DROP TABLE IF EXISTS graft_prec_t")
    spark.sql(s"""CREATE TABLE graft_prec_t (id BIGINT, v STRING, f FLOAT)
                 |USING `graft-json` LOCATION '$d'""".stripMargin)
    def rows() = spark.read.format("graft-json")
      .schema("id BIGINT, v STRING, f FLOAT").option("snapshot", "true")
      .load(d).collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    try {
      // an OR conjunct next to an AND conjunct: the rendered conjuncts
      // must parenthesize or precedence misparses as
      // id=1 OR (id=2 AND v='x') and over-deletes (1,'y')
      spark.sql("DELETE FROM graft_prec_t WHERE (id = 1 OR id = 2) AND v = 'x'")
      assert(rows() === Seq((1L, "y"), (3L, "x")))
      // a FLOAT literal must compare in float space: a bare '1.1' would
      // re-parse as decimal, promote the comparison to double, and the
      // widened float (1.100000023...) would never match — an under-delete
      spark.sql("DELETE FROM graft_prec_t WHERE f = CAST('1.1' AS FLOAT)")
      assert(rows() === Seq((1L, "y")))
    } finally spark.sql("DROP TABLE graft_prec_t")
  }

  test("unrecognized SQL delegates verbatim; logless dirs refuse loudly") {
    assert(spark.sql("SELECT 1 + 1 AS x").collect().head.getInt(0) === 2)
    // a DELETE against a real catalog table still parses through Spark
    // (our grammar only claims single-quoted path targets)
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM '${dir("nolog")}' WHERE id = 1").collect()
    }
    assert(e.getMessage.contains("commit log"), e.getMessage)
    // path escaping: a '' in the literal unquotes to one ' in the path
    // (the error names the unescaped path — proof the unquote ran)
    val e2 = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY '/tmp/graft o''clock'").collect()
    }
    assert(e2.getMessage.contains("/tmp/graft o'clock"), e2.getMessage)
  }

  // ------------------------------------------------- catalog-name dialect

  private def createCatalogTable(name: String, d: String,
      format: String = "graft-json"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"""CREATE TABLE $name (id BIGINT, v STRING)
                 |USING `$format` LOCATION '$d'""".stripMargin)
  }

  test("catalog-name addressing: every verb resolves the table's location") {
    val d = dir("byname")
    writeTable(d)                                                   // v0
    createCatalogTable("graft_nm", d)
    try {
      // UPDATE by name (Spark parses UPDATE but cannot execute it on
      // this table; our claim routes it to updateWhereDV)
      spark.sql("UPDATE graft_nm SET v = 'upd' WHERE id < 10")       // v1
      assert(spark.read.format("graft-json").schema(schema)
        .option("snapshot", "true").load(d)
        .filter("v = 'upd'").count() === 10L)
      // DESCRIBE HISTORY by name matches the path dialect row-for-row
      val byName = spark.sql("DESCRIBE HISTORY graft_nm").collect().toSeq
      val byPath = spark.sql(s"DESCRIBE HISTORY '$d'").collect().toSeq
      assert(byName === byPath)
      // RESTORE by (db-qualified, backticked) name
      val rv = spark.sql(
        "RESTORE TABLE spark_catalog.default.`graft_nm` TO VERSION AS OF 0")
        .collect().head.getLong(0)
      assert(rv === 2L)
      assert(snapIds(d) === (0L until 100L))
      // MERGE by name (not valid Spark grammar — ours claims it)
      spark.sql("MERGE INTO graft_nm USING " +
        "(SELECT CAST(200 AS BIGINT) AS id, 'new' AS v) ON (id)")    // v3
      assert(snapIds(d).contains(200L))
      // OPTIMIZE / VACUUM / REORG by name
      assert(spark.sql("OPTIMIZE default.graft_nm").collect().head.getLong(0) >= 0L)
      assert(spark.sql("VACUUM graft_nm DRY RUN").collect() !== null)
      assert(spark.sql("REORG TABLE graft_nm APPLY (PURGE)")
        .collect().head.getLong(0) >= 0L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_nm")
  }

  test("name-addressed ALTER evolves the log AND the catalog entry") {
    val d = dir("byname_alter")
    writeTable(d)
    createCatalogTable("graft_nma", d)
    try {
      spark.sql("ALTER TABLE graft_nma ADD COLUMN score DOUBLE")
      assert(spark.table("graft_nma").schema.fieldNames.toSeq ===
        Seq("id", "v", "score"),
        "catalog entry must learn the added column")
      assert(TrainingData.tableSchema(spark, d).get.fieldNames.contains("score"),
        "commit log must record the added column")
      spark.sql("ALTER TABLE graft_nma RENAME COLUMN score TO quality")
      assert(spark.table("graft_nma").schema.fieldNames.contains("quality"))
      // by-name read resolves renamed columns through column mapping
      assert(spark.sql("SELECT id, quality FROM graft_nma WHERE id < 3")
        .count() === 3L)
      spark.sql("ALTER TABLE graft_nma DROP COLUMN quality")
      assert(spark.table("graft_nma").schema.fieldNames.toSeq === Seq("id", "v"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_nma")
  }

  test("existing non-graft names delegate; missing names refuse targeted") {
    spark.sql("DROP TABLE IF EXISTS plain_pq")
    spark.sql(s"CREATE TABLE plain_pq (id BIGINT) USING parquet " +
      s"LOCATION '${dir("plain_pq")}'")
    try {
      // a name that EXISTS as someone else's table delegates — another
      // parser extension (Delta, say) must get to handle its own tables;
      // here the delegate is Spark, whose parser rejects the verb
      val e = intercept[Exception] {
        spark.sql("DESCRIBE HISTORY plain_pq").collect()
      }
      assert(!e.getMessage.contains("graft"), e.getMessage)
      // a MISSING name refuses with the targeted message (a typo must
      // not surface as a bare syntax error)
      val e2 = intercept[IllegalArgumentException] {
        spark.sql("OPTIMIZE no_such_table_xyz").collect()
      }
      assert(e2.getMessage.contains("does not name a table"), e2.getMessage)
      // Spark-parseable verb on a non-graft table: delegates (Spark's own
      // error, not our refusal)
      val e3 = intercept[Exception] {
        spark.sql("UPDATE plain_pq SET id = 1 WHERE id = 2").collect()
      }
      assert(!e3.getMessage.contains("graft"), e3.getMessage)
      // a temp view shadowing a name is never a maintenance target:
      // delegates like any other non-graft name
      spark.range(3).createOrReplaceTempView("shadow_v")
      val e4 = intercept[Exception] {
        spark.sql("VACUUM shadow_v").collect()
      }
      assert(!e4.getMessage.contains("graft"), e4.getMessage)
      spark.catalog.dropTempView("shadow_v")
    } finally spark.sql("DROP TABLE IF EXISTS plain_pq")
  }

  test("DESCRIBE DETAIL: format/version/files/dvs/bytes/partitions, by path and by name") {
    val d = dir("detail")
    writeTable(d, n = 60L, parts = 3)                               // v0
    TrainingData.deleteWhereDV(spark, d, schema, "id = 7")          // v1: 1 dv
    val row = spark.sql(s"DESCRIBE DETAIL '$d'").collect().head
    assert(row.getString(0) === "graft-json")
    assert(row.getLong(2) === 1L, "latest version")
    assert(row.getLong(3) === 3L, "live files")
    assert(row.getLong(4) === 1L, "one attached deletion vector")
    assert(row.getLong(5) > 0L, "live bytes")
    assert(row.getString(6) === "", "unpartitioned")
    assert(row.getString(7).contains("id BIGINT"))
    // by catalog name: same row, location resolved from the catalog
    createCatalogTable("graft_detail_nm", d)
    try {
      val byName = spark.sql("DESCRIBE DETAIL graft_detail_nm").collect().head
      assert(byName === row)
    } finally spark.sql("DROP TABLE IF EXISTS graft_detail_nm")
    // partitioned layout reports its k=v columns
    val dp = dir("detail_part")
    val s = spark
    import s.implicits._
    (0L until 40L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "seg")
      .write.format("graft-json").option("partitionby", "seg")
      .mode("overwrite").save(dp)
    val prow = spark.sql(s"DESCRIBE DETAIL '$dp'").collect().head
    assert(prow.getString(6) === "seg")
    assert(!prow.getString(7).contains("seg"),
      "layout k=v columns stay out of the data DDL")
  }

  test("CLONE TABLE: deep fork at a pinned version, fully independent") {
    val d = dir("clone_src")
    val d2 = dir("clone_dst")
    val d3 = dir("clone_dst_v1")
    writeTable(d, n = 60L, parts = 2)                                // v0
    TrainingData.deleteWhereDV(spark, d, schema, "id < 10")          // v1
    val s = spark
    import s.implicits._
    (60L until 80L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(1).write.format("graft-json").mode("append").save(d) // v2
    // clone LATEST: masks and the appended batch both ride along
    assert(spark.sql(s"CLONE TABLE '$d' TO '$d2'").collect().head.getLong(0) === 0L)
    assert(snapIds(d2) === (10L until 80L), "clone = source latest snapshot")
    // clone an OLDER pinned version
    spark.sql(s"CLONE TABLE '$d' TO '$d3' VERSION AS OF 1")
    assert(snapIds(d3) === (10L until 60L), "pinned clone = snapshot at v1")
    // fresh history: one clone-tagged entry
    val hist = spark.sql(s"DESCRIBE HISTORY '$d2'").collect()
    assert(hist.length === 1 && hist.head.getString(2).startsWith("clone"),
      hist.map(_.getString(2)).mkString(","))
    // stats sidecars rode along (acceleration without a rebuild)
    val fs = new org.apache.hadoop.fs.Path(d2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val copied = fs.listStatus(new org.apache.hadoop.fs.Path(d2))
      .map(_.getPath.getName).filter(_.endsWith(".stats"))
    assert(copied.nonEmpty, "sidecars must ride along")
    // independence both ways
    spark.sql(s"DELETE FROM '$d2' WHERE id >= 70")
    assert(snapIds(d2) === (10L until 70L))
    assert(snapIds(d) === (10L until 80L), "source untouched by clone-side delete")
    TrainingData.deleteWhereDV(spark, d, schema, "id = 15")
    assert(snapIds(d2) === (10L until 70L), "clone untouched by source-side delete")
    // a non-empty target refuses
    val e = intercept[Exception] {
      spark.sql(s"CLONE TABLE '$d' TO '$d2'").collect()
    }
    assert(e.getMessage.contains("must not exist"), e.getMessage)
    // by-name source works like any other verb
    createCatalogTable("graft_clone_nm", d)
    try {
      val d4 = dir("clone_dst_nm")
      spark.sql(s"CLONE TABLE graft_clone_nm TO '$d4'")
      assert(snapIds(d4) === snapIds(d))
    } finally spark.sql("DROP TABLE IF EXISTS graft_clone_nm")
  }

  test("CLONE is format-agnostic and carries column mapping") {
    // avro: the binary lane clones byte-for-byte like the text lanes
    val a = dir("clone_avro_src"); val a2 = dir("clone_avro_dst")
    writeTable(a, n = 30L, parts = 2, format = "graft-avro")
    TrainingData.deleteWhereDV(spark, a, schema, "id = 3", format = "graft-avro")
    spark.sql(s"CLONE TABLE '$a' TO '$a2'")
    assert(snapIds(a2, "graft-avro") === (0L until 30L).filterNot(_ == 3L))
    // column mapping: a RENAMEd column's physical name metadata rides the
    // copied schema line, so the clone reads old files under the new name
    val m = dir("clone_map_src"); val m2 = dir("clone_map_dst")
    writeTable(m, n = 10L, parts = 1)
    TrainingData.alterTableRenameColumn(spark, m, "v", "label")
    spark.sql(s"CLONE TABLE '$m' TO '$m2'")
    val got = spark.read.format("graft-json").option("snapshot", "true")
      .load(m2) // schemaless: the clone's RECORDED schema resolves it
      .selectExpr("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === (0L until 10L).map(i => (i, s"r$i")))
  }

  test("table_changes TVF: the change feed from pure SQL, composable") {
    val d = dir("tvf_cdf")
    writeTable(d, n = 20L, parts = 1)                                 // v0
    spark.sql(s"DELETE FROM '$d' WHERE id < 3")                       // v1 (DV)
    val s = spark
    import s.implicits._
    (20L until 25L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(1).write.format("graft-json").mode("append").save(d) // v2
    // matches the API row-for-row
    val viaSql = spark.sql(s"SELECT * FROM table_changes('$d', 0)")
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    val viaApi = TrainingData.changeFeed(spark, d, schema, 0L)
      .collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
    assert(viaSql === viaApi)
    assert(viaSql.filter(_._2 == "delete").map(_._1) === Seq(0L, 1L, 2L))
    assert(viaSql.filter(_._2 == "insert").map(_._1) === (20L until 25L))
    // bounded form + composes under ordinary SQL
    val bounded = spark.sql(
      s"""SELECT count(*) AS n FROM table_changes('$d', 0, 1)
         |WHERE _change_type = 'delete'""".stripMargin)
      .collect().head.getLong(0)
    assert(bounded === 3L)
    // by catalog name — including qualified and backticked forms, which
    // ride the SAME resolution seam as the SQL verbs (resolveRef)
    createCatalogTable("graft_tvf_nm", d)
    try {
      assert(spark.sql("SELECT count(*) FROM table_changes('graft_tvf_nm', 1)")
        .collect().head.getLong(0) === 5L)
      assert(spark.sql(
        "SELECT count(*) FROM table_changes('spark_catalog.default.graft_tvf_nm', 1)")
        .collect().head.getLong(0) === 5L)
      assert(spark.sql(
        "SELECT count(*) FROM table_changes('default.`graft_tvf_nm`', 1)")
        .collect().head.getLong(0) === 5L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_tvf_nm")
    // non-graft name refuses with the targeted message
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('no_such_tbl_xyz', 0)").collect()
    }
    assert(e.getMessage.contains("not a graft-provider"), e.getMessage)
  }

  test("VACUUM RETAIN n HOURS: retention-gated reclaim of retired files") {
    val d = dir("vac_retain")
    val conf = spark.sparkContext.hadoopConfiguration
    val tsKey = GraftCommitLog.CommitTimestampKey
    try {
      conf.setLong(tsKey, 0L)
      writeTable(d, n = 20L, parts = 1)                                // v0: file A
      conf.setLong(tsKey, 1000L)
      TrainingData.deleteWhere(spark, d, schema, "id < 5",
        retainHistory = true)                                          // v1: retires A
      conf.setLong(tsKey, 2L * 3600000L + 2000L)
      TrainingData.deleteWhere(spark, d, schema, "id >= 15",
        retainHistory = true)                                          // v2: retires A'
      conf.setLong(tsKey, 3L * 3600000L) // "now" for the reclaim pass
      // horizon 2h: only A (retired ~3h ago) is eligible; A' is ~1h old
      val dry = spark.sql(s"VACUUM '$d' RETAIN 2 HOURS DRY RUN")
        .collect().map(_.getString(0))
      assert(dry.length === 1, dry.mkString(","))
      val gone = spark.sql(s"VACUUM '$d' RETAIN 2 HOURS")
        .collect().map(_.getString(0))
      assert(gone.toSeq === dry.toSeq)
      // the recent retiree survives: v1-pinned reads still work, v0 fails
      assert(spark.read.format("graft-json").schema(schema)
        .option("versionasof", "1").load(d).count() === 15L)
      intercept[Exception] {
        spark.read.format("graft-json").schema(schema)
          .option("versionasof", "0").load(d).count()
      }
      // horizon 0 = reclaim everything retired (the old immediate mode)
      assert(spark.sql(s"VACUUM '$d' RETAIN 0 HOURS").collect().length === 1)
      assert(snapIds(d) === (5L until 15L))
    } finally conf.unset(tsKey)
  }

  test("VACUUM RETAIN also sweeps aborted-write orphans past the horizon") {
    // a user who only ever runs the RETAIN form must not accumulate
    // uncommitted debris forever — the orphan sweep rides the same verb,
    // age-gated on modification time so an in-flight writer's
    // published-but-unlogged file survives
    val d = dir("vac_retain_orphan")
    val conf = spark.sparkContext.hadoopConfiguration
    val tsKey = GraftCommitLog.CommitTimestampKey
    try {
      writeTable(d, n = 20L, parts = 1)
      val root = new org.apache.hadoop.fs.Path(d)
      val fs = root.getFileSystem(conf)
      val oldOrphan = new org.apache.hadoop.fs.Path(root, "aborted-old.jsonl")
      val newOrphan = new org.apache.hadoop.fs.Path(root, "aborted-new.jsonl")
      Seq(oldOrphan, newOrphan).foreach { p =>
        val o = fs.create(p, true)
        try o.write("{\"id\":999}\n".getBytes("UTF-8")) finally o.close()
      }
      val now = System.currentTimeMillis()
      fs.setTimes(oldOrphan, now - 10L * 3600000L, -1L) // 10h old
      fs.setTimes(newOrphan, now - 10L * 60000L, -1L)   // 10min old
      val gone = spark.sql(s"VACUUM '$d' RETAIN 2 HOURS")
        .collect().map(_.getString(0)).toSeq
      assert(gone === Seq("aborted-old.jsonl"), gone.mkString(","))
      assert(!fs.exists(oldOrphan))
      assert(fs.exists(newOrphan), "young orphan must survive the horizon")
      // the live table is untouched
      assert(snapIds(d) === (0L until 20L))
    } finally conf.unset(tsKey)
  }

  test("graft-only verbs DELEGATE on path-style identifiers they cannot resolve") {
    // delta.`/path` is another extension's convention: with graft
    // installed in front, its statements must reach the delegate (here
    // Spark, whose parser rejects the verb) — never a graft refusal
    val e = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY delta.`/tmp/not/ours`").collect()
    }
    assert(!e.getMessage.contains("does not name a table"), e.getMessage)
    assert(!e.getMessage.contains("graft"), e.getMessage)
    // plain missing 1–2 part names still get the targeted message
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("DESCRIBE HISTORY nope_xyz").collect()
    }
    assert(e2.getMessage.contains("does not name a table"), e2.getMessage)
  }

  test("emptied table keeps its format lane (log write history)") {
    val d = dir("emptied_avro")
    writeTable(d, n = 20L, format = "graft-avro")                    // v0
    spark.sql(s"DELETE FROM '$d' WHERE true")                        // v1: all rows
    // live set is empty; the format must still resolve from the history
    // so OPTIMIZE commits under the avro lane (and compacts nothing)
    assert(spark.sql(s"OPTIMIZE '$d'").collect().head.getLong(0) >= 0L)
    assert(snapIds(d, "graft-avro").isEmpty)
  }
}
