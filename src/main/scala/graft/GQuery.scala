package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query in the engine's driver-contract surface
  * (SURVEY.md §2.11 checklist + LLM-pipeline extensions).
  *
  * @param name   stable driver-contract key (also the verify output dir name)
  * @param doc    one-line description of the operator this query exercises
  * @param build  (session, sfDir) => result; sfDir holds the parquet tables
  * @param oracle DuckDB-runnable ANSI SQL over the same tables producing the
  *               identical result (column names AND row order must match).
  *               None => the op is not SQL-expressible; driver records a
  *               weaker rows-only check.
  * @param bench  include in the headline Bench set (sf0.1 timing)
  */
final case class GQuery(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false)

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one driver-generated parquet table (TESTDATA.md), normalizing
    * timestamps: TIMESTAMP_NTZ → session-UTC TIMESTAMP (lossless under the
    * UTC session tz), and `events.ts` — TIMESTAMP(NANOS), which Spark's
    * parquet reader only surfaces as a nanos LongType via
    * spark.sql.legacy.parquet.nanosAsLong=true — → micros TIMESTAMP
    * (the data is micro-aligned, so `div 1000` is lossless).
    *
    * Round 16 (optimization): sessions that additionally set
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` (Verify/Bench do)
    * read the NTZ columns as session-UTC TIMESTAMP directly — identical
    * values under the pinned UTC session tz, but with NO cast-Project over
    * the scan, so timestamp predicates keep native parquet pushdown
    * (measured: q08 −25%, q01 −15% exec at sf0.1). The cast fold below
    * stays as the adaptive fallback for sessions that leave the default.
    *
    * The driver tables are immutable for a JVM's lifetime, so the footer
    * schema is cached per path — schema inference re-read every footer on
    * every build call (~10-30 ms per table per timed pass, pure planning
    * overhead; the same discipline real metastores apply).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // cache key carries the confs the inferred schema depends on: a JVM
    // hosting sessions with different NTZ / nanos settings must not reuse
    // a schema inferred under the other conf (round-17, VERDICT item 8)
    val ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val schema = schemaCache.computeIfAbsent(s"$path|ntz=$ntz|nanos=$nanos",
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if name == "events" && f.name == "ts" =>
          acc.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case _ => acc
      }
    }
  }

  /** Register the named tables as temp views (for spark.sql-expressed
    * queries). Register ONLY what the query reads — every registration
    * costs a parquet footer round-trip, which is pure waste at 100 TB.
    */
  def register(spark: SparkSession, dir: String, which: String*): Unit =
    which.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Register every table (driver/debug convenience). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}
