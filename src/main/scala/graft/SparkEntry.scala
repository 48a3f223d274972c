package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2.11 (plus the LLM-pipeline extensions) is
  * exposed as a named query; each SQL-expressible one carries DuckDB oracle
  * SQL over the same parquet tables with identical column names and row order.
  */
object SparkEntry {

  /** The full registry, assembled from the operator modules. */
  def registry: Seq[GQuery] =
    operators.Relational.all ++ operators.Sources.all ++
      operators.Pipeline.all ++ operators.Extensions.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset timed by Bench. */
  def benchQueries: Seq[GQuery] = registry.filter(_.bench)
}
