package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued functions over graft tables — the Delta
  * `table_changes` shape, so the change-data-feed is reachable from pure
  * SQL:
  *
  * {{{
  *   SELECT * FROM table_changes('<path or catalog name>', <fromVersion>)
  *   SELECT * FROM table_changes('...', <fromVersion>, <toVersion>)
  * }}}
  *
  * Routes to [[graft.api.TrainingData.changeFeed]]: the result is the
  * table's columns plus `_change_type` (`insert` / `delete`), expressing
  * deletion-vector deltas row-level and in-range appends as net inserts;
  * COW-retired history refuses loudly (a rewrite moves rows it did not
  * logically change, which a row feed cannot express). Schema and format
  * resolve from the commit log exactly like the maintenance verbs. The
  * first argument is a literal: a path (contains `/`) or a session-
  * catalog graft table name. Registered through
  * [[graft.functions.GraftSparkExtensions]] (`injectTableFunction`) —
  * the TVF builder runs at analysis on the active session and returns
  * the feed's logical plan, so it composes with any outer SQL
  * (filters/joins/aggregates over the feed plan like any subquery).
  */
object GraftTableFunctions {

  val tableChangesInfo: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("table_changes"),
    new ExpressionInfo(getClass.getName.stripSuffix("$"), "table_changes"),
    (args: Seq[Expression]) => tableChanges(args))

  private def literal(e: Expression, what: String): Any = e match {
    case Literal(v, _) => v
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be a literal, got $other")
  }

  private def asLong(v: Any, what: String): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case s: java.lang.Short => s.toLong
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be an integer version, got $other")
  }

  private def tableChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "table_changes takes (table, fromVersion[, toVersion])")
    val ref = literal(args.head, "table") match {
      case s: UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"table_changes: table must be a string literal, got $other")
    }
    val from = asLong(literal(args(1), "fromVersion"), "fromVersion")
    val until =
      if (args.size == 3) asLong(literal(args(2), "toVersion"), "toVersion")
      else -1L
    val spark = SparkSession.active
    // ONE resolution seam with the SQL verbs (backticks, qualification —
    // catalog-name support is inherited, not re-implemented here)
    val dir = GraftMaintenanceSql.resolveRef(spark, ref, "table_changes")
    val (ddl, format) = GraftMaintenanceSql.resolveTable(spark, dir)
    val f = format.getOrElse(throw new IllegalArgumentException(
      s"table_changes: the log under $dir never recorded a data file"))
    graft.api.TrainingData.changeFeed(spark, dir, ddl, from, format = f,
      untilVersion = until).queryExecution.logical
  }
}
