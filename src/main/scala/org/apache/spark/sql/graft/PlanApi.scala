package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The ONE internal bridge this library uses: construct a DataFrame from a
  * custom LogicalPlan. `Dataset.ofRows` is `private[sql]`, so this object
  * lives in a `sql` subpackage — the standard extension-library pattern
  * (Delta, Iceberg, Hudi all carry the same shim). Nothing else internal
  * is referenced from here.
  */
object PlanApi {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
