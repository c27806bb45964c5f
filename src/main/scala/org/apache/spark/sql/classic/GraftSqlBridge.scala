package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge for graft's MERGE INTO command: materialize an
  * ALREADY-ANALYZED logical plan as a DataFrame. `Dataset.ofRows` is
  * `private[sql]`, so this one-liner lives in Spark's package namespace
  * — the standard pattern for Spark-ecosystem libraries that compile
  * commands holding resolved sub-plans (a RunnableCommand's `run` gets
  * a session and a plan, and needs a public way back to Dataset-land).
  * Nothing else of Spark's internals is touched here. */
object GraftSqlBridge {
  def ofRows(
      session: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(session.asInstanceOf[SparkSession], plan)
}
