package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal access bridge: `ExpressionUtils.column` (the Spark 4 way to
  * wrap a custom Catalyst Expression as a user-facing Column) and
  * `Dataset.ofRows` (the way to wrap a custom LogicalPlan as a
  * DataFrame) are `private[sql]`, so the engine exposes them from
  * inside the package — the standard extension idiom, no internals
  * copied. */
object GraftSqlBridge {
  /** The `NumericType` abstract-type companion is `private[spark]`;
    * expose it so the engine's native aggregates can declare numeric
    * inputTypes (analysis-time rejection instead of a runtime
    * ClassCastException). */
  val numericType: org.apache.spark.sql.types.AbstractDataType =
    org.apache.spark.sql.types.NumericType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The analyzed (resolved-attribute) plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.DataFrame].queryExecution.analyzed

  /** Wrap a (resolved) custom LogicalPlan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently register an extra planner strategy on a live session
    * (the per-session fallback for cluster-level
    * `spark.sql.extensions=graft.GraftExtensions`). NOTE: mutates
    * session-global state (`experimental.extraStrategies`) — callers
    * like asOfJoinMerge document this. The read-modify-write is
    * synchronized on the ExperimentalMethods instance so concurrent
    * registrations cannot append duplicates (duplicates are harmless
    * to planning but would grow the list unboundedly). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.contains(s)) {
        cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
      }
    }
  }
}
