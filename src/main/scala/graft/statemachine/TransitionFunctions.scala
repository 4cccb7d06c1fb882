package graft.statemachine

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr

/** Spark-facing surface of the FSM.
  *
  * Two interchangeable forms:
  *   1. Native `Column` expressions built from [[TransitionSql]] —
  *      plain Catalyst CASE chains, codegen-friendly, the form every
  *      query in this engine uses.
  *   2. Registered Scala UDFs with the reference names
  *      (`apply_transition`, `is_valid_transition`,
  *      `get_transition_explanation`, `full_transition`) so the
  *      reference's SQL text runs verbatim
  *      (reference: src/advisory_pipeline/state_machine/udf.py:12-86).
  */
object TransitionFunctions {

  /** New state after validating `from -> to`; keeps `from` if invalid.
    * Arguments are SQL expression strings (usually column names). */
  def applyTransition(from: String, to: String): Column =
    expr(TransitionSql.applyTransition(from, to))

  def isValidTransition(from: String, to: String): Column =
    expr(TransitionSql.isValidTransition(from, to))

  def transitionExplanation(from: String, to: String): Column =
    expr(TransitionSql.transitionExplanation(from, to))

  /** Struct(success, old_state, new_state, reason). */
  def fullTransition(from: String, to: String): Column = {
    val fields = TransitionSql.fullTransitionFields(from, to)
    expr(
      s"named_struct('success', ${fields("success")}, 'old_state', ${fields("old_state")}, " +
        s"'new_state', ${fields("new_state")}, 'reason', ${fields("reason")})")
  }

  /** Register the four reference-named UDFs in the session's SQL
    * registry. Kept for SQL-text parity; the Column builders above are
    * preferred in the hot path (no serialization, codegen stays on). */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register(
      "is_valid_transition",
      (f: String, t: String) => StateMachine.isValidTransitionUdf(f, t))
    spark.udf.register(
      "apply_transition",
      (f: String, t: String) => StateMachine.applyTransitionUdf(f, t))
    spark.udf.register(
      "get_transition_explanation",
      (f: String, t: String) => StateMachine.transitionExplanationUdf(f, t))
    spark.udf.register(
      "full_transition",
      (f: String, t: String) => StateMachine.fullTransitionUdf(f, t))
  }
}
