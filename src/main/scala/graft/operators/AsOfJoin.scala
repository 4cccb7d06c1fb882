package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join, composed from built-ins — preference
  * (a) of the custom-operator ladder; no custom physical node needed.
  *
  * Semantics: for every left row, attach the right row with the
  * greatest `rightTs <= leftTs` for the same keys (LEFT OUTER — no
  * match leaves nulls), like a time-series ASOF JOIN.
  *
  * Shape: instead of the O(|L| x |R|) pair join + argmax, the two
  * inputs are tagged and UNIONED, hash-partitioned by key, sorted once
  * by (ts, side), and the latest right payload is carried forward with
  * a running `last(_, ignoreNulls)` window. One shuffle, one sort,
  * linear scan — survives a 100x scale-up where the pair join would
  * not.
  *
  * The right side must be unique per (keys, rightTs) for deterministic
  * results (dedup with a ranking window first — see
  * [[AdvisoryMerge.rankEnrichment]] for the idiom).
  */
object AsOfJoin {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightValueCols: Seq[String],
  ): DataFrame = {
    val rightStruct = struct((rightTs +: rightValueCols).map(col): _*)
    val leftStruct = struct(left.columns.map(col): _*)
    val rvType = right.select(rightStruct.as("v")).schema("v").dataType
    val lpType = left.select(leftStruct.as("v")).schema("v").dataType

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(1).as("__r"),
        rightStruct.as("__rv"), lit(null).cast(lpType).as("__lp")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(0).as("__r"),
        lit(null).cast(rvType).as("__rv"), leftStruct.as("__lp")): _*)

    // right rows sort BEFORE left rows at equal ts (__r desc) so a
    // right row exactly at leftTs matches (>= semantics).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftOut = left.columns.map(c => col(s"__lp.$c").as(c))
    val rightOut = (rightTs +: rightValueCols)
      .map(c => col(s"__carry.$c").as(s"asof_$c"))

    taggedRight.unionByName(taggedLeft)
      .withColumn("__carry", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
      .select(leftOut ++ rightOut: _*)
  }

  /** Same join, executed by the native sorted-merge physical node
    * ([[graft.plans.AsOfJoinExec]]) instead of the union-window
    * composition — preference (c) of the ladder. Same output shape
    * (left.* then `asof_`-prefixed right columns); prefer it when the
    * left side is wide, since the composition shuffles left rows
    * padded to the union width while the node shuffles each side only
    * as itself. Keys and timestamps must have matching types on both
    * sides. NULL keys/timestamps follow SQL join semantics (never
    * match; left rows still emitted).
    *
    * Side effect: registers [[graft.plans.AsOfJoinStrategy]] on the
    * session's `experimental.extraStrategies` (session-global state,
    * idempotent and thread-safe via GraftSqlBridge.addStrategy) — the
    * per-session fallback when the cluster isn't launched with
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def asOfJoinMerge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightValueCols: Seq[String],
  ): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)

    // rename right columns before the join so the combined output has
    // no duplicate names: keys get droppable __asof_k_* aliases, the
    // ts/value payload its public asof_* names
    val keyAliases = keys.map(k => k -> s"__asof_k_$k")
    val rightProj = right.select(
      keyAliases.map { case (k, a) => col(k).as(a) } ++
        (rightTs +: rightValueCols).map(c => col(c).as(s"asof_$c")): _*)

    val lPlan = GraftSqlBridge.analyzedPlan(left)
    val rPlan = GraftSqlBridge.analyzedPlan(rightProj)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))

    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)),
      keyAliases.map { case (_, a) => attr(rPlan, a) },
      attr(lPlan, leftTs),
      attr(rPlan, s"asof_$rightTs"))
    GraftSqlBridge.ofRows(spark, node)
      .drop(keyAliases.map(_._2): _*)
  }
}
