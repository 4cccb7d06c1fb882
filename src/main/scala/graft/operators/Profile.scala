package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling / data-quality surface — the "what is in this
  * table" and "does it satisfy the contract" operators every pipeline
  * runs before and after a big transform.
  *
  * Both operators aggregate in ONE pass over the input (a single
  * partial-aggregated scan, no per-column or per-rule jobs) and emit
  * small long-form results, so profiling 100 TB costs exactly one
  * read of the columns touched.
  */
object Profile {

  /** Per-column profile in long form: total rows, nulls, exact
    * distinct count, min/max (as strings, so heterogeneous column
    * types fit one result schema). One aggregation pass computes
    * every column's stats; the row-per-column shape comes from a
    * post-agg stack, not repeated scans. Exact distincts make this a
    * multi-count-distinct aggregate — Spark plans one Expand (rows x
    * columns) + partial aggregation; swap in approx_count_distinct
    * for a cheaper sketch when exactness is not required. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', __n_$c, __nulls_$c, __dist_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"))
  }

  /** Declarative data-quality rules: each rule is a boolean Column
    * contract ("violated when false"); the result is one row per rule
    * with its violation count and rate. NULL rule results count as
    * violations (a contract that cannot be evaluated is not
    * satisfied). All rules evaluate in the same single scan. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.map { case (name, pred) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(s"__v_$name")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) => s"'$name', __v_$name" }
      .mkString(", ")
    one.select(expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"),
        col("__total").as("n_rows"))
      .withColumn("violation_rate",
        round(col("n_violations").cast("double") / col("n_rows"), 6))
  }

  /** Fixed-width histogram: bin = floor(value / width) as exact
    * integer arithmetic on centi-units, one groupBy. The scan-local
    * binning expression makes this the map-side-combined shape — at
    * most `n_bins` rows cross the shuffle per task. */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame = {
    require(width > 0, "width must be > 0")
    // quantize to centi-units so the bin boundary comparison is
    // integral (float floor(x/w) wobbles at boundaries across engines)
    val wc = math.round(width * 100)
    require(wc > 0, "width below centi-unit resolution")
    val bin = expr(s"CAST(round(${valueCol} * 100) AS BIGINT) div $wc")
    df.filter(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 2).as("bin_min"),
        round(max(col(valueCol)), 2).as("bin_max"))
      .withColumn("bin_lo", round(col("bin") * wc / 100.0, 2))
  }
}
