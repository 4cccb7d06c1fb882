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
    // Internal aliases are positional (__n_0, __n_1, ...) and the user
    // name appears only as a lit() — no raw identifiers ever reach SQL
    // text, so names with quotes/dots/backticks cannot break parsing
    // or inject expressions.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(lit(1)).as(s"__n_$i"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$i"),
        countDistinct(col(c)).as(s"__dist_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col(s"__n_$i").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Declarative data-quality rules: each rule is a boolean Column
    * contract ("violated when false"); the result is one row per rule
    * with its violation count and rate. NULL rule results count as
    * violations (a contract that cannot be evaluated is not
    * satisfied). All rules evaluate in the same single scan. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // Positional internal aliases + lit() rule names, same reasoning
    // as profile(): rule names never become SQL identifiers.
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(s"__v_$i")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v_$i").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("r"),
        col("__total").as("n_rows"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"), col("n_rows"))
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
    // integral (float floor(x/w) wobbles at boundaries across engines).
    // FLOOR division, not Spark's truncate-toward-zero `div`: pmod is
    // non-negative, so (a - pmod(a, wc)) is the largest multiple of wc
    // <= a and the `div` is exact — negative values land in their own
    // bins (DuckDB's integer `//` floors the same way), and bin_lo is
    // the true lower edge for every bin.
    val wc = math.round(width * 100)
    require(wc > 0, "width below centi-unit resolution")
    val cents = round(col(valueCol) * 100).cast("long")
    // (cents - pmod) is an exact multiple of wc, so the double `/` is
    // exact as long as |cents| < 2^53 (centi-units of ~9e13 — far past
    // any realistic measure column).
    val bin = ((cents - pmod(cents, lit(wc))) / lit(wc)).cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 2).as("bin_min"),
        round(max(col(valueCol)), 2).as("bin_max"))
      .withColumn("bin_lo", round(col("bin") * wc / 100.0, 2))
  }

  /** Distribution drift between two corpus snapshots: per key, the
    * smoothed probabilities and the per-key contribution to
    * KL(A || B) — the standard data-monitoring check for "did the
    * source/language mix shift between crawls". Add-one (Laplace)
    * smoothing over the union key set keeps absent keys finite;
    * contributions quantize to integer NANO-nats so any downstream
    * total is an order-independent exact sum (negative contributions
    * are legitimate — KL >= 0 only in total).
    *
    * At 100 TB: two map-side-combined key counts, a tiny key-set
    * join, a single-row totals broadcast — nothing row-scale ever
    * shuffles. */
  def distributionDrift(a: DataFrame, b: DataFrame,
      keyCol: String): DataFrame = {
    val ca = a.groupBy(col(keyCol)).agg(count(lit(1)).as("na"))
    val cb = b.groupBy(col(keyCol)).agg(count(lit(1)).as("nb"))
    val keys = ca.select(col(keyCol)).union(cb.select(col(keyCol))).distinct()
    val t = keys.join(ca, Seq(keyCol), "left").join(cb, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = t.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"),
      count(lit(1)).as("kk"))
    val pa = (col("na") + lit(1.0)) / (col("ta") + col("kk"))
    val pb = (col("nb") + lit(1.0)) / (col("tb") + col("kk"))
    t.crossJoin(broadcast(tot))
      .select(col(keyCol), col("na"), col("nb"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round(pa * log(pa / pb) * 1e9).cast("long").as("kl_nano"))
  }
}
