package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT ranking for orderings whose window would
  * otherwise serialize: `Window.partitionBy(few groups).orderBy(...)`
  * caps parallelism at the number of groups (and an empty partitionBy
  * at ONE task), which is the scale wall behind exact ntile /
  * nearest-rank quantiles.
  *
  * Shape: range-BUCKET the order key by approximate quantile
  * boundaries, rank within (group, bucket) — parallelism = groups x
  * buckets — then add per-bucket offsets (a groups x buckets count
  * table, cumulated and broadcast back). Two properties make this
  * exact, not approximate:
  *
  *   - boundary quality only affects load BALANCE: any consistent
  *     bucket assignment that respects the value order yields the
  *     same final rank, so the approx_quantile sketch (or even a
  *     stale/nondeterministic one) cannot change results;
  *   - rows EQUAL to a boundary all take the same side (count of
  *     boundaries `<= v`), so a tie run never straddles buckets and
  *     the within-bucket tiebreak ordering stays globally consistent.
  *
  * Cost at scale: one sketch pass (approxQuantile — a driver action at
  * plan-build time, like every boundary-learning operator), one
  * shuffle on (group, bucket), one map-side-combined count aggregate,
  * one broadcast join. No single-task stage anywhere.
  */
object GlobalRank {

  /** Core: (ranked rows incl. `rank`, per-slice count table). The
    * slice-count table (groups x buckets rows) also serves as the
    * group-total source for callers — deriving totals from it avoids a
    * third scan of the fact table.
    *
    * With `weightCol` set, the ranked rows additionally carry
    * `running` — the INCLUSIVE running sum of the weight in rank
    * order, computed by the same bucket decomposition (within-slice
    * running sums in parallel, weight offsets cumulated over the tiny
    * slice table). One core so the exactness-critical bucketing
    * (sketch boundaries, boundary-tie handling, offset cumsum) cannot
    * drift between the rank-only and running-sum variants. */
  private def rankedWithSliceCounts(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tiebreak: Seq[String],
      buckets: Int,
      weightCol: Option[String] = None,
  ): (DataFrame, DataFrame) = {
    require(buckets >= 1, "buckets must be >= 1")
    // GLOBAL boundaries of the order key (cheap sketch; per-group
    // boundaries would only improve balance when group distributions
    // diverge wildly)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bs =
      if (probs.isEmpty) Array.empty[Double] // buckets=1: degenerate, serial
      else df.stat.approxQuantile(valueCol, probs, 0.01).distinct.sorted
    // bucket = #boundaries <= v; NULLs order last -> last bucket + 1
    val bucketCol =
      when(col(valueCol).isNull, lit(bs.length + 1))
        .otherwise(bs.map(b => when(col(valueCol) >= lit(b), 1).otherwise(0))
          .foldLeft(lit(0): Column)(_ + _))
    val bucketed = df.withColumn("__bkt", bucketCol)
    val ordering = (col(valueCol).asc_nulls_last +: tiebreak.map(col(_).asc))
    // parallel part: rank (and running weight sum) inside each
    // (group, bucket) slice
    val wB = Window.partitionBy((groupCols :+ "__bkt").map(col): _*)
      .orderBy(ordering: _*)
    val rankedBase = bucketed.withColumn("__rb", row_number().over(wB))
    val ranked = weightCol.fold(rankedBase)(w =>
      rankedBase.withColumn("__runb", sum(col(w)).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    // tiny part: per-slice counts -> running offset per group. The agg
    // is map-side combined; the cumsum window runs over groups x
    // (buckets + 2) rows, not data rows.
    val sliceAggs = count(lit(1)).as("__cnt") +:
      weightCol.toSeq.map(w => sum(col(w)).as("__wsum"))
    val sliceCounts = bucketed.groupBy((groupCols :+ "__bkt").map(col): _*)
      .agg(sliceAggs.head, sliceAggs.tail: _*)
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetsAll = weightCol.fold(
      sliceCounts.withColumn("__off",
        coalesce(sum(col("__cnt")).over(wOff), lit(0L))))(_ =>
      sliceCounts
        .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
        .withColumn("__woff", coalesce(sum(col("__wsum")).over(wOff), lit(0L))))
    val offCols = col("__off") +: weightCol.toSeq.map(_ => col("__woff"))
    val offsets = offsetsAll
      .select((groupCols :+ "__bkt").map(col) ++ offCols: _*)
    val joined = ranked.join(broadcast(offsets), groupCols :+ "__bkt")
      .withColumn("rank", col("__off") + col("__rb"))
    val withRank = weightCol.fold(joined)(_ =>
        joined.withColumn("running", col("__woff") + col("__runb")))
      .drop("__bkt", "__rb", "__off", "__runb", "__woff")
    (withRank, sliceCounts)
  }

  /** Adds `rank` (1-based, per `groupCols`, ordered by `valueCol` asc
    * nulls last, then `tiebreak` asc) without a group-wide window.
    * `buckets` bounds the added parallelism (groups x buckets tasks). */
  def withGroupRank(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tiebreak: Seq[String],
      buckets: Int = 32,
  ): DataFrame =
    rankedWithSliceCounts(df, groupCols, valueCol, tiebreak, buckets)._1

  /** Standard SQL ntile from a 1-based rank and the group size: the
    * first `n_rows % n` tiles hold `n_rows/n + 1` rows. Exactly the
    * distribution `ntile(n) OVER (...)` produces in Spark and DuckDB. */
  def ntileFromRank(rank: Column, nRows: Column, n: Int): Column = {
    val q = nRows.cast("long") / n // floorDiv: both operands positive
    val qL = floor(q).cast("long")
    val r = nRows.cast("long") % n
    val big = r * (qL + 1) // rows covered by the (q+1)-sized tiles
    when(rank <= big, floor((rank - 1) / (qL + 1)) + 1)
      .otherwise(r + floor((rank - big - 1) / qL) + 1)
      .cast("int")
  }

  /** Exact per-group ntile with distributed ranking — result-identical
    * to `ntile(n).over(Window.partitionBy(groups).orderBy(...))`, but
    * parallelism groups x buckets instead of groups. */
  def ntileByRange(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tiebreak: Seq[String],
      n: Int,
      buckets: Int = 32,
  ): DataFrame = {
    val (ranked, sliceCounts) =
      rankedWithSliceCounts(df, groupCols, valueCol, tiebreak, buckets)
    // group totals fold from the tiny slice-count table — no extra
    // scan of the fact table
    val counts = sliceCounts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cnt")).as("__n"))
    ranked.join(broadcast(counts), groupCols)
      .withColumn("__tile", ntileFromRank(col("rank"), col("__n"), n))
      .drop("rank", "__n")
  }

  /** [[withGroupRank]] plus an INCLUSIVE running sum of `weightCol`
    * in rank order — the distributed prefix sum: within-(group,
    * bucket) running sums in parallel, bucket-level weight offsets
    * cumulated over the tiny slice table and broadcast back. The
    * primitive behind budgeted greedy selection ("take in score order
    * until the token budget is spent") at cluster scale — the naive
    * form is a global-window cumsum, i.e. one task. */
  def withGroupRankAndRunningSum(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tiebreak: Seq[String],
      weightCol: String,
      buckets: Int = 32,
  ): DataFrame =
    rankedWithSliceCounts(df, groupCols, valueCol, tiebreak, buckets,
      weightCol = Some(weightCol))._1

  /** Exact nearest-rank (ceil(n*p)) per-group quantiles with
    * distributed ranking — the scalable twin of the
    * rank-window-per-group audit shape. Returns one row per group:
    * groupCols ++ quantile values (named by caller) ++ n_rows. */
  def quantilesByRank(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tiebreak: Seq[String],
      quantiles: Seq[(String, Double)],
      buckets: Int = 32,
  ): DataFrame = {
    val (rankedRows, sliceCounts) =
      rankedWithSliceCounts(df, groupCols, valueCol, tiebreak, buckets)
    val counts = sliceCounts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cnt")).as("__n"))
    val ranked = rankedRows.join(broadcast(counts), groupCols)
    // keep only the target-rank rows (a handful per group) before the
    // final fold — everything else never leaves its partition
    val isTarget = quantiles.map { case (_, p) =>
      col("rank") === ceil(col("__n") * p)
    }.reduce(_ || _)
    val aggs = quantiles.map { case (name, p) =>
      max(when(col("rank") === ceil(col("__n") * p), col(valueCol))).as(name)
    } :+ max(col("__n")).as("n_rows")
    ranked.filter(isTarget)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
