package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's built-in `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` — native Catalyst aggregates, no UDF): the
  * cardinality primitive a 100 TB ingest actually runs. Exact
  * `count(DISTINCT x)` is a full shuffle of every distinct value and
  * cannot be incrementally maintained; an HLL sketch is a few KB per
  * group, built map-side in one pass, and UNION is a commutative,
  * associative, idempotent monoid — so per-shard/per-day sketches
  * merge into corpus totals without ever rescanning history (the same
  * mergeable-index pattern as [[TextAnalysis.bm25StatsMerge]]).
  *
  * Cross-engine note: sketch estimates are implementation-defined
  * (DuckDB's approx_count_distinct uses a different HLL), so the
  * registered query is rows-only + spec-gated rather than
  * DuckDB-hash-gated: SketchesSpec pins estimate-vs-exact relative
  * error, shard-order invariance, and merge == recompute equality —
  * the properties a deployment relies on.
  *
  * At 100 TB: the sketch build is one map-side-combined aggregate
  * (shuffle carries one ~KB sketch per group per partition); unions
  * shuffle only sketches. Nothing row-scale crosses the wire after
  * the scan.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol`: (groupCols..., hll BINARY).
    * `lgK` = log2 of the register count (12 -> 4 KB dense, ~2%
    * relative standard error — the DataSketches default). */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Union shard sketches back to one sketch per group — the monoid
    * merge. Input rows carry an `hll` binary column (from
    * [[hllSketch]], possibly built per shard / per ingest batch). */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** The end-to-end sharded shape: build per-(group, shard) sketches,
    * union per group, return (groupCols..., n_shards, est_distinct).
    * `shardCol` is whatever partitions the ingest (day, file, batch);
    * the per-shard sketches are exactly what an incremental pipeline
    * would persist and re-merge. */
  def shardedDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String, shardCol: String, lgK: Int = 12): DataFrame = {
    val perShard = hllSketch(df, groupCols :+ shardCol, valueCol, lgK)
    perShard.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_shards"),
        hll_union_agg(col("hll")).as("hll"))
      .select(groupCols.map(col) ++ Seq(col("n_shards"),
        round(hll_sketch_estimate(col("hll"))).cast("long")
          .as("est_distinct")): _*)
  }

  /** Sharded KLL quantiles (graft.functions.SketchAggregates — native
    * TypedImperativeAggregates): per-(group, shard) KLL(doubles)
    * sketches of `valueCol`, unioned per group, quantiles extracted at
    * `ranks` as columns named by the caller. Exact while each group's
    * n <= k; the published ~1.65/sqrt(k) rank error beyond. */
  def shardedQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, shardCol: String, ranks: Seq[(Double, String)],
      k: Int = 400): DataFrame = {
    import graft.functions.SketchAggregates
    val perShard = df.groupBy((groupCols :+ shardCol).map(col): _*)
      .agg(SketchAggregates.kllSketch(col(valueCol).cast("double"), k).as("qsk"))
    val merged = perShard.groupBy(groupCols.map(col): _*)
      .agg(SketchAggregates.kllMerge(col("qsk"), k).as("qsk"))
      .withColumn("__qs", SketchAggregates.kllQuantiles(col("qsk"), ranks.map(_._1)))
    merged.select(groupCols.map(col) ++ ranks.zipWithIndex.map {
      case ((_, name), i) => element_at(col("__qs"), i + 1).as(name)
    }: _*)
  }

  /** Sharded frequent-items top-k: per-(group, shard) sketches over
    * string `itemCol`, unioned per group, exploded to (groupCols...,
    * item, est) rows — estimate desc, item asc. Exact while each
    * group's distinct items fit `maxMapSize`. */
  def shardedTopK(df: DataFrame, groupCols: Seq[String], itemCol: String,
      shardCol: String, topK: Int, maxMapSize: Int = 128): DataFrame = {
    import graft.functions.SketchAggregates
    val perShard = df.groupBy((groupCols :+ shardCol).map(col): _*)
      .agg(SketchAggregates.freqSketch(col(itemCol), maxMapSize).as("fsk"))
    perShard.groupBy(groupCols.map(col): _*)
      .agg(SketchAggregates.freqMerge(col("fsk"), maxMapSize).as("fsk"))
      .select(groupCols.map(col) :+
        explode(SketchAggregates.freqTopK(col("fsk"), topK)).as("t"): _*)
      .select(groupCols.map(col) ++ Seq(col("t.item").as("item"),
        col("t.est").as("est")): _*)
  }

  /** Rolling-window distinct counts — the sketch family composed with
    * a trailing row frame: one HLL per hour (the data-sized
    * aggregation, map-side combined), then the trailing-(`trailing`+1)
    * union over the hour-level sketches ("distinct users in the last
    * 3 hours", per hour).
    *
    * The union is deliberately NOT a window over the sketch rows: an
    * unpartitioned `Window.orderBy(hour)` funnels every hour's KB
    * sketch through ONE task's sort (measured at the 100x relational
    * decade — 721k hours — 1.29 GB shuffled, 493 MB spilled, 33.6 s,
    * all in a single thread). Instead the single-partition step ranks
    * ONLY the bare hour strings (KB-scale at any corpus age: hours are
    * bounded by wall time, not data; Catalyst prunes its scan to the
    * ts column and drops the sketch aggregate), the rank map joins
    * back by broadcast, and each hour sketch is exploded to the
    * `trailing`+1 row ranks it contributes to — a hash-partitioned,
    * fully parallel union groupBy. HLL registers are max-combined, so
    * regrouping the same sketch sets is estimate-identical to the
    * window form. The anchor hour of each target rank is recovered
    * INSIDE the union aggregate (the offset-0 contribution is the
    * anchor row itself), so the rank map is joined exactly once and
    * the events table is scanned once at full width — a second rank
    * join would re-scan it, and ReuseExchange cannot deduplicate two
    * broadcasts keyed on different columns. */
  def rollingDistinct(df: DataFrame, tsCol: String, idCol: String,
      trailing: Int = 2, lgK: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = df
      .groupBy(date_format(date_trunc("hour", col(tsCol)),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(hll_sketch_agg(col(idCol), lit(lgK)).as("hll"))
    // row rank over hours — sketch-free, so the global ordering is a
    // KB-scale single task, not a GB-scale one
    val rank = hourly.select(col("hour"))
      .withColumn("rn", row_number().over(Window.orderBy("hour")))
    val contrib = hourly.join(broadcast(rank), "hour")
      .select(col("hour"), col("hll"),
        posexplode(sequence(col("rn"), col("rn") + lit(trailing))))
      .withColumnRenamed("col", "rn2")
    contrib.groupBy("rn2")
      .agg(hll_union_agg(col("hll")).as("u"),
        // offset 0 <=> source rank == target rank: the group's anchor
        max(when(col("pos") === 0, col("hour"))).as("hour"))
      // phantom targets past the last hour have no anchor — drop them
      // (rank rn keeps exactly the sketches of ranks rn-trailing .. rn)
      .where(col("hour").isNotNull)
      .select(col("hour"),
        round(hll_sketch_estimate(col("u"))).cast("long").as("est_distinct"))
  }

  /** Pairwise distinct-set overlap between segments via Theta
    * sketches: one sketch per `groupCol` value over `itemCol`
    * (sharded build + union — the incremental shape), then set
    * algebra on the KB sketch pairs: (seg_a, seg_b, common, only_a,
    * only_b). The raw item sets never meet in a join — at 100 TB the
    * per-segment sketches are a few KB each and the pair matrix is
    * segment-count-sized, not data-sized. */
  def segmentOverlap(df: DataFrame, groupCol: String, itemCol: String,
      shardCol: String): DataFrame = {
    import graft.functions.SketchAggregates
    val perShard = df.groupBy(col(groupCol), col(shardCol))
      .agg(SketchAggregates.thetaSketch(col(itemCol)).as("tsk"))
    val sk = perShard.groupBy(col(groupCol))
      .agg(SketchAggregates.thetaUnion(col("tsk")).as("tsk"))
    val a = sk.select(col(groupCol).as("seg_a"), col("tsk").as("ta"))
    val b = sk.select(col(groupCol).as("seg_b"), col("tsk").as("tb"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        SketchAggregates.thetaIntersectCount(col("ta"), col("tb")).as("common"),
        SketchAggregates.thetaDiffCount(col("ta"), col("tb")).as("only_a"),
        SketchAggregates.thetaDiffCount(col("tb"), col("ta")).as("only_b"))
  }
}
