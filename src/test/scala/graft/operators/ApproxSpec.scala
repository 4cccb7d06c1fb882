package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The APPROXIMATE scale paths behind the exact oracle-checked
  * aggregates: `q_agg_distinct`'s 100 TB form is HLL
  * (approx_count_distinct, mergeable fixed-size sketches instead of
  * an expand shuffle) and `q_agg_percentiles`'s is percentile_approx
  * (one pass over unsorted data, mergeable KLL-style sketch, instead
  * of a per-group sort). Estimates are engine-specific so they cannot
  * hash-match a DuckDB oracle — these specs bound their error against
  * the exact operators instead.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct: within rsd-implied error of exact") {
    val ev = graft.queries.QueryDef.loadEvents(spark, sf)
    val got = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", rsd = 0.05).as("approx"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      // 0.05 rsd -> 3 sigma = 15%
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("HLL sketches MERGE: partial sketches union to the whole (the scale property)") {
    // what makes approx-distinct work at 100 TB is not the estimate,
    // it's MERGEABILITY: per-partition (or per-day) sketches combine
    // into the global answer without revisiting rows. Build sketches
    // over disjoint halves, union them, and require the merged
    // estimate to (a) match the one-pass sketch exactly — same
    // algorithm, same registers — and (b) bound the exact count.
    val ev = graft.queries.QueryDef.loadEvents(spark, sf)
      .select($"user_id", pmod($"event_id", lit(2)).as("half"))
    val partials = ev.groupBy($"half")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val merged = partials.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .head().getLong(0)
    val onePass = ev.agg(hll_sketch_estimate(hll_sketch_agg($"user_id")))
      .head().getLong(0)
    val exact = ev.select($"user_id").distinct().count()
    assert(merged == onePass,
      s"merged partial sketches ($merged) must equal the one-pass sketch ($onePass)")
    assert(math.abs(merged - exact) <= math.max(1L, (exact * 0.1).toLong),
      s"estimate $merged vs exact $exact")
  }

  test("percentile_approx: estimate lands within a rank band of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_extendedprice".as("v")).cache()
    try {
      val n = li.count()
      val approxP50 = li.agg(
        percentile_approx($"v", lit(0.5), lit(10000)).as("p"))
        .head().getDouble(0)
      // rank of the estimate must be within 1% of the true median rank
      val rank = li.filter($"v" <= approxP50).count()
      assert(math.abs(rank - n / 2.0) <= n * 0.01 + 1,
        s"approx median $approxP50 has rank $rank of $n")
    } finally li.unpersist()
  }
}
