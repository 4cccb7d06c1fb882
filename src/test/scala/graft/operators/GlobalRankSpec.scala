package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must be RESULT-IDENTICAL to the serial window forms on
  * every edge the bucketing could get wrong: tie runs sitting exactly
  * on bucket boundaries, NULL order keys, more tiles than rows, and a
  * bucket count that dwarfs the data. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  // heavy ties (7 distinct values over 2000 rows) guarantee
  // approx-quantile boundaries land ON tied values; group sizes differ
  private lazy val df = spark.range(2000).select(
    (col("id") % 3).cast("string").as("g"),
    when(col("id") % 29 === 0, lit(null).cast("double"))
      .otherwise((col("id") % 7).cast("double")).as("v"),
    col("id").as("tb"))

  private val w = Window.partitionBy($"g")
    .orderBy($"v".asc_nulls_last, $"tb".asc)

  test("withGroupRank equals the serial rank window (ties, nulls, few buckets)") {
    for (buckets <- Seq(1, 4, 32)) {
      val dist = GlobalRank.withGroupRank(df, Seq("g"), "v", Seq("tb"), buckets)
        .select($"g", $"tb", $"rank")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val serial = df.withColumn("rank", row_number().over(w))
        .select($"g", $"tb", $"rank")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
      assert(dist == serial, s"rank mismatch at buckets=$buckets")
    }
  }

  test("ntileByRange equals ntile().over for n = 4 and n > group size") {
    for (n <- Seq(4, 5000)) {
      val dist = GlobalRank.ntileByRange(df, Seq("g"), "v", Seq("tb"), n, buckets = 8)
        .select($"g", $"tb", $"__tile")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val serial = df.withColumn("t", ntile(n).over(w))
        .select($"g", $"tb", $"t")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(dist == serial, s"ntile mismatch at n=$n")
    }
  }

  test("quantilesByRank equals the rank-window nearest-rank pick") {
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val dist = GlobalRank.quantilesByRank(df, Seq("g"), "v", Seq("tb"), qs)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("p50"), r.getAs[Double]("p90"),
          r.getAs[Double]("p99"), r.getAs[Long]("n_rows")))).toMap
    val wc = Window.partitionBy($"g")
    val serial = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .groupBy($"g")
      .agg(max(when($"rn" === ceil($"n" * 0.5), $"v")).as("p50"),
        max(when($"rn" === ceil($"n" * 0.9), $"v")).as("p90"),
        max(when($"rn" === ceil($"n" * 0.99), $"v")).as("p99"),
        max($"n").as("n_rows"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("p50"), r.getAs[Double]("p90"),
          r.getAs[Double]("p99"), r.getAs[Long]("n_rows")))).toMap
    assert(dist == serial)
  }

  test("the data-sized rank window partitions by (group, bucket), not group alone") {
    val plan = GlobalRank.withGroupRank(df, Seq("g"), "v", Seq("tb"), 16)
      .queryExecution.optimizedPlan.toString
    // the row_number window over the DATA must include __bkt in its
    // partition spec (the only other window — the offset cumsum — runs
    // over the groups x buckets count table, not data rows)
    val rowNumberSpecs = plan.linesIterator
      .filter(l => l.contains("row_number()") && l.contains("windowspecdefinition"))
      .toSeq
    assert(rowNumberSpecs.nonEmpty, s"no row_number window found:\n$plan")
    rowNumberSpecs.foreach { l =>
      assert(l.contains("__bkt"), s"row_number window lacks __bkt: $l")
    }
  }
}
