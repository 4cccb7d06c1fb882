package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable HLL distinct-count sketches ([[Sketches]]): estimates are
  * implementation-defined (no DuckDB oracle can hash-match them), so
  * this spec pins the properties a deployment relies on instead —
  * accuracy vs exact distinct, shard-order invariance, and the monoid
  * law (merge of per-shard sketches == one whole-corpus sketch).
  * Everything here is deterministic: DataSketches HLL has no runtime
  * randomness (hashes are seeded constants), so the assertions are
  * exact regression lines, not flaky statistical bounds. */
class SketchesSpec extends SparkSpec {

  test("estimate within 3% of exact distinct at lgK=12 on 20k values") {
    import spark.implicits._
    // 20000 distinct values, each appearing 1-3 times
    val df = (1 to 20000).flatMap(i => Seq.fill(1 + i % 3)(i.toLong))
      .toDF("v").withColumn("g", lit("all"))
    val est = Sketches.hllSketch(df, Seq("g"), "v")
      .select(Sketches.estimate(col("hll"))).head().getLong(0)
    val err = math.abs(est - 20000.0) / 20000.0
    info(f"hll estimate=$est exact=20000 rel_err=$err%.4f")
    assert(err <= 0.03, f"estimate $est off by $err%.4f (> 3%%)")
  }

  test("small cardinalities stay exact (sparse mode) per group") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = docs.groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.hllSketch(docs, Seq("lang"), "doc_id")
      .select(col("lang"), Sketches.estimate(col("hll")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact,
      s"sub-threshold cardinalities must be exact: est=$est exact=$exact")
  }

  test("monoid law: union of per-shard sketches == whole-corpus sketch, " +
      "invariant to shard count and order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def estOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("lang"), Sketches.estimate(col("hll")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = estOf(Sketches.hllSketch(docs, Seq("lang"), "doc_id"))
    for (shards <- Seq(2, 4, 16)) {
      val sharded = docs.withColumn("shard", col("doc_id") % shards)
      val perShard = Sketches.hllSketch(sharded, Seq("lang", "shard"), "doc_id")
      val merged = estOf(Sketches.hllMerge(perShard, Seq("lang")))
      assert(merged == whole,
        s"$shards-shard merge must equal the whole-corpus sketch: $merged vs $whole")
      // order invariance: merge the shards in reverse order
      val reversed = estOf(Sketches.hllMerge(
        perShard.orderBy(col("shard").desc), Seq("lang")))
      assert(reversed == whole, "shard order must not change the union")
    }
  }

  test("shardedDistinct end-to-end: estimates equal exact on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("shard", col("doc_id") % 4)
    val out = Sketches.shardedDistinct(docs, Seq("lang"), "doc_id", "shard")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val exact = docs.groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.forall(_._2 == 4), s"4 shards per group: $out")
    assert(out.map(t => t._1 -> t._3).toMap == exact,
      s"sub-threshold estimates exact: $out vs $exact")
  }
}
