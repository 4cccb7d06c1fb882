package graft.operators

import graft.SparkSpec
import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** The scale-rehearsal generator is itself load-bearing evidence — a
  * replication bug silently invalidates every decade ratio (round 5
  * found exactly that: replicating events without offsetting ts made
  * interval-join outputs grow quadratically with factor). Pin its
  * invariants at sf0.001 x3.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.run(spark, sf, d, 3, scaleDocs = true)
    d
  }

  private def cnt(dir: String, t: String): Long =
    spark.read.parquet(s"$dir/$t.parquet").count()

  test("scaling tables replicate by the factor; fixed tables stay fixed") {
    Seq("lineitem", "orders", "customer", "supplier", "part", "events",
      "documents", "embeddings").foreach { t =>
      assert(cnt(dst, t) == 3 * cnt(sf, t), s"$t must be x3")
    }
    Seq("region", "nation").foreach { t =>
      assert(cnt(dst, t) == cnt(sf, t), s"$t must stay fixed")
    }
  }

  test("key offsets keep cardinality growing and FKs intact") {
    val orders = spark.read.parquet(s"$dst/orders.parquet")
    assert(orders.select("o_orderkey").distinct().count() ==
      3 * spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey").distinct().count(),
      "replica key offsets must not collide")
    // every lineitem must still find its order (FK preserved per replica)
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val orphans = li.join(orders,
      li("l_orderkey") === orders("o_orderkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans lineitem rows lost their order")
  }

  test("event history gets LONGER, not denser") {
    // loadEvents normalizes ts to TimestampType whatever the parquet
    // physical type; measure the span in micros
    def span(dir: String): Long = graft.queries.QueryDef.loadEvents(spark, dir)
      .agg(unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
      .head().getLong(0)
    val (s0, s3) = (span(sf), span(dst))
    // replicas are offset by span + 1h each: new span ~ 3*old + 2h
    val expected = 3 * s0 + 2 * 3600L * 1000000L
    assert(math.abs(s3 - expected) < 2L * 1000000L,
      s"time span must triple (+2h offsets): $s0 -> $s3, expected ~$expected")
  }

  test("replicated documents diverge in content; embeddings perturb") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val dk = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    // replica 0 is verbatim; replicas 1..2 share no text values with it
    val overlap = docs.filter(col("doc_id") >= dk).select("text")
      .intersect(docs.filter(col("doc_id") < dk).select("text")).count()
    assert(overlap == 0, "cross-replica texts must diverge")
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val vk = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(max(col("vec_id"))).head().getLong(0) + 1
    val embOverlap = emb.filter(col("vec_id") >= vk).select("embedding")
      .intersect(emb.filter(col("vec_id") < vk).select("embedding")).count()
    assert(embOverlap == 0, "cross-replica embeddings must be perturbed")
  }
}
