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

  // ---- KLL quantile sketches ----

  test("KLL: sharded quantiles equal exact nearest-rank inside the window, " +
      "shard-count invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // exact nearest-rank (inclusive) per lang, computed directly
    val ranks = Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75")
    val byLang = docs.select(col("lang"), col("n_chars"))
      .collect().groupBy(_.getString(0))
      .map { case (l, rows) =>
        val vs = rows.map(_.getLong(1).toDouble).sorted
        l -> ranks.map { case (r, _) =>
          vs(math.ceil(r * vs.length).toInt - 1)
        }
      }
    for (shards <- Seq(2, 8)) {
      val got = Sketches.shardedQuantiles(
        docs.withColumn("shard", col("doc_id") % shards),
        Seq("lang"), "n_chars", "shard", ranks)
        .collect().map(r => r.getString(0) ->
          Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got == byLang,
        s"$shards-shard KLL quantiles must be exact in-window: $got vs $byLang")
    }
  }

  test("KLL: beyond the exactness window the rank error stays inside " +
      "the published bound") {
    import spark.implicits._
    // 50k values with k=200 -> estimation mode; rank error ~1.65/sqrt(k)
    val n = 50000
    val df = (1 to n).map(_.toLong).toDF("v").withColumn("g", lit("all"))
      .withColumn("shard", col("v") % 8)
    val got = Sketches.shardedQuantiles(df, Seq("g"), "v", "shard",
      Seq(0.5 -> "q50"), k = 200).head().getDouble(1)
    val rankErr = math.abs(got / n - 0.5)
    info(f"kll median estimate=$got%.0f rank_err=$rankErr%.4f")
    assert(rankErr <= 2.0 * 1.65 / math.sqrt(200.0),
      f"rank error $rankErr%.4f beyond 2x the published bound")
  }

  // ---- frequent-items sketches ----

  test("frequent items: sharded top-k equals exact counts in-window, " +
      "shard-count invariant") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("item"))
    val exact = toks.groupBy("lang", "item").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (shards <- Seq(2, 8)) {
      val got = Sketches.shardedTopK(
        toks.withColumn("shard", col("doc_id") % shards),
        Seq("lang"), "item", "shard", topK = 5)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      assert(got.nonEmpty && got.forall { case (k, est) => exact(k) == est },
        s"in-window frequent-item counts must be exact: $got")
      // and the 5 per group really are the top 5
      got.groupBy(_._1._1).foreach { case (lang, items) =>
        val top5 = exact.collect { case ((l, i), c) if l == lang => (c, i) }
          .toSeq.sortBy { case (c, i) => (-c, i) }.take(5).map(_._1).toSet
        assert(items.map(_._2).toSet.subsetOf(top5),
          s"$lang: returned items are not the true top-5")
      }
    }
  }

  test("frequent items: an undersized union target degrades loudly, " +
      "not silently — estimates carry a nonzero error offset") {
    import spark.implicits._
    // 500 distinct items into a capacity-8 union: maximumError > 0
    val df = (1 to 5000).map(i => (s"item${i % 500}", i % 4))
      .toDF("item", "shard").withColumn("g", lit("all"))
    val sk = df.groupBy("g", "shard")
      .agg(graft.functions.SketchAggregates.freqSketch(col("item"), 1024).as("fsk"))
      .groupBy("g")
      .agg(graft.functions.SketchAggregates.freqMerge(col("fsk"), 8).as("fsk"))
      .select(col("fsk")).head().getAs[Array[Byte]](0)
    val parsed = org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(sk),
      new org.apache.datasketches.common.ArrayOfStringsSerDe)
    assert(parsed.getMaximumError > 0,
      "undersized union must report its error offset")
  }

  // ---- Theta set-algebra sketches ----

  test("theta: segment overlap equals exact set algebra in-window, " +
      "shard-count invariant") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("item"))
    val sets = toks.select("lang", "item").distinct()
      .collect().groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getString(1)).toSet }
    val want = (for {
      (la, sa) <- sets; (lb, sb) <- sets if la < lb
    } yield (la, lb) -> ((sa & sb).size.toLong,
      (sa -- sb).size.toLong, (sb -- sa).size.toLong)).toMap
    for (shards <- Seq(2, 8)) {
      val got = Sketches.segmentOverlap(
        toks.withColumn("shard", col("doc_id") % shards),
        "lang", "item", "shard")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == want,
        s"$shards-shard theta overlap must be exact in-window")
    }
  }

  test("theta: intersection estimate within 5% at 100k-element sets") {
    import spark.implicits._
    // A = 0..99999, B = 50000..149999 -> |A ∩ B| = 50000
    val df = ((0 until 100000).map(i => ("a", s"v$i")) ++
      (50000 until 150000).map(i => ("b", s"v$i")))
      .toDF("seg", "item").withColumn("shard", lit(0))
    val row = Sketches.segmentOverlap(df, "seg", "item", "shard").head()
    val common = row.getLong(2)
    val err = math.abs(common - 50000.0) / 50000.0
    info(f"theta intersection estimate=$common rel_err=$err%.4f")
    assert(err <= 0.05, f"estimate $common off by $err%.4f (> 5%%)")
  }

  // ---- rolling-window distinct (trailing HLL union) ----

  test("rollingDistinct equals the exact trailing union on the events " +
      "fixture, for several trailing widths") {
    val events = graft.queries.QueryDef.loadEvents(spark, sf)
    // driver-side exact: per-hour user sets, then trailing unions over
    // the SORTED hour sequence (row frame, like the operator)
    val byHour = events
      .select(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("user_id"))
      .collect().groupBy(_.getString(0))
      .map { case (h, rs) => h -> rs.map(_.getLong(1)).toSet }
    val hours = byHour.keys.toSeq.sorted
    for (trailing <- Seq(0, 2, 5)) {
      val want = hours.zipWithIndex.map { case (h, i) =>
        h -> hours.slice(math.max(0, i - trailing), i + 1)
          .map(byHour).reduce(_ ++ _).size.toLong
      }.toMap
      val got = Sketches.rollingDistinct(events, "ts", "user_id", trailing)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"trailing=$trailing rolling distinct must be exact sub-threshold")
    }
  }

  test("rollingDistinct plan: sketches never enter a window, and the " +
      "rank subtree's scan is pruned to the timestamp column") {
    val events = graft.queries.QueryDef.loadEvents(spark, sf)
    val plan = Sketches.rollingDistinct(events, "ts", "user_id")
      .queryExecution.executedPlan.toString
    // the only Window is the hour-string ranking — if an hll column
    // ever rides through it, the single-partition sort becomes
    // GB-scale again (721k hours = 1.29 GB / 493 MB spill, measured)
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toList
    assert(windowLines.nonEmpty, "expected the hour-rank window")
    windowLines.foreach { l =>
      assert(!l.toLowerCase.contains("hll"),
        s"sketch column must not enter a window: $l")
    }
    // rank subtree: Catalyst must collapse the pruned aggregate to a
    // distinct over ts alone (a full-width second scan doubles the
    // events bytes read at 100 TB)
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan") || l.contains("Scan parquet"))
      .toList
    assert(scans.size == 2, s"expected 2 events scans, got:\n$scans")
    assert(scans.exists(l => l.contains("[ts#") && !l.contains("user_id")),
      s"one scan must be pruned to ts-only:\n${scans.mkString("\n")}")
    assert(scans.exists(_.contains("user_id")),
      s"one scan must feed the sketch aggregate:\n${scans.mkString("\n")}")
  }
}
