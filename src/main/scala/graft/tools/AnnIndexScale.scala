package graft.tools

import graft.operators.{IncrementalAnn, Similarity}
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The standing-IVF-index scale rehearsal: does the cell-bucketed
  * (inverted-file) layout keep per-query search reading the probed
  * slice as the corpus grows, where the pre-r10 layout read the whole
  * committed index?
  *
  * For each embeddings dir (cells ~ sqrt(N), buckets = cells — one
  * cell per bucket is the inverted-file ideal), measures:
  *   - ingest_s: the two-half assign+commit build;
  *   - pruned_s: IncrementalAnn.topK (warm, best of 3) — probed
  *     buckets only;
  *   - full_s: the same ivfTopK over the WHOLE committed index read
  *     via readSnapshot (the pre-r10 shape), same semantics;
  *   - files: index files fetched vs total;
  *   - equal: both searches return identical rankings.
  *
  * Usage: runMain graft.tools.AnnIndexScale <dir1> [dir2 ...]
  * (each dir holds an embeddings.parquet; decades via ScaleUp docsOnly.)
  */
object AnnIndexScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnIndexScale <embeddingsDir>...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val nProbe = 8
    println(f"[annindex] ${"dir"}%-14s ${"vecs"}%9s ${"cells"}%6s " +
      f"${"ingest_s"}%9s ${"pruned_s"}%9s ${"adapt_s"}%8s ${"full_s"}%7s " +
      f"${"files"}%11s eq")
    for (dir <- args) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = vecs.count()
      val cells = Similarity.autoCells(n)
      // deterministic seeded centroids (the fixed-centroid contract);
      // KMeans training quality is AnnRecallSpec's concern, not this
      // rehearsal's — the fetch shape is identical either way
      val centroids = vecs.filter(col("vec_id") < cells)
        .select(col("vec_id").as("cell"),
          col("embedding").cast("array<double>").as("centroid"))
        .localCheckpoint()
      val queries = vecs.filter(col("vec_id") < 8).localCheckpoint()
      val idx = java.nio.file.Files
        .createTempDirectory("graft-annscale").toString
      val t0 = System.nanoTime()
      IncrementalAnn.ingest(vecs.where(col("vec_id") % 2 === 0), idx,
        centroids, "vec_id", "embedding", nBuckets = cells)
      IncrementalAnn.ingest(vecs.where(col("vec_id") % 2 === 1), idx,
        centroids, "vec_id", "embedding", nBuckets = cells)
      val ingestS = (System.nanoTime() - t0) / 1e9

      // the LAZY plan exposes the pruned read's file set; force the
      // pruned path here (smallIndexFiles = 0) so the fetch fraction
      // and forced-pruned timing are measured even below the adaptive
      // threshold — the adaptive column shows what topK actually does
      val (prunedPlan, probes0) = IncrementalAnn.topKLazy(spark, idx,
        centroids, queries, "vec_id", "embedding", k, nProbe,
        smallIndexFiles = 0)
      val marker = new java.io.File(idx).getName
      val fetched = prunedPlan.inputFiles.count(_.contains(marker))
      val prunedRows = prunedPlan.collect().map(_.toSeq).toSet
      probes0.unpersist(false)
      val total = SnapshotUpsert.readSnapshot(spark, idx).inputFiles.length
      val prunedS = Timing.best3(() => IncrementalAnn.topK(spark, idx,
        centroids, queries, "vec_id", "embedding", k = k, nProbe = nProbe,
        smallIndexFiles = 0))
      // the shipped default: adaptive pruned-or-full by file count
      val adaptS = Timing.best3(() => IncrementalAnn.topK(spark, idx,
        centroids, queries, "vec_id", "embedding", k = k, nProbe = nProbe))
      val fullS = Timing.best3(() => Similarity.ivfTopK(
        SnapshotUpsert.readSnapshot(spark, idx), centroids, queries,
        "vec_id", "embedding", k = k, nProbe = nProbe))
      val eq = prunedRows ==
        Similarity.ivfTopK(SnapshotUpsert.readSnapshot(spark, idx),
          centroids, queries, "vec_id", "embedding", k = k,
          nProbe = nProbe).collect().map(_.toSeq).toSet
      println(f"[annindex] ${new java.io.File(dir).getName}%-14s $n%9d " +
        f"$cells%6d $ingestS%9.1f $prunedS%9.2f $adaptS%8.2f $fullS%7.2f " +
        f"$fetched%5d/$total%-5d $eq")

      // retire cost: index-scan resolution vs the r11 idmap point
      // lookup (side table backfilled once from the committed index)
      val idsA = spark.range(100, 104).select(col("id").as("vec_id"))
      val tA = System.nanoTime()
      IncrementalAnn.retire(spark, idx, idsA, "vec_id", keepVersions = 2)
      val scanRetireS = (System.nanoTime() - tA) / 1e9
      val tB = System.nanoTime()
      IncrementalAnn.buildIdMap(spark, idx, "vec_id")
      val buildS = (System.nanoTime() - tB) / 1e9
      val idsB = spark.range(200, 204).select(col("id").as("vec_id"))
      val tC = System.nanoTime()
      IncrementalAnn.retire(spark, idx, idsB, "vec_id", keepVersions = 2)
      val mapRetireS = (System.nanoTime() - tC) / 1e9
      println(f"[annindex]   retire 4 ids: scan $scanRetireS%5.2f s -> " +
        f"idmap $mapRetireS%5.2f s (one-time backfill $buildS%5.1f s)")
    }
    spark.stop()
  }
}
