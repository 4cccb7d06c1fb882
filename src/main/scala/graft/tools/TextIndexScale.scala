package graft.tools

import graft.operators.{IncrementalText, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The standing-inverted-index scale rehearsal: does BM25 retrieval
  * against the committed index stay FLAT across corpus decades while
  * the fresh bm25TopK (which re-tokenizes the corpus per query batch)
  * grows with it — and does the fetched slice stay the probed-buckets
  * fraction the design claims?
  *
  * For each docs dir, measures:
  *   - ingest_s: the two-half index build (tokenize + commit, the
  *     one-time cost a deployment pays per ingest batch);
  *   - inc_s: IncrementalText.topK wall-clock (warm, best of 3) —
  *     index read + scoring, the per-query-batch deployment cost;
  *   - fresh_s: TextAnalysis.bm25TopK on the same corpus/queries
  *     (warm, best of 3) — the recompute-from-text alternative;
  *   - files: postings files fetched vs total in the manifest;
  *   - equal: the two rankings are identical (the parity invariant).
  *
  * Usage: runMain graft.tools.TextIndexScale <docsDir1> [docsDir2 ...]
  * (each dir holds a documents.parquet; generate decades with
  *  ScaleUp docsOnly. nBuckets scales with the dir index to keep a
  *  bucket a bounded fetch unit, the sizing rule the operator doc
  *  states.)
  *
  * `--split-budget=<bytes>` (r11) rehearses the in-place bucket-split
  * growth path: after the two-half build, IncrementalText.maintain
  * splits every postings bucket over the budget, then a THIRD ingest
  * (the corpus re-keyed as new doc ids) lands on the mixed layout —
  * proving ingest cost stays slice-sized THROUGH a split and
  * retrieval stays exact (parity re-checked against bm25TopK on the
  * doubled corpus).
  */
object TextIndexScale {
  def main(rawArgs: Array[String]): Unit = {
    val splitBudget: Option[Long] = rawArgs
      .find(_.startsWith("--split-budget="))
      .map(_.stripPrefix("--split-budget=").toLong)
    val args = rawArgs.filterNot(_.startsWith("--"))
    require(args.nonEmpty, "usage: TextIndexScale [--split-budget=N] <docsDir>...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val qs = Seq((0L, "spark merge join"), (1L, "vector window stream"),
      (2L, "customer slow filter")).toDF("query_id", "qtext")

    println(f"[textindex] ${"dir"}%-14s ${"docs"}%9s ${"nbkt"}%5s " +
      f"${"ingest_s"}%9s ${"inc_s"}%7s ${"fresh_s"}%8s ${"files"}%9s eq")
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      // sizing rule: buckets grow with the corpus so one bucket stays a
      // bounded fetch unit (~sqrt-ish growth is fine for the rehearsal)
      val nBuckets = math.max(16, math.min(4096,
        (n / 2000).toInt)) // ~2k docs' postings per bucket
      val idx = java.nio.file.Files
        .createTempDirectory("graft-textscale").toString
      val t0 = System.nanoTime()
      IncrementalText.ingest(docs.where(col("doc_id") % 2 === 0), idx,
        "text", "doc_id", nBuckets = nBuckets)
      IncrementalText.ingest(docs.where(col("doc_id") % 2 === 1), idx,
        "text", "doc_id", nBuckets = nBuckets)
      val ingestS = (System.nanoTime() - t0) / 1e9

      val incDf = IncrementalText.topK(spark, idx, qs, "query_id", "qtext")
      val fetchedFiles = incDf.inputFiles
        .count(_.contains("/postings/"))
      val totalFiles = graft.streaming.SnapshotUpsert
        .readSnapshot(spark, s"$idx/postings").inputFiles.length
      val incS = Timing.best3(() =>
        IncrementalText.topK(spark, idx, qs, "query_id", "qtext"))
      val freshS = Timing.best3(() =>
        TextAnalysis.bm25TopK(docs, qs, "text", "doc_id",
          "query_id", "qtext"))
      val inc = incDf.collect().map(_.toSeq).toSet
      val fresh = TextAnalysis.bm25TopK(docs, qs, "text", "doc_id",
        "query_id", "qtext").collect().map(_.toSeq).toSet
      println(f"[textindex] ${new java.io.File(dir).getName}%-14s $n%9d " +
        f"$nBuckets%5d $ingestS%9.1f $incS%7.2f $freshS%8.2f " +
        f"$fetchedFiles%4d/$totalFiles%-4d ${inc == fresh}")

      splitBudget.foreach { budget =>
        val ts = System.nanoTime()
        val split = IncrementalText.maintain(spark, idx, budget,
          keepVersions = 2)
        val splitS = (System.nanoTime() - ts) / 1e9
        // a third ingest ONTO the mixed layout: the same corpus
        // re-keyed as brand-new docs (doubles the index)
        val newDocs = docs.select((col("doc_id") + n).as("doc_id"),
          col("text"))
        val t3 = System.nanoTime()
        IncrementalText.ingest(newDocs, idx, "text", "doc_id",
          nBuckets = nBuckets)
        val ingest3S = (System.nanoTime() - t3) / 1e9
        val total3 = graft.streaming.SnapshotUpsert
          .readSnapshot(spark, s"$idx/postings").inputFiles.length
        val inc3Df = IncrementalText.topK(spark, idx, qs, "query_id",
          "qtext")
        val fetched3 = inc3Df.inputFiles.count(_.contains("/postings/"))
        val inc3S = Timing.best3(() =>
          IncrementalText.topK(spark, idx, qs, "query_id", "qtext"))
        val all = docs.unionByName(newDocs)
        val fresh3 = TextAnalysis.bm25TopK(all, qs, "text", "doc_id",
          "query_id", "qtext").collect().map(_.toSeq).toSet
        val inc3 = inc3Df.collect().map(_.toSeq).toSet
        println(f"[textindex]   +split: ${split.size}%3d buckets in " +
          f"$splitS%5.1f s; ingest3 $ingest3S%6.1f s (2-half was " +
          f"$ingestS%5.1f s); inc3 $inc3S%5.2f s " +
          f"$fetched3%4d/$total3%-4d eq=${inc3 == fresh3}")
      }
    }
    spark.stop()
  }
}
