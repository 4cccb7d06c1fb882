package graft.operators

import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 retrieval against a STANDING inverted index — the third
  * standing-index operator next to [[IncrementalDedup]] (LSH) and
  * [[IncrementalAnn]] (IVF), and the incremental form of
  * [[TextAnalysis.bm25TopK]]: the postings live in a [[SnapshotUpsert]]
  * table, each ingest tokenizes ONLY its batch and commits the batch's
  * postings as the next version (never re-tokenizing the corpus), and
  * retrieval reads ONLY the query terms' buckets — the inverted-index
  * fetch, manifest-pruned, never a corpus scan.
  *
  * Index layout (two snapshot tables under `indexDir`):
  *   - `postings/` — one row per (term, doc): `(term, doc_id, tf_cnt,
  *     n_toks)`, keyed on (term, doc_id) and BUCKETED BY `term` alone
  *     (the `bucketCols` prefix), so [[SnapshotUpsert.readKeys]] probed
  *     with a query's terms prunes to exactly those terms' buckets. At
  *     100 TB a 10-term query reads ~10 bucket files, not the index.
  *   - `doclen/` — one row per doc: `(doc_id, dl)`, the corpus-stats
  *     side (n_docs, sum_dl = one aggregate over this narrow table;
  *     at billions of docs that is a two-column scan, the honest cost
  *     of EXACT corpus-wide idf/avgdl — cache it between batches if
  *     retrieval QPS demands).
  *
  * Scores are BIT-IDENTICAL to [[TextAnalysis.bm25TopK]] over the
  * accumulated corpus: same tokenizer ([[Dedup.words]]), same integer
  * micro-unit contribution sum, same tie-break — oracle-gated as
  * `q_text_bm25_incremental` against the `q_text_bm25` recompute.
  *
  * Contract: a doc's ingest is append-or-identical-replay. Replays
  * converge (keyed upsert: the same postings re-state themselves), but
  * a CHANGED re-ingest of a doc would leave postings of its REMOVED
  * terms behind (they are other keys) — to update a doc, [[retire]] it
  * first, then ingest the new text. Retire takes the docs WITH text
  * for the same reason: the (term, doc_id) keys to tombstone are the
  * doc's own terms.
  */
object IncrementalText {

  private def postingsDir(indexDir: String) = s"$indexDir/postings"
  private def doclenDir(indexDir: String) = s"$indexDir/doclen"

  /** One postings row per (term, doc) of the batch — the exact tf/dl
    * expressions of [[TextAnalysis.bm25TopK]] (tf = a filter-count
    * inside the materialized words array; a doc with no tokens keeps
    * one NULL-term row, which no real query term ever probes). */
  private def postingsOf(batch: DataFrame, textCol: String,
      idCol: String): DataFrame =
    batch
      .select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__ws"))
      .select(col("doc_id"), col("__ws"), size(col("__ws")).as("n_toks"),
        explode_outer(array_distinct(col("__ws"))).as("term"))
      .withColumn("tf_cnt",
        size(filter(col("__ws"), w => w === col("term"))).cast("long"))
      .select(col("term"), col("doc_id"), col("tf_cnt"), col("n_toks"))

  /** Add (or identically replay) a batch of docs to the standing
    * index: two atomic commits — the batch's postings (term-bucketed)
    * and its doc lengths. Tokenization touches ONLY the batch. */
  def ingest(batch: DataFrame, indexDir: String, textCol: String,
      idCol: String, nBuckets: Int = 64, keepVersions: Int = 2): Unit = {
    SnapshotUpsert.upsertBatchSnapshot(postingsOf(batch, textCol, idCol),
      postingsDir(indexDir), keys = Seq("term", "doc_id"), orderCol = "",
      nBuckets = nBuckets, keepVersions = keepVersions,
      bucketCols = Seq("term"))
    SnapshotUpsert.upsertBatchSnapshot(
      batch.select(col(idCol).as("doc_id"),
        size(Dedup.words(col(textCol))).cast("long").as("dl")),
      doclenDir(indexDir), keys = Seq("doc_id"), orderCol = "",
      nBuckets = nBuckets, keepVersions = keepVersions)
  }

  /** Top-k docs per keyword query from the COMMITTED index — the
    * result [[TextAnalysis.bm25TopK]] would produce over the whole
    * accumulated corpus, computed from the query terms' buckets plus
    * one aggregate over the doclen table. Output: (query_id, doc_id,
    * bm25, rank), identical tie-break (score desc, doc_id asc). */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val qterms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(Dedup.words(col(qTextCol)))).as("term"))
    // the inverted-index fetch: ONLY the probed terms' buckets are read
    val postings = SnapshotUpsert.readKeys(spark, postingsDir(indexDir),
      qterms.select(col("term")).distinct(), Seq("term"))
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val stats = SnapshotUpsert.readSnapshot(spark, doclenDir(indexDir))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)))
    val w = col("tf_cnt").cast("double") * (k1 + 1) /
      (col("tf_cnt") + lit(k1) * (lit(1.0 - b) + lit(b) * col("n_toks") / avgdl))
    val contrib = postings.join(broadcast(qterms), "term")
      .join(docFreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(idf * w * 1e6).cast("long").as("c_micro"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("c_micro")).as("s_micro"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("s_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        (round(col("s_micro") / 1e6, 6) + lit(0.0)).as("bm25"), col("rank"))
  }

  /** Tombstone retired docs out of the index. `docs` carries the
    * retired docs WITH their text (the tombstoned (term, doc_id) keys
    * are the docs' own terms — see object doc); both tables commit the
    * removal atomically, layouts from their current manifests. */
  def retire(spark: SparkSession, indexDir: String, docs: DataFrame,
      textCol: String, idCol: String, keepVersions: Int = 2): Unit = {
    val tombs = postingsOf(docs, textCol, idCol)
      .select(col("term"), col("doc_id"),
        lit(null).cast("long").as("tf_cnt"),
        lit(null).cast("int").as("n_toks"))
      .withColumn("_deleted", lit(true))
    SnapshotUpsert.upsertBatchSnapshot(tombs, postingsDir(indexDir),
      keys = Seq("term", "doc_id"), orderCol = "",
      nBuckets = SnapshotUpsert.currentBuckets(spark, postingsDir(indexDir))
        .getOrElse(sys.error(s"retire: no committed index at $indexDir")),
      keepVersions = keepVersions, tombstoneCol = Some("_deleted"),
      bucketCols = Seq("term"))
    SnapshotUpsert.upsertBatchSnapshot(
      docs.select(col(idCol).as("doc_id"),
          lit(null).cast("long").as("dl"))
        .withColumn("_deleted", lit(true)),
      doclenDir(indexDir), keys = Seq("doc_id"), orderCol = "",
      nBuckets = SnapshotUpsert.currentBuckets(spark, doclenDir(indexDir))
        .getOrElse(sys.error(s"retire: no committed index at $indexDir")),
      keepVersions = keepVersions, tombstoneCol = Some("_deleted"))
  }
}
