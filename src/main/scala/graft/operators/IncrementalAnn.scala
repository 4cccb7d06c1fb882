package graft.operators

import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF similarity search over a STANDING index — the ANN twin of
  * [[IncrementalDedup]]: cell assignments live in a [[SnapshotUpsert]]
  * table, so embedding batches are ingested incrementally (assign
  * against FIXED centroids, commit the assigned rows atomically) and
  * queries probe the committed index — no re-clustering or re-assigning
  * of the corpus per ingest, the daily-embedding-ingest shape at
  * 100 TB.
  *
  * Centroids are the caller's and must stay FIXED for the life of the
  * index (cells are a function of them — the same contract as
  * [[Similarity.assignCells]]'s oracle-checkable path; train them once
  * with [[Similarity.ivfIndex]] or pin deterministic ones). When the
  * corpus outgrows the centroid count (the sqrt-N rule,
  * [[Similarity.autoCells]]), retrain and rebuild the index — a
  * table-sized rewrite, like [[SnapshotUpsert.rebucket]].
  *
  * Index layout: one row per vector — `(id, cell, vector)`, keyed on
  * the id, merged in arrival order: a re-ingested vector re-states (or,
  * if its embedding changed, re-assigns) itself idempotently; retired
  * vectors are tombstoned out and stop matching from the next version.
  * Search is exactly [[Similarity.ivfTopK]] over the committed
  * assignment — probe nProbe cells, exact-rerank inside.
  */
object IncrementalAnn {

  /** One ingest step: assign the batch against the fixed centroids and
    * commit the assigned rows as the index's next version. */
  def ingest(batch: DataFrame, indexDir: String, centroids: DataFrame,
      idCol: String, vecCol: String, nBuckets: Int = 64,
      keepVersions: Int = 2): Unit = {
    val assigned = Similarity.assignCells(batch, centroids, idCol, vecCol)
      .select(col(idCol), col("cell"), col(vecCol))
    SnapshotUpsert.upsertBatchSnapshot(assigned, indexDir,
      keys = Seq(idCol), orderCol = "", nBuckets = nBuckets,
      keepVersions = keepVersions)
  }

  /** The committed index (id, cell, vector) at its current version. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    SnapshotUpsert.readSnapshot(spark, indexDir)

  /** Approximate top-k of `queries` against the committed index:
    * probe + exact rerank, identical semantics to running
    * [[Similarity.ivfTopK]] over the freshly-assigned whole corpus. */
  def topK(spark: SparkSession, indexDir: String, centroids: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int = 5,
      nProbe: Int = 4): DataFrame =
    Similarity.ivfTopK(readIndex(spark, indexDir), centroids, queries,
      idCol, vecCol, k = k, nProbe = nProbe)

  /** Tombstone retired vectors out of the index. `ids` carries one
    * row per retired id in column `idCol`. */
  def retire(spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String, keepVersions: Int = 2): Unit = {
    val fields = readIndex(spark, indexDir).schema.fields
    // resolve the key by the RECORDED name, loudly: Spark resolution is
    // case-insensitive, so a case-variant idCol would otherwise let the
    // null-fill below silently replace the id column and tombstone key
    // NULL — a retire that retires nothing without an error
    require(fields.exists(_.name == idCol), {
      val variant = fields.find(_.name.equalsIgnoreCase(idCol)).map(_.name)
      s"retire: no column '$idCol' in the index" +
        variant.fold("")(v => s" (did you mean '$v'? names are exact here)")
    })
    // null-fill every non-key column with its RECORDED type (cell and
    // vector types follow whatever the ingested batches carried); the
    // bucket count likewise comes from the current manifest, not a
    // restated parameter
    val tombs = fields.filterNot(_.name == idCol)
      .foldLeft(ids.select(col(idCol)))((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
      .withColumn("_deleted", lit(true))
    SnapshotUpsert.upsertBatchSnapshot(tombs, indexDir, keys = Seq(idCol),
      orderCol = "",
      nBuckets = SnapshotUpsert.currentBuckets(spark, indexDir).get,
      keepVersions = keepVersions, tombstoneCol = Some("_deleted"))
  }
}
