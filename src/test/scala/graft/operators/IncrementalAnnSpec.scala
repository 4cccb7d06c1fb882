package graft.operators

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The standing IVF index: incremental ingests must search identically
  * to a fresh whole-corpus assignment, replays converge, retired
  * vectors stop matching. */
class IncrementalAnnSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-inc-ann").toString

  private lazy val embeddings =
    graft.queries.QueryDef.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))

  private lazy val centroids = embeddings.filter(col("vec_id") < 16)
    .select(col("vec_id").as("cell"),
      col("embedding").cast("array<double>").as("centroid"))

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

  test("two-half ingest searches identically to the fresh whole-corpus " +
      "assignment") {
    val dir = tmp()
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") % 2 === 0), dir,
      centroids, "vec_id", "embedding", nBuckets = 16)
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") % 2 === 1), dir,
      centroids, "vec_id", "embedding", nBuckets = 16)
    val queries = embeddings.filter(col("vec_id") < 8)
    val incremental = topkSet(IncrementalAnn.topK(spark, dir, centroids,
      queries, "vec_id", "embedding", k = 5, nProbe = 4))
    val fresh = topkSet(Similarity.ivfTopK(
      Similarity.assignCells(embeddings, centroids, "vec_id", "embedding"),
      centroids, queries, "vec_id", "embedding", k = 5, nProbe = 4))
    assert(incremental.nonEmpty && incremental == fresh)
  }

  test("replayed ingest converges; retired vectors stop matching") {
    val dir = tmp()
    val half = embeddings.filter(col("vec_id") % 2 === 0)
    IncrementalAnn.ingest(half, dir, centroids, "vec_id", "embedding",
      nBuckets = 16, keepVersions = 10)
    val before = IncrementalAnn.readIndex(spark, dir)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    IncrementalAnn.ingest(half, dir, centroids, "vec_id", "embedding",
      nBuckets = 16, keepVersions = 10)
    assert(IncrementalAnn.readIndex(spark, dir)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    // retire a vector that currently appears as some query's neighbor
    val queries = embeddings.filter(col("vec_id") < 4)
    val hit = IncrementalAnn.topK(spark, dir, centroids, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
      .select(col("neighbor_id")).head().getLong(0)
    import spark.implicits._
    // a case-variant key name is refused loudly (silent null-key
    // tombstoning would retire nothing)
    val e = intercept[IllegalArgumentException] {
      IncrementalAnn.retire(spark, dir, Seq(hit).toDF("vec_id"), "VEC_ID")
    }
    assert(e.getMessage.contains("exact"), e.getMessage)
    IncrementalAnn.retire(spark, dir, Seq(hit).toDF("vec_id"), "vec_id",
      keepVersions = 10)
    val after = IncrementalAnn.topK(spark, dir, centroids, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    assert(!after.contains(hit), s"retired vector $hit must not match")
    // the pre-retire version is still time-travel-readable
    val vs = SnapshotUpsert.versions(spark, dir)
    assert(SnapshotUpsert.readVersion(spark, dir, vs.init.last)
      .where(col("vec_id") === hit).count() == 1)
  }

  test("idmap side table: retire resolves cells by point lookup, keeps " +
      "the map mirroring live ids, and backfill upgrades an old index") {
    import spark.implicits._
    val dir = tmp()
    // ingest WITH the idmap maintained
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") < 32), dir,
      centroids, "vec_id", "embedding", nBuckets = 16, keepVersions = 10,
      withIdMap = true)
    IncrementalAnn.ingest(
      embeddings.filter(col("vec_id") >= 32 && col("vec_id") < 64), dir,
      centroids, "vec_id", "embedding", nBuckets = 16, keepVersions = 10,
      withIdMap = true)
    val idmap = graft.streaming.SnapshotUpsert
      .readSnapshot(spark, s"$dir/_idmap")
    assert(idmap.count() == 64)
    // idmap content == the index's (id, cell) projection
    assert(idmap.collect().map(r => (r.getLong(0), r.get(1))).toSet ==
      IncrementalAnn.readIndex(spark, dir)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.get(1))).toSet)
    // retire through the idmap path: gone from index AND idmap
    IncrementalAnn.retire(spark, dir, Seq(5L, 17L).toDF("vec_id"),
      "vec_id", keepVersions = 10)
    assert(IncrementalAnn.readIndex(spark, dir)
      .where(col("vec_id").isin(5L, 17L)).count() == 0)
    assert(graft.streaming.SnapshotUpsert
      .readSnapshot(spark, s"$dir/_idmap")
      .where(col("vec_id").isin(5L, 17L)).count() == 0)
    assert(IncrementalAnn.readIndex(spark, dir).count() == 62)
    // a retired id re-ingests cleanly and reappears in both
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") === 5L), dir,
      centroids, "vec_id", "embedding", nBuckets = 16, keepVersions = 10,
      withIdMap = true)
    assert(IncrementalAnn.readIndex(spark, dir)
      .where(col("vec_id") === 5L).count() == 1)
    assert(graft.streaming.SnapshotUpsert
      .readSnapshot(spark, s"$dir/_idmap")
      .where(col("vec_id") === 5L).count() == 1)

    // BACKFILL path: an index built without the idmap gains one
    val dir2 = tmp()
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") < 32), dir2,
      centroids, "vec_id", "embedding", nBuckets = 16, keepVersions = 10)
    IncrementalAnn.buildIdMap(spark, dir2, "vec_id", keepVersions = 10)
    IncrementalAnn.retire(spark, dir2, Seq(3L).toDF("vec_id"), "vec_id",
      keepVersions = 10)
    assert(IncrementalAnn.readIndex(spark, dir2)
      .where(col("vec_id") === 3L).count() == 0)
    assert(graft.streaming.SnapshotUpsert
      .readSnapshot(spark, s"$dir2/_idmap").count() == 31)
  }

  test("topK reads only the probed cells' buckets (inverted-file fetch)") {
    val dir = tmp()
    IncrementalAnn.ingest(embeddings, dir, centroids, "vec_id",
      "embedding", nBuckets = 16)
    val queries = embeddings.filter(col("vec_id") < 2)
    // the LAZY plan exposes the pruned read for inspection (the public
    // topK materializes and releases its probe checkpoint immediately)
    // smallIndexFiles = 0 forces the pruned path (this fixture is far
    // below the adaptive full-scan threshold)
    val (prunedPlan, probes) = IncrementalAnn.topKLazy(spark, dir,
      centroids, queries, "vec_id", "embedding", k = 3, nProbe = 2,
      smallIndexFiles = 0)
    val marker = new java.io.File(dir).getName
    val prunedIdx = prunedPlan.inputFiles.count(_.contains(marker))
    val fullIdx = IncrementalAnn.readIndex(spark, dir).inputFiles.length
    assert(prunedIdx > 0 && prunedIdx < fullIdx,
      s"probed $prunedIdx of $fullIdx index files")
    probes.unpersist(false)
    val pruned = IncrementalAnn.topK(spark, dir, centroids, queries,
      "vec_id", "embedding", k = 3, nProbe = 2)
    // and the pruned search still matches the fresh whole-corpus run
    assert(topkSet(pruned) == topkSet(Similarity.ivfTopK(
      Similarity.assignCells(embeddings, centroids, "vec_id", "embedding"),
      centroids, queries, "vec_id", "embedding", k = 3, nProbe = 2)))
  }

  test("a changed embedding is retire-then-ingest: exactly one row survives") {
    import spark.implicits._
    val dir = tmp()
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") < 32), dir,
      centroids, "vec_id", "embedding", nBuckets = 16, keepVersions = 10)
    // re-embed vector 20 with vector 3's embedding (a different cell
    // in general): the documented update path is retire + ingest
    val updated = embeddings.filter(col("vec_id") === 3)
      .select(lit(20L).as("vec_id"), col("embedding"))
    IncrementalAnn.retire(spark, dir, Seq(20L).toDF("vec_id"), "vec_id",
      keepVersions = 10)
    IncrementalAnn.ingest(updated, dir, centroids, "vec_id", "embedding",
      nBuckets = 16, keepVersions = 10)
    val rows = IncrementalAnn.readIndex(spark, dir)
      .where(col("vec_id") === 20L).collect()
    assert(rows.length == 1, s"exactly one row for the updated id: ${rows.length}")
    val freshCell = Similarity.assignCells(updated, centroids,
      "vec_id", "embedding").select(col("cell")).head().getLong(0)
    assert(rows.head.getLong(1) == freshCell)
  }

  test("ingestPq/topKPq: stored-code ADC search equals the fresh IVF-PQ") {
    val dir = tmp()
    val cb = Similarity.pqCodebook(embeddings, "vec_id", "embedding",
      m = 16, k = 16)
    IncrementalAnn.ingestPq(embeddings.filter(col("vec_id") % 2 === 0),
      dir, centroids, cb, "vec_id", "embedding", m = 16, nBuckets = 16)
    IncrementalAnn.ingestPq(embeddings.filter(col("vec_id") % 2 === 1),
      dir, centroids, cb, "vec_id", "embedding", m = 16, nBuckets = 16)
    val queries = embeddings.filter(col("vec_id") < 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4))).toSet
    val inc = rows(IncrementalAnn.topKPq(spark, dir, centroids, cb,
      queries, "vec_id", "embedding", k = 5, m = 16, nProbe = 8,
      rerank = 128))
    val fresh = rows(Similarity.ivfPqTopK(
      Similarity.assignCells(embeddings, centroids, "vec_id", "embedding"),
      centroids, cb, queries, "vec_id", "embedding", k = 5, m = 16,
      nProbe = 8, rerank = 128))
    assert(inc.nonEmpty && inc == fresh)
    // retire drops a PQ row too (codes null-filled at recorded type)
    import spark.implicits._
    val victim = inc.head._2
    IncrementalAnn.retire(spark, dir, Seq(victim).toDF("vec_id"), "vec_id")
    assert(IncrementalAnn.readIndex(spark, dir)
      .where(col("vec_id") === victim).count() == 0)
  }

  test("verifyNoReassign turns a changed-embedding re-ingest into a loud error") {
    val dir = tmp()
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") < 32), dir,
      centroids, "vec_id", "embedding", nBuckets = 16)
    // replace vec 20's embedding with a centroid vector from a cell it
    // is NOT currently in — guaranteed to re-assign
    val curCell = IncrementalAnn.readIndex(spark, dir)
      .where(col("vec_id") === 20L).head().getLong(1)
    val targetCell = if (curCell == 3L) 5L else 3L
    val moved = embeddings.filter(col("vec_id") === targetCell)
      .select(lit(20L).as("vec_id"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      IncrementalAnn.ingest(moved, dir, centroids, "vec_id", "embedding",
        nBuckets = 16, verifyNoReassign = true)
    }
    assert(e.getMessage.contains("retire"), e.getMessage)
    // an identical replay passes the guard
    IncrementalAnn.ingest(embeddings.filter(col("vec_id") < 32), dir,
      centroids, "vec_id", "embedding", nBuckets = 16,
      verifyNoReassign = true)
  }
}
