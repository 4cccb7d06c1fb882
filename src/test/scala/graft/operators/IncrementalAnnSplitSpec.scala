package graft.operators

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** In-place cell splits for the standing IVF index
  * ([[IncrementalAnn.splitCell]]) — the centroid-level linear-hashing
  * move that retires the full-retrain maintenance event. Pins: content
  * preservation (no vector lost or duplicated, atomically), the
  * deterministic explicit-children path, idmap consistency for MOVED
  * ids (the retire-after-split invariant), learned-children recall,
  * and the oversized-cell maintenance sweep. */
class IncrementalAnnSplitSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-annsplit").toString

  // two well-separated blobs inside cell 0's region plus a far blob in
  // cell 1 — deterministic 4-dim vectors
  private def corpus(): DataFrame = {
    val rows =
      (0L until 20L).map(i => (i, Array(1.0, 0.02 * i, 0.0, 0.0))) ++
      (20L until 40L).map(i => (i, Array(0.05, 1.0, 0.0, 0.0))) ++
      (40L until 50L).map(i => (i, Array(0.0, 0.0, 1.0, 0.1)))
    rows.toDF("vec_id", "embedding")
  }

  private def centroids(): DataFrame = Seq(
    (0L, Array(0.7, 0.7, 0.0, 0.0)), // covers both near blobs
    (1L, Array(0.0, 0.0, 1.0, 0.0)),
  ).toDF("cell", "centroid")

  private def contents(dir: String): Set[(Long, Seq[Double])] =
    IncrementalAnn.readIndex(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet

  private def seed(dir: String, withIdMap: Boolean = false): Unit =
    IncrementalAnn.ingest(corpus(), dir, centroids(), "vec_id",
      "embedding", nBuckets = 8, keepVersions = 10,
      withIdMap = withIdMap)

  test("an explicit-children split moves exactly the argmax half, " +
      "atomically, preserving the index content") {
    val dir = tmp()
    seed(dir)
    val before = contents(dir)
    val updated = IncrementalAnn.splitCell(spark, dir, centroids(), 0L,
      "vec_id", "embedding", newCellId = Some(2L), keepVersions = 10,
      children = Some((Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))))
    // content identical — nothing lost, nothing duplicated
    assert(contents(dir) == before)
    // the second blob (ids 20..39) is nearer child 2 and moved there
    val byCell = IncrementalAnn.readIndex(spark, dir)
      .select(col("cell").cast("long"), col("vec_id"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byCell(0L) == (0L until 20L).toSet)
    assert(byCell(2L) == (20L until 40L).toSet)
    assert(byCell(1L) == (40L until 50L).toSet)
    // centroid table: cell 0 replaced by the two children, cell 1 kept
    val cents = updated.select(col("cell").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(cents == Set(0L, 1L, 2L))
  }

  test("search against the split index stays exact under full probes " +
      "and keeps recall under normal probes") {
    val dir = tmp()
    seed(dir)
    val queries = corpus().where(col("vec_id").isin(0L, 25L, 45L))
    val updated = IncrementalAnn.splitCell(spark, dir, centroids(), 0L,
      "vec_id", "embedding", newCellId = Some(2L), keepVersions = 10)
    def ids(df: DataFrame): Map[Long, Seq[Long]] = df
      .select("query_id", "neighbor_id", "rank").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    // full probes = exact brute-force, whatever the cell layout
    val brute = ids(Similarity.bruteForceTopK(corpus(), queries,
      "vec_id", "embedding", k = 3))
    val full = ids(IncrementalAnn.topK(spark, dir, updated, queries,
      "vec_id", "embedding", k = 3, nProbe = 3))
    assert(full == brute, s"full-probe search diverged: $full vs $brute")
    // nProbe = 1 on the finer layout: each query's own blob is its
    // nearest child cell, so top-3 stays the brute answer here
    val one = ids(IncrementalAnn.topK(spark, dir, updated, queries,
      "vec_id", "embedding", k = 3, nProbe = 1))
    assert(one == brute, s"nProbe=1 recall broke: $one vs $brute")
  }

  test("a moved id still retires cleanly through the idmap") {
    val dir = tmp()
    seed(dir, withIdMap = true)
    IncrementalAnn.splitCell(spark, dir, centroids(), 0L,
      "vec_id", "embedding", newCellId = Some(2L), keepVersions = 10,
      children = Some((Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))))
    // id 25 moved to cell 2; the idmap must say so, and retire must
    // actually remove the row (the stale-mapping failure would
    // tombstone (0, 25) — a no-op — and leave the vector searchable)
    IncrementalAnn.retire(spark, dir, Seq(25L).toDF("vec_id"), "vec_id",
      keepVersions = 10)
    val left = IncrementalAnn.readIndex(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!left.contains(25L), "retire of a moved id left it indexed")
    assert(left.size == 49)
  }

  test("splitOversized sweeps only the cells past the budget and " +
      "threads centroid updates through") {
    val dir = tmp()
    seed(dir)
    val updated = IncrementalAnn.splitOversized(spark, dir, centroids(),
      maxCellRows = 25L, idCol = "vec_id", vecCol = "embedding",
      keepVersions = 10)
    // cell 0 held 40 rows (> 25) and split; cell 1 held 10 and did not
    val sizes = IncrementalAnn.readIndex(spark, dir)
      .groupBy(col("cell").cast("long").as("c")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L), sizes.toString)
    assert(sizes(1L) == 10L)
    assert(sizes(0L) + sizes(2L) == 40L && sizes(0L) > 0 && sizes(2L) > 0,
      sizes.toString)
    assert(updated.count() == 3)
    // the learned children separate the two blobs (2-means quality)
    val byCell = IncrementalAnn.readIndex(spark, dir)
      .select(col("cell").cast("long"), col("vec_id"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val blobA = (0L until 20L).toSet
    val blobB = (20L until 40L).toSet
    assert(byCell(0L) == blobA && byCell(2L) == blobB ||
      byCell(0L) == blobB && byCell(2L) == blobA,
      s"2-means failed to separate the blobs: $byCell")
  }
}
