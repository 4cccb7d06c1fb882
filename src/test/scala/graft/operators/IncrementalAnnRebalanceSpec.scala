package graft.operators

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** [[IncrementalAnn.reassign]] / [[IncrementalAnn.rebalance]] — the
  * inter-subtree mass move splits cannot make: vectors whose CURRENT
  * nearest centroid changed (because a neighboring region split) are
  * re-homed atomically, restoring the assignment a fresh ingest
  * against today's centroids would produce. */
class IncrementalAnnRebalanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-annreb").toString

  // blob A (ids 0..19) near e1, blob B (20..39) near e2, blob C
  // (40..49) near e3
  private def corpus(): DataFrame = {
    val rows =
      (0L until 20L).map(i => (i, Array(1.0, 0.02 * i, 0.0, 0.0))) ++
      (20L until 40L).map(i => (i, Array(0.05, 1.0, 0.0, 0.0))) ++
      (40L until 50L).map(i => (i, Array(0.0, 0.0, 1.0, 0.1)))
    rows.toDF("vec_id", "embedding")
  }

  // ingest-time centroids: c0 covers A AND B, c1 covers C
  private def oldCents(): DataFrame = Seq(
    (0L, Array(0.7, 0.7, 0.0, 0.0)),
    (1L, Array(0.0, 0.0, 1.0, 0.0)),
  ).toDF("cell", "centroid")

  // after a split elsewhere planted c2 right on blob B: B's rows are
  // now DRIFTED (nearest centroid c2, home still c0)
  private def newCents(): DataFrame = oldCents().unionByName(
    Seq((2L, Array(0.0, 1.0, 0.0, 0.0))).toDF("cell", "centroid"))

  private def byCell(dir: String): Map[Long, Set[Long]] =
    IncrementalAnn.readIndex(spark, dir)
      .select(col("cell").cast("long"), col("vec_id"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  test("reassign re-homes exactly the drifted vectors, atomically, " +
      "and converges to the fresh-ingest assignment") {
    val dir = tmp()
    IncrementalAnn.ingest(corpus(), dir, oldCents(), "vec_id",
      "embedding", nBuckets = 8, keepVersions = 10, withIdMap = true)
    assert(byCell(dir) == Map(
      0L -> (0L until 40L).toSet, 1L -> (40L until 50L).toSet))

    val moved = IncrementalAnn.reassign(spark, dir, newCents(),
      Seq(0L, 1L), "vec_id", "embedding", keepVersions = 10)
    assert(moved == 20L, s"expected blob B (20 vectors) to move, got $moved")
    // the committed index IS the fresh assignment under today's
    // centroids — same argmax, same tie-breaks
    val fresh = Similarity.assignCells(corpus(), newCents(), "vec_id",
      "embedding").select(col("cell").cast("long"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IncrementalAnn.readIndex(spark, dir)
      .select(col("cell").cast("long"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == fresh)
    // idmap followed the movers: retiring a moved id really tombstones
    IncrementalAnn.retire(spark, dir, Seq(25L).toDF("vec_id"),
      "vec_id", keepVersions = 10)
    assert(!byCell(dir).values.exists(_.contains(25L)))
    // probing the NEW cell now finds blob B (nProbe=1 would miss it
    // entirely pre-rebalance: the drifted rows sat in c0)
    val q = Seq((777L, Array(0.05, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val hits = IncrementalAnn.topK(spark, dir, newCents(), q, "vec_id",
      "embedding", k = 5, nProbe = 1, smallIndexFiles = 0)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.forall(i => i >= 20L && i < 40L), hits)
  }

  test("re-running reassign repairs an idmap left stale by a crash " +
      "between the index and idmap commits") {
    val dir = tmp()
    IncrementalAnn.ingest(corpus(), dir, newCents(), "vec_id",
      "embedding", nBuckets = 8, keepVersions = 10, withIdMap = true)
    // simulate the crash window: the index is correct, but id 25's
    // idmap entry still points at a pre-move cell
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((25L, 0L)).toDF("vec_id", "cell"), s"$dir/_idmap",
      keys = Seq("vec_id"), orderCol = "", nBuckets = 64,
      keepVersions = 10)
    assert(IncrementalAnn.reassign(spark, dir, newCents(),
      Seq(0L, 1L, 2L), "vec_id", "embedding", keepVersions = 10) == 0L)
    // the repair re-pointed the entry: retiring 25 now really works
    IncrementalAnn.retire(spark, dir, Seq(25L).toDF("vec_id"),
      "vec_id", keepVersions = 10)
    assert(!byCell(dir).values.exists(_.contains(25L)))
  }

  test("a drift-free reassign moves nothing and commits nothing") {
    val dir = tmp()
    IncrementalAnn.ingest(corpus(), dir, newCents(), "vec_id",
      "embedding", nBuckets = 8, keepVersions = 10)
    val vBefore = SnapshotUpsert.versions(spark, dir)
    assert(IncrementalAnn.reassign(spark, dir, newCents(),
      Seq(0L, 1L, 2L), "vec_id", "embedding", keepVersions = 10) == 0L)
    assert(SnapshotUpsert.versions(spark, dir) == vBefore)
  }

  test("rebalance seeded on the new cell reaches the drift through " +
      "the neighbor expansion (the drifted rows live in a SIBLING)") {
    val dir = tmp()
    IncrementalAnn.ingest(corpus(), dir, oldCents(), "vec_id",
      "embedding", nBuckets = 8, keepVersions = 10)
    // seed ONLY cell 2 (empty — just planted by the 'split'); its
    // nearest sibling is c0, where blob B actually sits
    val moved = IncrementalAnn.rebalance(spark, dir, newCents(),
      Seq(2L), "vec_id", "embedding", neighbors = 1, keepVersions = 10)
    assert(moved == 20L, s"neighbor expansion must reach cell 0, got $moved")
    assert(byCell(dir)(2L) == (20L until 40L).toSet)
  }
}
