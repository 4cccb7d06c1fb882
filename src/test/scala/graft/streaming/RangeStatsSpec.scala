package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Declared clustering + manifest file stats + range-pruned reads
  * ([[SnapshotUpsert.ClusterColsProp]] / [[SnapshotUpsert.readRange]]):
  * writers sort staged files by the clustering columns and record
  * per-file min/max in the manifest; a range read prunes files from
  * the manifest alone. Pruning must be CONSERVATIVE (missing stats =
  * read the file) and the exact predicate always applies after it, so
  * every test here asserts readRange == full read + filter, then
  * separately asserts the pruning actually happened. */
class RangeStatsSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-range").toString

  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "status", "v")
  }

  private val clusterV = Map(SnapshotUpsert.ClusterColsProp -> "v")

  private def rangeSet(dir: String, lo: Long, hi: Long) =
    SnapshotUpsert.readRange(spark, dir, "v", lo, hi).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def fullFiltered(dir: String, lo: Long, hi: Long) =
    SnapshotUpsert.readSnapshot(spark, dir)
      .where(col("v") >= lo && col("v") <= hi).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("a clustered table prunes a range read to the overlapping files " +
      "and matches the full read + filter exactly") {
    val dir = tmp()
    // each key's v doubles as its cluster value; 100 keys across 8
    // buckets, v in [0, 100)
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 100L).map(i => (i, "seed", i)): _*), dir, Seq("id"),
      "", nBuckets = 8, props = clusterV)
    assert(rangeSet(dir, 10L, 19L) == fullFiltered(dir, 10L, 19L))
    assert(rangeSet(dir, 10L, 19L).size == 10)
    // every bucket's single file spans most of [0,100) (keys hash
    // round-robin-ish), so a narrow range may keep everything — now
    // concentrate: rewrite so each bucket holds a narrow v-slice by
    // keying the bucket to the slice
    val dir2 = tmp()
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 100L).map(i => (i, "seed", i)): _*), dir2,
      Seq("id"), "", nBuckets = 8, bucketCols = Seq("id"),
      props = clusterV)
    // per-bucket files exist; the disjointness proof comes from the
    // recorded stats, whatever the bucket->range mapping turned out to
    // be: a range covering NO v values prunes everything
    val (kept0, total0) = SnapshotUpsert.rangeKept(spark, dir2, "v",
      "500", "600")
    assert(total0 > 0 && kept0 == 0, s"all files prunable: $kept0/$total0")
    assert(rangeSet(dir2, 500L, 600L).isEmpty)
    // and a full-span range keeps everything
    val (kept1, total1) = SnapshotUpsert.rangeKept(spark, dir2, "v",
      "0", "99")
    assert(kept1 == total1)
  }

  test("time-shaped layout: a day-prefix-bucketed table prunes a window " +
      "read to the matching days' files") {
    import spark.implicits._
    val dir = tmp()
    // the deployment shape for time-ranged serving: key (day, id),
    // bucketed by the day prefix, clustered by the event value — each
    // day's rows land in that day's bucket, whose recorded v-range is
    // narrow, so a window read opens only the overlapping days
    val rows = for (day <- 0L until 10L; i <- 0L until 10L)
      yield (day, day * 10L + i, s"d$day", day * 10L + i)
    SnapshotUpsert.upsertBatchSnapshot(
      rows.toDF("day", "id", "status", "v"), dir, Seq("day", "id"), "",
      nBuckets = 16, bucketCols = Seq("day"), props = clusterV)
    def window(lo: Long, hi: Long) =
      SnapshotUpsert.readRange(spark, dir, "v", lo, hi).collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
    val expect = SnapshotUpsert.readSnapshot(spark, dir)
      .where(col("v") >= 42L && col("v") <= 47L).collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet
    assert(window(42L, 47L) == expect)
    assert(window(42L, 47L).size == 6)
    val (kept, total) = SnapshotUpsert.rangeKept(spark, dir, "v", "42", "47")
    assert(kept < total,
      s"a narrow window must prune day-bucketed files: $kept/$total")
    // six consecutive v values span at most 2 days; a day-colliding
    // bucket's file covers both its days' ranges, so allow a couple of
    // collision-widened keeps — the point is the order of magnitude
    assert(kept <= 4, s"a 2-day window keeps ~2 (+collisions) files: $kept")
  }

  test("a layered bucket is all-or-nothing: an out-of-range base winner " +
      "suppresses its in-range layer loser (per-file pruning would lie)") {
    val dir = tmp()
    // key 1: base row with HIGH order (9) and v=100 (outside the
    // queried range); a delta layer then states a LOSING row (order 5)
    // with v=5 (inside the range). The true winner is the base row, so
    // key 1 must NOT appear in readRange(0, 10).
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "base", 100L)), dir,
      Seq("id"), "status", nBuckets = 2, props = clusterV)
    // orderCol = "status": "base" > "layer"? order by string — make it
    // explicit: base "z-high" beats layer "a-low"
    val dir2 = tmp()
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "z-high", 100L)), dir2,
      Seq("id"), "status", nBuckets = 2, props = clusterV)
    SnapshotUpsert.appendDeltaSnapshot(df((1L, "a-low", 5L)), dir2,
      Seq("id"), "status", nBuckets = 2)
    assert(fullFiltered(dir2, 0L, 10L).isEmpty,
      "the losing layer row must not shadow the winning base row")
    assert(rangeSet(dir2, 0L, 10L) == fullFiltered(dir2, 0L, 10L))
    // but when EVERY file of the layered bucket is out of range, the
    // whole bucket prunes
    val (kept, total) = SnapshotUpsert.rangeKept(spark, dir2, "v",
      "200", "300")
    assert(kept == 0 && total > 0)
    assert(rangeSet(dir2, 200L, 300L).isEmpty)
  }

  test("nulls in the clustering column never match a range and never " +
      "poison pruning; an unsupported type records no stats but reads " +
      "stay exact") {
    import spark.implicits._
    val dir = tmp()
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "a", java.lang.Long.valueOf(5L)),
        org.apache.spark.sql.Row(2L, "b", null),
        org.apache.spark.sql.Row(3L, "c", java.lang.Long.valueOf(50L))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, status STRING, v BIGINT"))
    SnapshotUpsert.upsertBatchSnapshot(rows, dir, Seq("id"), "",
      nBuckets = 2, props = clusterV)
    assert(rangeSet(dir, 0L, 10L) == Set((1L, "a", 5L)))
    assert(rangeSet(dir, 0L, 100L) == Set((1L, "a", 5L), (3L, "c", 50L)))
    // unsupported clustering type: DOUBLE — no stats, no pruning, exact
    val dirD = tmp()
    val dd = Seq((1L, 1.5), (2L, 99.5)).toDF("id", "d")
    SnapshotUpsert.upsertBatchSnapshot(dd, dirD, Seq("id"), "",
      nBuckets = 2, props = Map(SnapshotUpsert.ClusterColsProp -> "d"))
    val got = SnapshotUpsert.readRange(spark, dirD, "d", 0.0, 2.0)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    val (kept, total) = SnapshotUpsert.rangeKept(spark, dirD, "d",
      "0.0", "2.0")
    assert(kept == total, "no stats for an unsupported type: keep all")
  }

  test("string and timestamp clustering: canonical-form pruning is exact") {
    import spark.implicits._
    val dir = tmp()
    val rows = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "mike"), (4L, "zulu"))
      .toDF("id", "s")
    SnapshotUpsert.upsertBatchSnapshot(rows, dir, Seq("id"), "",
      nBuckets = 2, bucketCols = Seq("id"),
      props = Map(SnapshotUpsert.ClusterColsProp -> "s"))
    val got = SnapshotUpsert.readRange(spark, dir, "s", "b", "n")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
    val dirT = tmp()
    val ts = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.5")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01.05")),
      (3L, java.sql.Timestamp.valueOf("2024-06-01 12:00:00")))
      .toDF("id", "t")
    SnapshotUpsert.upsertBatchSnapshot(ts, dirT, Seq("id"), "",
      nBuckets = 2, props = Map(SnapshotUpsert.ClusterColsProp -> "t"))
    val gotT = SnapshotUpsert.readRange(spark, dirT, "t",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00.6"),
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      .collect().map(_.getLong(0)).toSet
    assert(gotT == Set(2L))
  }

  test("stats survive compaction, split and rebucket; clustering declared " +
      "LATE leaves old files unpruned but reads exact") {
    val dir = tmp()
    // seed WITHOUT clustering
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 20L).map(i => (i, "seed", i)): _*), dir, Seq("id"), "",
      nBuckets = 2, bucketCols = Seq("id"))
    // declare clustering via a metadata-only commit; later commits
    // sort + record stats, old files stay stats-less (kept always)
    SnapshotUpsert.setProps(spark, dir, clusterV)
    SnapshotUpsert.appendDeltaSnapshot(
      df((100L, "new", 100L), (101L, "new", 101L)), dir, Seq("id"), "",
      nBuckets = 2)
    assert(rangeSet(dir, 0L, 5L) == fullFiltered(dir, 0L, 5L))
    assert(rangeSet(dir, 100L, 200L) == fullFiltered(dir, 100L, 200L))
    // compaction rewrites layered buckets WITH stats: now the whole
    // table carries them and a disjoint range prunes everything
    SnapshotUpsert.compactDeltas(spark, dir)
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 20L).map(i => (i, "re", i)): _*), dir, Seq("id"), "",
      nBuckets = 2, bucketCols = Seq("id"))
    val (kept, total) = SnapshotUpsert.rangeKept(spark, dir, "v",
      "5000", "6000")
    assert(kept == 0 && total > 0,
      s"fully re-statted table prunes a disjoint range: $kept/$total")
    // split + rebucket keep correctness and stats
    SnapshotUpsert.splitBucket(spark, dir, 0)
    assert(rangeSet(dir, 3L, 7L) == fullFiltered(dir, 3L, 7L))
    SnapshotUpsert.rebucket(spark, dir, 4, Seq("id"), bucketCols = Seq("id"))
    assert(rangeSet(dir, 3L, 7L) == fullFiltered(dir, 3L, 7L))
    val (kept2, total2) = SnapshotUpsert.rangeKept(spark, dir, "v",
      "5000", "6000")
    assert(kept2 == 0 && total2 > 0, "stats recomputed across rebucket")
  }
}
