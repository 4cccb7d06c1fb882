package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** [[SnapshotUpsert.mergeInto]] — SQL MERGE semantics (conditional
  * update / delete / insert) on the snapshot table. Every test
  * compares against a hand-computed expected image, and the layer
  * contracts (atomic commit, feed visibility, fold-compaction of
  * layered buckets, retry-merge) are exercised through the same
  * public surfaces the other commit paths pin. */
class MergeIntoSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-merge").toString

  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "status", "cnt")
  }

  private def snapSet(dir: String): Set[(Long, String, Long)] =
    SnapshotUpsert.readSnapshot(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def seed(dir: String): Unit =
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 20L).map(i => (i, s"s$i", i)): _*), dir, Seq("id"),
      "", nBuckets = 4, keepVersions = 10)

  test("matched rows update via t/s expressions, unmatched source rows " +
      "insert, untouched target rows carry — the increment merge") {
    val dir = tmp()
    seed(dir)
    // source: overlap on ids 10..19, new ids 20..24
    SnapshotUpsert.mergeInto(
      df((10L until 25L).map(i => (i, s"n$i", 100L)): _*), dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") + col("s.cnt")),
        "status" -> col("s.status")),
      keepVersions = 10)
    val expect =
      (0L until 10L).map(i => (i, s"s$i", i)).toSet ++ // untouched
        (10L until 20L).map(i => (i, s"n$i", i + 100L)) ++ // updated
        (20L until 25L).map(i => (i, s"n$i", 100L)) // inserted
    assert(snapSet(dir) == expect)
  }

  test("delete clause removes matched rows and outranks update; " +
      "conditions gate both; insert=false makes it update-only") {
    val dir = tmp()
    seed(dir)
    SnapshotUpsert.mergeInto(
      df((0L until 30L).map(i => (i, "x", 1L)): _*), dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") + col("s.cnt"))),
      updateCond = Some(col("t.id") % 2 === 0),
      deleteCond = Some(col("t.id") % 5 === 0),
      insert = false,
      keepVersions = 10)
    val expect = (0L until 20L).flatMap { i =>
      if (i % 5 == 0) None // deleted (incl. i=0,10: delete beats update)
      else if (i % 2 == 0) Some((i, s"s$i", i + 1L)) // updated cnt only
      else Some((i, s"s$i", i)) // matched, no applicable action
    }.toSet
    assert(snapSet(dir) == expect) // ids 20..29 NOT inserted
  }

  test("updateAll replaces every non-key column; insertCond filters " +
      "inserts; assigning a key or a dup-key source is refused") {
    val dir = tmp()
    seed(dir)
    SnapshotUpsert.mergeInto(
      df((18L until 23L).map(i => (i, s"r$i", 777L)): _*), dir, Seq("id"),
      updateAll = true,
      insertCond = Some(col("s.id") % 2 === 0),
      keepVersions = 10)
    val expect =
      (0L until 18L).map(i => (i, s"s$i", i)).toSet ++
        Seq((18L, "r18", 777L), (19L, "r19", 777L)) ++ // replaced
        Seq((20L, "r20", 777L), (22L, "r22", 777L)) // even inserts only
    assert(snapSet(dir) == expect)

    val eKey = intercept[IllegalArgumentException] {
      SnapshotUpsert.mergeInto(df((1L, "a", 1L)), dir, Seq("id"),
        updateSet = Map("id" -> col("s.id")))
    }
    assert(eKey.getMessage.contains("cannot be assigned"))
    val eDup = intercept[IllegalArgumentException] {
      SnapshotUpsert.mergeInto(df((1L, "a", 1L), (1L, "b", 2L)), dir,
        Seq("id"))
    }
    assert(eDup.getMessage.contains("key-unique"))
  }

  test("a merge into a layered (merge-on-read) bucket folds the layers " +
      "first and compacts them in passing; the change feed reports the " +
      "merge's deletes") {
    val dir = tmp()
    seed(dir)
    // layer everything: newer status for ids 0..19 at a delta commit
    SnapshotUpsert.appendDeltaSnapshot(
      df((0L until 20L).map(i => (i, s"d$i", i)): _*), dir, Seq("id"),
      "", nBuckets = 4, keepVersions = 10)
    val vBefore = SnapshotUpsert.versions(spark, dir).last
    SnapshotUpsert.mergeInto(
      df((0L until 20L).map(i => (i, "m", 1L)): _*), dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") + col("s.cnt"))),
      deleteCond = Some(col("t.id") === 7L),
      keepVersions = 10)
    // the fold's image (d-status) is what the merge saw
    val expect = (0L until 20L).flatMap { i =>
      if (i == 7L) None else Some((i, s"d$i", i + 1L))
    }.toSet
    assert(snapSet(dir) == expect)
    // touched buckets compacted in passing: no layers remain
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotUpsert.currentSnapshot(fs, root).get.deltas.isEmpty)
    // and the feed sees the delete
    val vAfter = SnapshotUpsert.versions(spark, dir).last
    val changes = SnapshotUpsert.changesBetween(spark, dir, vBefore,
      vAfter, Seq("id"), emitDeletes = true)
    assert(changes.where(col("_change") === "delete").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("two racing merges both land (optimistic retry): the final " +
      "image equals applying them in the serialization order") {
    val dir = tmp()
    seed(dir)
    // both increment disjoint-but-overlapping key ranges; increments
    // COMMUTE, so either serialization yields the same image — what
    // must not happen is a lost update
    val m1 = new Thread(() => SnapshotUpsert.mergeInto(
      df((0L until 15L).map(i => (i, s"s$i", 10L)): _*), dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") + col("s.cnt"))),
      insert = false, keepVersions = 10))
    val m2 = new Thread(() => SnapshotUpsert.mergeInto(
      df((5L until 20L).map(i => (i, s"s$i", 1000L)): _*), dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") + col("s.cnt"))),
      insert = false, keepVersions = 10))
    m1.start(); m2.start(); m1.join(); m2.join()
    val expect = (0L until 20L).map { i =>
      val add = (if (i < 15) 10L else 0L) + (if (i >= 5) 1000L else 0L)
      (i, s"s$i", i + add)
    }.toSet
    assert(snapSet(dir) == expect)
  }

  test("deleteWhere / updateWhere: predicate DML in one atomic commit, " +
      "matching rows planned through the SQL relation") {
    val dir = tmp()
    seed(dir)
    SnapshotUpsert.updateWhere(spark, dir, col("cnt") >= 15L,
      Map("status" -> concat(col("t.status"), lit("!"))),
      keepVersions = 10)
    SnapshotUpsert.deleteWhere(spark, dir, col("cnt") % 4 === 0,
      keepVersions = 10)
    val expect = (0L until 20L).flatMap { i =>
      if (i % 4 == 0) None
      else Some((i, if (i >= 15) s"s$i!" else s"s$i", i))
    }.toSet
    assert(snapSet(dir) == expect)
    // each DML was one committed version; a no-match predicate
    // commits NOTHING (no version bump)
    val v = SnapshotUpsert.versions(spark, dir).last
    SnapshotUpsert.deleteWhere(spark, dir, col("cnt") === 999L,
      keepVersions = 10)
    assert(SnapshotUpsert.versions(spark, dir).last == v)
    // a key-equality predicate's planning file-skips via the relation:
    // the same decision SnapshotRelationSpec pins; here just assert
    // the DML stays correct under it
    SnapshotUpsert.deleteWhere(spark, dir, col("id") === 3L,
      keepVersions = 10)
    assert(!snapSet(dir).exists(_._1 == 3L))
  }

  test("an update expression of a wider type is assignment-cast to the " +
      "recorded column type, so later reads keep working") {
    val dir = tmp()
    seed(dir)
    // double expression into a LONG column: SQL MERGE's assignment
    // cast applies; without it the whole output column would widen
    // through when-branch coercion and poison the table's schema
    SnapshotUpsert.mergeInto(
      df((10L, "w", 3L)), dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") * lit(1.5))),
      insert = false, keepVersions = 10)
    assert(snapSet(dir).contains((10L, "s10", 15L))) // 10 * 1.5 = 15.0 -> 15L
    // and the table still round-trips through every reader
    assert(SnapshotRelation.readSql(spark, dir).count() == 20)
  }

  test("a null key matches null-safely, like every other reader and " +
      "merge in the layer") {
    import spark.implicits._
    val dir = tmp()
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((Option(1L), "a", 1L), (Option.empty[Long], "nk", 5L))
        .toDF("id", "status", "cnt"), dir, Seq("id"), "",
      nBuckets = 2, keepVersions = 10)
    SnapshotUpsert.mergeInto(
      Seq((Option.empty[Long], "nk2", 7L)).toDF("id", "status", "cnt"),
      dir, Seq("id"),
      updateSet = Map("cnt" -> (col("t.cnt") + col("s.cnt")),
        "status" -> col("s.status")), keepVersions = 10)
    val got = SnapshotUpsert.readSnapshot(spark, dir).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 1L), (-1L, "nk2", 12L)))
  }
}
