package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** [[SnapshotUpsert.restore]] — rollback-to-version as a forward
  * commit: re-publishes an earlier version's manifest at the head with
  * zero data movement, never by deleting history. */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, Long)*) = rows.toDF("id", "status", "v")

  private def image(dir: String): Map[Long, String] =
    SnapshotUpsert.readSnapshot(spark, dir).select("id", "status")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("restore re-publishes the old image as a NEW version, keeps " +
      "history readable, and a second restore undoes the first") {
    val dir = Files.createTempDirectory("graft-restore").toString
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L), (2L, "b", 1L)),
      dir, Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a2", 2L), (3L, "c", 2L)),
      dir, Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    val v1Image = image(dir)
    assert(v1Image == Map(1L -> "a2", 2L -> "b", 3L -> "c"))

    SnapshotUpsert.restore(spark, dir, 1L, keepVersions = 10)
    // head moved FORWARD to a new version holding v0's image
    assert(SnapshotUpsert.versions(spark, dir) == Seq(1L, 2L, 3L))
    assert(image(dir) == Map(1L -> "a", 2L -> "b"))
    // intermediate history still readable (time travel unbroken)
    val pinned = SnapshotRelation.readSql(spark, dir, version = Some(2L))
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pinned == v1Image)
    // restore of the restore: forward again to v2's image
    SnapshotUpsert.restore(spark, dir, 2L, keepVersions = 10)
    assert(SnapshotUpsert.versions(spark, dir) == Seq(1L, 2L, 3L, 4L))
    assert(image(dir) == v1Image)
    // zero data movement: the restored head references v1's files
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = SnapshotUpsert.readManifest(fs, root, 2L)
    val head = SnapshotUpsert.currentSnapshot(fs, root).get
    assert(head.files == v1.files && head.schema == v1.schema)
  }

  test("restore to the current head is a no-op; a GC'd version fails " +
      "with an actionable error") {
    val dir = Files.createTempDirectory("graft-restore2").toString
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 2)
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "b", 2L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 2)
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "c", 3L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 2)
    val before = SnapshotUpsert.versions(spark, dir)
    SnapshotUpsert.restore(spark, dir, before.last, keepVersions = 2)
    assert(SnapshotUpsert.versions(spark, dir) == before) // no-op
    // keepVersions=2 dropped v1 — restore must refuse, naming the window
    val err = intercept[RuntimeException] {
      SnapshotUpsert.restore(spark, dir, 1L, keepVersions = 2)
    }
    assert(err.getMessage.contains("restore"), err.getMessage)
  }

  test("restore clamps its commit timestamp monotone like every " +
      "writer (TIMESTAMP AS OF orders by #ts)") {
    val dir = Files.createTempDirectory("graft-restore4").toString
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10, nowMs = 5000L)
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "b", 2L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10, nowMs = 9000L)
    // a stepped-back clock must not publish a head that predates its
    // predecessor
    SnapshotUpsert.restore(spark, dir, 1L, keepVersions = 10,
      nowMs = 1000L)
    val ts = SnapshotUpsert.history(spark, dir)
      .orderBy("version").collect().map(_.getLong(1))
    assert(ts.sameElements(ts.sorted), ts.mkString(","))
    assert(ts.last >= 9000L)
  }

  test("restore carries pending delta layers and their merge contract") {
    val dir = Files.createTempDirectory("graft-restore3").toString
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 8L).map(i => (i, s"s$i", 1L)): _*), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    SnapshotUpsert.appendDeltaSnapshot(df((1L, "d1", 2L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    // v2 has a pending layer; advance past it, then restore to v2
    SnapshotUpsert.upsertBatchSnapshot(df((7L, "zz", 3L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    SnapshotUpsert.restore(spark, dir, 2L, keepVersions = 10)
    val got = image(dir)
    assert(got(1L) == "d1" && got(7L) == "s7" && got.size == 8)
    // the restored head still folds (and can compact) its layers
    SnapshotUpsert.compactDeltas(spark, dir, minLayers = 1,
      keepVersions = 10)
    assert(image(dir) == got)
  }
}
