package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** [[SnapshotUpsert.maintain]] — the one-call policy pass composing
  * compaction, bucket splits, and vacuum. */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  test("maintain compacts overdue layers, splits overfull buckets, " +
      "sweeps debris, and reports each") {
    val dir = Files.createTempDirectory("graft-maintain").toString
    def df(rows: (Long, String, Long)*) = rows.toDF("id", "status", "v")
    // seed one bucket, then stack two delta layers on it
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 64L).map(i => (i, s"s$i", 1L)): _*), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    SnapshotUpsert.appendDeltaSnapshot(df((1L, "d1", 2L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    SnapshotUpsert.appendDeltaSnapshot(df((2L, "d2", 2L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    // plant crash debris old enough for the vacuum horizon
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val debris = new Path(root, "batches/v999-dead/kb=0/part-dead.parquet")
    val out = fs.create(debris, true)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    val dead = new java.io.File(debris.toUri.getPath)
    dead.setLastModified(System.currentTimeMillis() - 100000L)

    val report = SnapshotUpsert.maintain(spark, dir,
      SnapshotUpsert.MaintenancePolicy(
        compactMinLayers = 2,
        maxBucketBytes = Some(1L), // everything is overfull: must split
        vacuumOlderThanMs = Some(50000L),
        keepVersions = 10))
    assert(report.compacted == Seq(0), report.toString)
    assert(report.split.nonEmpty, report.toString)
    assert(report.vacuumed.exists(_.contains("v999-dead")), report.toString)
    // the table is intact and fully compacted after the pass
    val cur = SnapshotUpsert.currentSnapshot(fs, root).get
    assert(cur.deltas.isEmpty)
    val got = SnapshotUpsert.readSnapshot(spark, dir)
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 64 && got(1L) == "d1" && got(2L) == "d2" &&
      got(3L) == "s3")
  }

  test("a disabled step stays disabled and the pass is a no-op on a " +
      "clean table") {
    val dir = Files.createTempDirectory("graft-maintain2").toString
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((1L, "a", 1L)).toDF("id", "status", "v"), dir,
      Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    val report = SnapshotUpsert.maintain(spark, dir,
      SnapshotUpsert.MaintenancePolicy(
        maxBucketBytes = None, vacuumOlderThanMs = None,
        keepVersions = 10))
    assert(report == SnapshotUpsert.MaintenanceReport(Seq.empty, Seq.empty,
      Seq.empty))
  }
}
