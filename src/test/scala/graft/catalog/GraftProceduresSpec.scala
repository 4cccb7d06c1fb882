package graft.catalog

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** Stored procedures (`CALL graft.system.*`): table maintenance as
  * SQL text through Spark's V2 ProcedureCatalog — named arguments,
  * analyzer-filled defaults, and one observable report row each. */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private def install(): String = {
    val root = Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  private def df(rows: (Long, String, Long)*) = rows.toDF("id", "status", "v")

  test("CALL graft.system.restore rolls the table back as a forward " +
      "commit and reports the new head") {
    val root = install()
    val dir = s"$root/t"
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L)), dir,
      Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "b", 2L)), dir,
      Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    val rep = spark.sql(
      "CALL graft.system.restore(table => 't', version => 1, " +
        "keep_versions => 10)").collect()
    assert(rep.length == 1 &&
      rep(0).getLong(0) == 1L && rep(0).getLong(1) == 3L, rep.toSeq)
    assert(spark.sql("SELECT status FROM graft.t").head.getString(0) == "a")
  }

  test("CALL graft.system.compact folds pending layers; maintain runs " +
      "the whole pass with defaults filled by the analyzer") {
    val root = install()
    val dir = s"$root/m"
    SnapshotUpsert.upsertBatchSnapshot(
      df((0L until 16L).map(i => (i, s"s$i", 1L)): _*), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    SnapshotUpsert.appendDeltaSnapshot(df((1L, "d1", 2L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    val c = spark.sql(
      "CALL graft.system.compact(table => 'm', min_layers => 1, " +
        "keep_versions => 10)").head
    assert(c.getString(0) == "0") // bucket 0 folded
    assert(SnapshotUpsert.history(spark, dir)
      .orderBy(org.apache.spark.sql.functions.desc("version"))
      .head.getAs[Int]("n_delta_files") == 0)
    assert(spark.sql("SELECT status FROM graft.m WHERE id = 1")
      .head.getString(0) == "d1")
    // maintain with only the table named: every other arg defaults
    val m = spark.sql("CALL graft.system.maintain(table => 'm')").head
    assert(m.getString(0) == "" && m.getString(1) == "", m.toString)
  }

  test("CALL graft.system.vacuum sweeps old debris; unknown procedure " +
      "names fail with the available list") {
    val root = install()
    val dir = s"$root/vt"
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val debris = new Path(p, "batches/v777-dead/kb=0/part-dead.parquet")
    val out = fs.create(debris, true)
    try out.write(Array[Byte](1)) finally out.close()
    new java.io.File(debris.toUri.getPath)
      .setLastModified(System.currentTimeMillis() - 100000L)
    val v = spark.sql(
      "CALL graft.system.vacuum(table => 'vt', older_than_ms => 50000)")
      .head
    assert(v.getString(0).contains("v777-dead"), v.toString)
    val err = intercept[Exception] {
      spark.sql("CALL graft.system.frobnicate(table => 'vt')")
    }
    // Spark wraps the catalog's error as FAILED_TO_LOAD_ROUTINE; the
    // actionable list rides in the cause chain
    val chain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("frobnicate") && chain.contains("maintain"),
      chain)
    // discovery: SHOW PROCEDURES lists all five
    val listed = spark.sql("SHOW PROCEDURES IN graft.system")
      .collect().map(_.toString).mkString
    assert(Seq("maintain", "restore", "compact", "vacuum", "history")
      .forall(listed.contains), listed)
  }

  test("an explicit NULL for a destructive knob is refused, never " +
      "decoded as 0 (the most destructive horizon)") {
    val root = install()
    val dir = s"$root/nv"
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L)), dir,
      Seq("id"), "v", nBuckets = 1, keepVersions = 10)
    val err = intercept[Exception] {
      spark.sql("CALL graft.system.vacuum(table => 'nv', " +
        "older_than_ms => NULL)").collect()
    }
    val chain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_)).mkString(" | ")
    assert(chain.contains("older_than_ms"), chain)
  }

  test("CALL graft.system.history returns the retained versions " +
      "newest first — the restore picker") {
    val root = install()
    val dir = s"$root/h"
    SnapshotUpsert.upsertBatchSnapshot(df((1L, "a", 1L)), dir,
      Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    SnapshotUpsert.upsertBatchSnapshot(df((2L, "b", 1L)), dir,
      Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    val h = spark.sql("CALL graft.system.history(table => 'h')").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L), h.toSeq)
    assert(h.head.getInt(2) == 2) // n_buckets rides along
  }
}
