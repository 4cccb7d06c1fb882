package graft.catalog

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The V2 catalog surface: snapshot tables resolved by NAME in plain
  * SQL text — SELECT through the readSql relation (file skipping and
  * MoR folds included), SQL-standard time travel, and native
  * filter-DELETE. MERGE/UPDATE SQL text is exercised in
  * [[GraftDmlSqlSpec]] (needs session extensions). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-cat").toString

  private def install(root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
  }

  private def seed(dir: String, rows: Seq[(Long, String, Long)],
      keep: Int = 10): Unit =
    SnapshotUpsert.upsertBatchSnapshot(
      rows.toDF("id", "status", "v"), dir, Seq("id"), "v",
      nBuckets = 8, keepVersions = keep)

  test("SELECT resolves by name through the catalog and serves the " +
      "merged image, including MoR delta layers") {
    val root = freshRoot()
    install(root)
    seed(s"$root/t1", (0L until 40L).map(i => (i, s"s$i", 1L)))
    // a delta layer on top: the catalog read must fold it
    SnapshotUpsert.appendDeltaSnapshot(
      Seq((3L, "upd3", 2L), (100L, "new100", 1L)).toDF("id", "status", "v"),
      s"$root/t1", Seq("id"), "v", nBuckets = 8, keepVersions = 10)
    val got = spark.sql(
      "SELECT id, status FROM graft.t1 WHERE id IN (3, 5, 100)")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "upd3", 5L -> "s5", 100L -> "new100"))
    assert(spark.sql("SELECT count(*) FROM graft.t1").head.getLong(0) == 41L)
  }

  test("SHOW TBLPROPERTIES surfaces the recorded layout and props") {
    val root = freshRoot()
    install(root)
    val dir = s"$root/tp"
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((1L, "a", 1L)).toDF("id", "status", "v"), dir, Seq("id"), "v",
      nBuckets = 4, keepVersions = 10,
      props = Map("graft.cluster.cols" -> "v"))
    val got = spark.sql("SHOW TBLPROPERTIES graft.tp")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("graft.nBuckets") == "4", got)
    assert(got("graft.mergeKeys") == "id" && got("graft.orderCol") == "v")
    assert(got("graft.cluster.cols") == "v")
    // `location` is a RESERVED property Spark filters from SHOW
    // TBLPROPERTIES (it shows in DESCRIBE EXTENDED instead)
    assert(got("graft.nFiles").toInt >= 1 && got("version") == "1")
  }

  test("ALTER TABLE SET TBLPROPERTIES commits a metadata-only version") {
    val root = freshRoot()
    install(root)
    val dir = s"$root/ap"
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((1L, "a", 1L)).toDF("id", "status", "v"), dir, Seq("id"), "v",
      nBuckets = 2, keepVersions = 10)
    spark.sql("ALTER TABLE graft.ap SET TBLPROPERTIES " +
      "('graft.cluster.cols' = 'v', 'team' = 'ops')")
    assert(SnapshotUpsert.versions(spark, dir) == Seq(1L, 2L))
    val props = SnapshotUpsert.currentProps(spark, dir)
    assert(props("graft.cluster.cols") == "v" && props("team") == "ops")
    // data untouched; schema changes are refused with a pointer
    assert(spark.sql("SELECT status FROM graft.ap").head.getString(0) == "a")
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ap ADD COLUMN extra INT")
    }
    assert(err.getMessage.contains("SET TBLPROPERTIES"), err.getMessage)
  }

  test("ALTER TABLE never shrinks the retained history (a metadata " +
      "statement must not GC what a keepVersions=10 writer preserved)") {
    val root = freshRoot()
    install(root)
    val dir = s"$root/keep"
    for (i <- 1 to 4)
      SnapshotUpsert.upsertBatchSnapshot(
        Seq((1L, s"v$i", i.toLong)).toDF("id", "status", "v"), dir,
        Seq("id"), "v", nBuckets = 2, keepVersions = 10)
    spark.sql("ALTER TABLE graft.keep SET TBLPROPERTIES ('team' = 'x')")
    // all four data versions still retained (plus the metadata commit)
    assert(SnapshotUpsert.versions(spark, dir) == (1L to 5L))
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin committed versions") {
    val root = freshRoot()
    install(root)
    val dir = s"$root/tt"
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((1L, "a", 1L)).toDF("id", "status", "v"), dir, Seq("id"), "v",
      nBuckets = 4, keepVersions = 10, nowMs = 1000000L)
    SnapshotUpsert.upsertBatchSnapshot(
      Seq((1L, "b", 2L)).toDF("id", "status", "v"), dir, Seq("id"), "v",
      nBuckets = 4, keepVersions = 10, nowMs = 2000000L)
    assert(spark.sql("SELECT status FROM graft.tt VERSION AS OF 1")
      .head.getString(0) == "a")
    assert(spark.sql("SELECT status FROM graft.tt VERSION AS OF 2")
      .head.getString(0) == "b")
    // timestamp pin: between the two commits -> v1 (micros cast from
    // the SQL timestamp literal; commits stamped at 1000s and 2000s)
    assert(spark.sql("SELECT status FROM graft.tt TIMESTAMP AS OF " +
      "timestamp'1970-01-01 00:25:00Z'").head.getString(0) == "a")
    assert(spark.sql("SELECT status FROM graft.tt").head.getString(0) == "b")
  }

  test("DELETE FROM ... WHERE runs as one atomic snapshot commit") {
    val root = freshRoot()
    install(root)
    val dir = s"$root/del"
    seed(dir, (0L until 20L).map(i => (i, if (i % 2 == 0) "even" else "odd", 1L)))
    spark.sql("DELETE FROM graft.del WHERE status = 'even'")
    val left = spark.sql("SELECT id FROM graft.del").collect()
      .map(_.getLong(0)).toSet
    assert(left == (1L until 20L by 2L).toSet)
    // the delete committed a NEW version; the prior image time-travels
    assert(spark.sql("SELECT count(*) FROM graft.del VERSION AS OF 1")
      .head.getLong(0) == 20L)
  }

  test("DELETE with a predicate the V1 Filter algebra cannot state " +
      "(arithmetic) still runs through the V2 predicate bridge") {
    // regression: SupportsDelete's default V2-to-V1 bridge refused
    // `id % 3 = 0` wholesale ("Cannot delete from table"), caught by
    // q_snapshot_catalog's first real bench run
    val root = freshRoot()
    install(root)
    val dir = s"$root/mod"
    seed(dir, (0L until 12L).map(i => (i, s"s$i", 1L)))
    spark.sql("DELETE FROM graft.mod WHERE id % 3 = 0")
    val left = spark.sql("SELECT id FROM graft.mod").collect()
      .map(_.getLong(0)).toSet
    assert(left == (0L until 12L).filter(_ % 3 != 0).toSet, left.toString)
  }

  test("catalog SELECT goes through the relation's file skipping " +
      "(point predicate reads fewer rows' files than a full scan)") {
    val root = freshRoot()
    install(root)
    val dir = s"$root/sk"
    seed(dir, (0L until 64L).map(i => (i, s"s$i", 1L)))
    // kept-file audit through the same decision the scan uses
    val (kept, total) = graft.streaming.SnapshotRelation
      .equalityKept(spark, dir, "id", Seq(5L))
    assert(kept < total, s"$kept of $total")
    // and the SQL answer is right
    assert(spark.sql("SELECT status FROM graft.sk WHERE id = 5")
      .head.getString(0) == "s5")
  }

  test("unknown tables and unsupported DDL fail with clear errors") {
    val root = freshRoot()
    install(root)
    val e1 = intercept[Exception](spark.sql("SELECT * FROM graft.nope"))
    assert(e1.getMessage.contains("nope"))
    seed(s"$root/ddl", Seq((1L, "a", 1L)))
    val e2 = intercept[Exception](spark.sql("DROP TABLE graft.ddl"))
    assert(e2.getMessage.contains("vacuum") ||
      e2.getMessage.toLowerCase.contains("not support"), e2.getMessage)
    // SHOW TABLES sees the committed table
    val listed = spark.sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("ddl"))
  }
}
