package graft.io.avro

import graft.SparkSpec
import graft.io.AvroIO
import org.apache.spark.sql.functions._

import java.nio.file.Files

class AvroDataSourceSpec extends SparkSpec {

  private lazy val tmp: String = Files.createTempDirectory("graftavro").toString

  /** One container file, enough rows that small maxSplitBytes yields
    * several sync-marker ranges. */
  private lazy val bigDir: String = {
    val dir = s"$tmp/big"
    val df = spark.range(20000).select(
      col("id"),
      concat(lit("name-"), col("id")).as("name"),
      (col("id") % 97).cast("double").as("score"))
    AvroIO.writeAvro(df.coalesce(1), dir)
    dir
  }

  test("format(graftavro) infers the writer schema incl. null-unions") {
    val df = spark.read.format("graftavro").load(bigDir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    // AvroIO writes nullable cols as [null, T] unions; spark.range's id
    // is non-nullable but goes through the same writer path as a
    // nullable row field, so all read back nullable — what matters is
    // the TYPES survive
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.count() == 20000)
  }

  test("sync-marker splits cover exactly once and match the unsplit read") {
    val whole = spark.read.format("graftavro").load(bigDir)
    val split = spark.read.format("graftavro")
      .option("maxSplitBytes", "65536").load(bigDir)
    assert(split.rdd.getNumPartitions > 3,
      s"expected several splits, got ${split.rdd.getNumPartitions}")
    def checksum(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("id")), sum(col("score"))).head()
    assert(checksum(split) == checksum(whole))
    assert(split.count() == 20000) // no row dropped or read twice
  }

  test("column pruning reaches the scan (projected ReadSchema)") {
    val pruned = spark.read.format("graftavro").load(bigDir).select("id")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("graftavro"), scan)
    assert(scan.contains("[id]"), s"scan description should show pruning:\n$scan")
    assert(pruned.agg(sum(col("id"))).head().getLong(0) == 19999L * 20000 / 2)
  }

  test("SQL surface: CREATE TEMPORARY VIEW USING graftavro") {
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW avro_docs USING graftavro OPTIONS (path '$bigDir')")
    val n = spark.sql("SELECT count(*) AS n FROM avro_docs WHERE score > 50").head().getLong(0)
    val expected = spark.read.format("graftavro").load(bigDir)
      .filter(col("score") > 50).count()
    assert(n == expected && n > 0)
  }

  test("user-supplied schema projects by name over the file order") {
    val df = spark.read.format("graftavro")
      .schema("score double, id long").load(bigDir)
    val r = df.filter(col("id") === 7L).head()
    assert(r.getDouble(0) == 7.0 && r.getLong(1) == 7L)
  }
}
