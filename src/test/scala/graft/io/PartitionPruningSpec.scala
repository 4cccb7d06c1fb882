package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning on hive-layout tables — the scan-elimination
  * half of the 100 TB story (file/row-group stats are covered by the
  * range/z-order layout specs):
  *
  *   - STATIC pruning: a literal partition predicate never lists, let
  *     alone reads, the other partitions;
  *   - DYNAMIC pruning (DPP): when the partition key is only
  *     constrained THROUGH a join with a filtered dimension, the scan
  *     still prunes — Spark injects a runtime subquery filter from the
  *     broadcast side. On a date-partitioned 100 TB fact table this is
  *     the difference between reading 2 partitions and reading 3 years.
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.queries.QueryDef.loadEvents(spark, sf)
      .withColumn("dt", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      .select(col("event_id"), col("user_id"), col("value"), col("dt"))
      .write.partitionBy("dt").parquet(s"$d/facts")
    d
  }

  private lazy val facts = spark.read.parquet(s"$d0/facts")
  private def d0 = dir

  test("static partition pruning: literal dt predicate reads one partition") {
    // hive partition values come back type-inferred as DATE
    val dts = facts.select("dt").distinct().collect()
      .map(_.getDate(0)).sortBy(_.getTime)
    assert(dts.length > 2, s"fixture spans ${dts.length} days")
    val one = facts.filter(col("dt") === dts.head)
    one.collect()
    val scan = one.queryExecution.executedPlan.toString
    // the partition predicate must reach PartitionFilters (metadata
    // pruning), not linger as a post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("dt"),
      s"dt predicate did not reach PartitionFilters:\n$scan")
  }

  test("dynamic partition pruning: a filtered dim join prunes the fact scan") {
    import spark.implicits._
    val dts = facts.select("dt").distinct().collect()
      .map(_.getDate(0)).sortBy(_.getTime)
    // the dim must be a real (file-backed) relation: an in-memory
    // LocalRelation folds the tag filter away at optimize time and
    // DPP's selective-predicate heuristic never sees it
    dts.zipWithIndex
      .map { case (dt, i) => (dt, if (i < 2) "hot" else "cold") }
      .toSeq.toDF("dt", "tag")
      .write.mode("overwrite").parquet(s"$d0/dim")
    val dim = spark.read.parquet(s"$d0/dim")
    val joined = facts.join(dim.filter($"tag" === "hot"), "dt")
    val expected = facts.filter(col("dt").isin(dts.take(2): _*)).count()
    assert(joined.collect().length == expected.toInt)
    val scan = joined.queryExecution.executedPlan.toString
    assert(scan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in the fact scan:\n$scan")
  }
}
