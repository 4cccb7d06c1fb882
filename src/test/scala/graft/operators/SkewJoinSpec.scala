package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling, demonstrated rather than asserted in prose:
  *
  *   1. AQE's runtime skew-join split actually fires on a deliberately
  *      skewed key (the final adaptive plan carries `skew=true`), so
  *      "AQE handles residual skew" is an executed fact;
  *   2. saltedJoin — the explicit fallback for the shapes AQE cannot
  *      split — is result-identical to the plain join.
  */
class SkewJoinSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** ~150k rows, 90% on key 0, with a payload wide enough that the hot
    * partition dwarfs the skew thresholds set in the test. */
  private def skewedLeft = spark.range(150000).select(
    when(col("id") % 100 < 90, 0L).otherwise(col("id") % 100).as("key"),
    col("id").as("row_id"),
    concat(lit("payload-"), lpad(col("id").cast("string"), 64, "x")).as("payload"))

  private def dim = spark.range(100).select(col("id").as("key"),
    concat(lit("dim-"), col("id").cast("string")).as("dim_val"))

  test("AQE splits the skewed partition at runtime (plan shows skew=true)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew detector down to test-sized data
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // no broadcast: force the sort-merge path AQE skew-split targets
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val joined = skewedLeft.join(dim, "key")
      // execute THIS Dataset's own queryExecution (count() would build
      // a different, aggregate-pruned execution and leave this plan
      // un-finalized)
      assert(joined.collect().length == 150000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin in the final adaptive plan:\n$finalPlan")
    }
  }

  test("saltedJoin equals the plain join on the skewed data") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def checksum(df: org.apache.spark.sql.DataFrame) = {
        val cols = df.columns.sorted.map(col)
        df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
          .agg(count(lit(1)), sum(col("h"))).head()
      }
      val plain = skewedLeft.join(dim, Seq("key"))
      val salted = SkewJoin.saltedJoin(skewedLeft, dim, Seq("key"), salts = 8)
      assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
      assert(checksum(salted) == checksum(plain))
      // and the left-outer form (misses survive salting: the replicated
      // right side carries every salt, so a missing key still misses)
      val dimHalf = dim.filter(col("key") < 50)
      val plainL = skewedLeft.join(dimHalf, Seq("key"), "left")
      val saltedL = SkewJoin.saltedJoin(skewedLeft, dimHalf, Seq("key"), 8, "left")
      assert(checksum(saltedL) == checksum(plainL))
    }
  }
}
