package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pushdown, demonstrated by execution.
  *
  * The 100 TB story: a selective dim-side predicate (here: one order
  * priority) cannot prune the fact side at scan time because the fact
  * table has no predicate of its own — every surviving fact row must
  * normally travel through the join shuffle just to be dropped by the
  * probe. Catalyst's InjectRuntimeFilter builds a bloom filter from the
  * filtered dim keys at runtime and applies it fact-side BEFORE the
  * shuffle (`bloom_filter_might_contain` over `xxhash64(key)`), so the
  * shuffle moves ~selectivity × |fact| rows instead of |fact|. On a
  * 1000-executor cluster this is the difference between shuffling
  * 100 TB and shuffling the ~2 TB that can actually join.
  *
  * The thresholds exist because the filter is not free (a pre-join
  * aggregate on the dim side + a scan-side probe): production defaults
  * (10 GB application-side scan) are scaled down here the same way
  * SkewJoinSpec scales the AQE skew detector to test-sized data.
  */
class BloomFilterJoinSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def factDimJoin = {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("o_orderpriority"))
  }

  test("InjectRuntimeFilter puts a bloom probe on the fact side of a dim-filtered join") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production default is 10 GB of application-side scan; scale to
      // the sf0.001 fixture so the rule considers the fact side "big"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // no broadcast: the filter targets the shuffle-join shape (a
      // broadcast join already prunes at the probe)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val joined = factDimJoin
      val plan = joined.queryExecution.optimizedPlan.toString
      // the injected filter renders as might_contain(scalar-subquery)
      // probing a bloom_filter_agg built over the filtered dim keys
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact side:\n$plan")
      // and the filter is semantics-free: same rows as with it disabled
      val withBloom = joined.count()
      val without = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        factDimJoin.count()
      }
      assert(withBloom == without && withBloom > 0,
        s"bloom filter changed the result: $withBloom vs $without")
    }
  }
}
