package graft.tools

import graft.io.TableIO
import graft.pipeline.AdvisoryMerge
import graft.queries.AdvisoryQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The r5 verdict's task #3: prove the bucketed merge AT THE DECADE
  * WHERE IT PAYS. The zero-Exchange co-bucketed merge is spec-proven at
  * fixture scale (BucketingSpec); this rehearsal writes the sf10 merge
  * inputs bucketed on their join keys, reruns the EXACT q_advisory_merge
  * computation over them, and reports wall time + bytes-across-shuffle
  * for both variants — the "repeated merge runs amortize the shuffle
  * via buckets" claim as measured numbers instead of prose.
  *
  * Usage: runMain graft.tools.BucketedMergeAtScale [sfDir] [numBuckets]
  * (defaults: target/sf10, 32). Writes managed bucketed tables under
  * the session warehouse (target/bucketed-wh).
  */
object BucketedMergeAtScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      // same AQE sizing the sf10 bench rehearsal needed (merge spilled
      // at 32 initial partitions on 60M-row shuffles)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", "256"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/bucketed-wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = new StageTotals
    spark.sparkContext.addSparkListener(t)
    def settle(): Unit =
      org.apache.spark.graftspark.ListenerDrain.drain(spark.sparkContext)
    def mb(b: Long): String = f"${b / 1e6}%.1f MB"

    def timedRun(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    /** warm + 2 timed passes; returns (min seconds, shuffle bytes of one
      * pass, spill bytes) — metrics from the LAST pass only. */
    def measure(label: String, mk: => DataFrame): (Double, Long, Long) = {
      val df = mk
      timedRun(df) // warm: codegen + JIT + footer caches
      val s1 = timedRun(df)
      settle(); t.reset()
      val s2 = timedRun(df)
      settle()
      val (sh, sp) = (t.shuffleWrite, t.spillDisk)
      println(f"[bucketed-merge] $label%-28s min=${math.min(s1, s2)}%6.2f s " +
        s"shuffleWrite=${mb(sh)} spill=${mb(sp)}")
      (math.min(s1, s2), sh, sp)
    }

    val (echo, norm, prod) = AdvisoryQueries.mergeInputs(spark, sfDir)
    val tie = AdvisoryQueries.mergeTiebreak

    // 1) unbucketed baseline: the exact q_advisory_merge computation
    val (un, unSh, _) = measure("unbucketed merge",
      AdvisoryMerge.mapNewInfo(echo, norm, prod, tiebreak = tie, sorted = false))

    // 2) one-off bucketed write of the three inputs on their join keys
    //    (the Exchange the cluster pays ONCE, amortized over every
    //    later merge run)
    settle(); t.reset()
    val w0 = System.nanoTime()
    TableIO.writeBucketed(echo, "echo_b", Seq("cve_id", "package_name"), buckets)
    TableIO.writeBucketed(norm, "norm_b", Seq("cve_id", "package"), buckets)
    TableIO.writeBucketed(prod, "prod_b", Seq("cve_id", "package"), buckets)
    val wSec = (System.nanoTime() - w0) / 1e9
    settle()
    println(f"[bucketed-merge] bucketed write (once)        ${wSec}%6.2f s " +
      s"shuffleWrite=${mb(t.shuffleWrite)}")

    // 3) merge over the bucketed tables — every repeated run's cost
    val (bu, buSh, _) = measure("bucketed merge",
      AdvisoryMerge.mapNewInfo(spark.table("echo_b"), spark.table("norm_b"),
        spark.table("prod_b"), tiebreak = tie, sorted = false))

    val plan = AdvisoryMerge.mapNewInfo(spark.table("echo_b"),
        spark.table("norm_b"), spark.table("prod_b"), tiebreak = tie,
        sorted = false).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    println(s"[bucketed-merge] hash Exchanges in bucketed plan: $exchanges")
    println(f"[bucketed-merge] SUMMARY sf=$sfDir buckets=$buckets " +
      f"unbucketed=${un}%.2f s/${mb(unSh)} bucketed=${bu}%.2f s/${mb(buSh)} " +
      f"write_once=${wSec}%.2f s")
    spark.stop()
  }
}
