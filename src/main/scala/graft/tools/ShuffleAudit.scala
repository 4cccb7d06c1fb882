package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Byte-level evidence for the scale-posture claims: runs registered
  * queries under a stage-metrics listener and reports, per query, the
  * bytes READ from storage vs the bytes that crossed a SHUFFLE (plus
  * disk spill). PERF.md's plan audits argue "shuffles carry (id, hash)
  * pairs, never text" / "dims broadcast, fact never reshuffles" from
  * plan shape; this measures it. A query whose shuffle bytes stay a
  * small fraction of its input bytes — and whose fraction does not
  * grow with sf — keeps its network cost bounded by scan cost on a
  * real cluster, which is exactly the 100 TB property the prose
  * claims.
  *
  * Methodology: one pass per query (metrics, not wall time — load
  * contamination does not skew byte counters), listener totals reset
  * between queries, a listener-bus settle wait after each run. Queries
  * with eager plan-construction subtrees (the star-CC builds) are
  * measured INCLUDING the build — their jobs run inside the window,
  * so their shuffle volume is attributed honestly.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ShuffleAudit
  * [query...] — default: a headline set spanning the claim classes.
  */
object ShuffleAudit {

  // stage-metric accumulator shared with BucketedMergeAtScale
  private type Totals = StageTotals

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      // claim classes: hash-only dedup shuffles, broadcast star, reused
      // exchange merge, banded LSH, windowed events, packing, salting
      "q_advisory_merge", "q_dedup_minhash64", "q_substring_dups",
      "q_substring_dup_pairs", "q_decontaminate_substring", "q_star_join",
      "q_join_salted", "q_agg_cube", "q_range_join", "q_window_sliding",
      "q_pack_chunks_bpe", "q_corpus_pipeline")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = new Totals
    spark.sparkContext.addSparkListener(t)

    // Drain the listener bus deterministically: waitUntilEmpty blocks
    // until every queued SparkListenerStageCompleted has been delivered,
    // so a loaded box cannot bleed one query's shuffle bytes into the
    // next query's totals (a fixed sleep could).
    def settle(): Unit =
      org.apache.spark.graftspark.ListenerDrain.drain(spark.sparkContext)

    val rows = names.flatMap { n =>
      SparkEntry.queries.get(n) match {
        case None =>
          System.err.println(s"[shuffle-audit] unknown query $n"); None
        case Some(q) =>
          settle(); t.reset()
          try {
            val df = q(spark, sfDir) // eager builds measured too
            // denominator: on-disk bytes of the FILE-SOURCE leaf
            // relations the plan touches (stage-level inputMetrics
            // undercounts the vectorized parquet path); conservative —
            // pre-pushdown. Non-file leaves (LocalRelation probes,
            // localCheckpoint LogicalRDDs) are EXCLUDED: they carry the
            // session's default size estimate, not a measurement, and
            // one checkpointed leaf would swamp the denominator with
            // hundreds of fictitious GBs
            val tableBytes = df.queryExecution.optimizedPlan
              .collectLeaves().collect {
                case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                  l.stats.sizeInBytes
                case v: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
                  v.stats.sizeInBytes
              }.sum
            df.write.format("noop").mode("overwrite").save()
            settle()
            val r = (n, tableBytes.min(BigInt(Long.MaxValue)).toLong,
              t.shuffleWrite, t.shuffleRead, t.spillDisk)
            spark.catalog.clearCache()
            Some(r)
          } catch {
            case e: Throwable =>
              System.err.println(s"[shuffle-audit] $n failed: ${e.getMessage}")
              None
          }
      }
    }
    val json = rows.map { case (n, in, sw, sr, sp) =>
      f""""$n":{"table_bytes":$in,"shuffle_write":$sw,"shuffle_read":$sr,"spill_disk":$sp}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"shuffle_audit","sf":"$sfDir","queries":$json}""")
    rows.foreach { case (n, in, sw, _, sp) =>
      val pct = if (in > 0) 100.0 * sw / in else 0.0
      System.err.println(f"[shuffle-audit] $n%-28s tables=${in / 1e6}%9.1f MB shuffle=${sw / 1e6}%9.1f MB (${pct}%5.1f%% of tables) spill=${sp / 1e6}%7.1f MB")
    }
    spark.stop()
  }
}
