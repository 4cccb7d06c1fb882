package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the named queries (or a default
  * audit set) — the per-round check that filters reach the scans,
  * small join sides broadcast, and codegen spans stay wide.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_filter", "q_join_double_left", "q_agg_groupby",
        "q_window_dedup", "q_advisory_merge", "q_dedup_minhash",
        "q_sim_topk_brute", "q_sim_topk_lsh", "q_sim_topk_ivf",
        "q_dedup_simhash_pairs", "q_dedup_embedding", "q_join_salted",
        "q_range_join", "q_ngram_top", "q_group_cap", "q_pack_chunks",
        "q_subquery_latest", "q_date_math", "q_text_unigram")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
