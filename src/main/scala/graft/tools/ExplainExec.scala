package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** [[ExplainAudit]]'s post-execution sibling: run each named query
  * through the noop sink FIRST, then print `explain("formatted")` of
  * the SAME DataFrame — with AQE on, that is the FINAL adaptive plan
  * (`isFinalPlan=true`), which is the only place runtime decisions
  * show up: exchange/stage REUSE (identical self-join subtrees
  * collapsing to one computation), AQEShuffleRead coalescing, and
  * join-strategy rewrites. The static pre-execution plan cannot show
  * any of these, which makes before/after plan diffs of reuse-based
  * optimizations unreadable without this tool.
  *
  * Usage: runMain graft.tools.ExplainExec [sfDir] [query ...]
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_minhash64", "q_text_bm25")
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
      val df = SparkEntry.queries(n)(spark, sfDir)
      // execute the DataFrame's OWN QueryExecution (a noop write plans
      // a separate one, leaving this plan isFinalPlan=false forever)
      df.queryExecution.toRdd.foreach(_ => ())
      df.explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
