package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: per-query breakdown of DataFrame construction
  * vs repeated execution, to localize where bench wall-time goes. */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_advisory_merge", "q_agg_groupby", "q_orderby_case",
      "q_multimodal_meta", "q_multimodal_decode", "q_cache_ttl_filter",
      "q_nvd_normalize", "q_scan_filter", "q_packages_to_enrich")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    names.foreach { n =>
      val (_, tWarmBuildAndRun) = t {
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val (df, tBuild) = t(SparkEntry.queries(n)(spark, sfDir))
      val (_, tAnalyze) = t(df.queryExecution.analyzed)
      val runs = (1 to 3).map { _ =>
        t(df.write.format("noop").mode("overwrite").save())._2
      }
      // fresh-build run: what Bench actually times
      val (_, tFresh) = t {
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(f"DBG $n%-24s warm=$tWarmBuildAndRun%7.2f build=$tBuild%6.3f analyze=$tAnalyze%6.3f " +
        f"reruns=${runs.map(x => f"$x%6.2f").mkString(",")} freshBuildRun=$tFresh%7.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
