package graft.tools

import graft.operators.Dedup
import graft.queries.QueryDef
import org.apache.spark.sql.SparkSession

/** Round-count + wall-clock comparison of the two connected-component
  * implementations on the REAL corpus's MinHash candidate graph (the
  * q_dedup_clusters input), complementing the deep-chain spec: star
  * rounds stay logarithmic while min-label propagation pays the
  * component diameter, and every round is a driver-coordinated barrier
  * — the quantity that hurts on a 1000-executor cluster.
  *
  * Usage: runMain graft.tools.CcRounds [sfDir]
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = QueryDef.load(spark, sfDir, "documents")
    def candidates() = Dedup.minHashCandidates(docs, "text", "doc_id")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val ((starLabels, starRounds), starSec) =
      timed(Dedup.dupClustersStarCounted(candidates(), docs, "doc_id"))
    val starN = starLabels.count()
    val ((propLabels, propRounds), propSec) =
      timed(Dedup.dupClustersCounted(candidates(), docs, "doc_id"))
    val propN = propLabels.count()
    val agree = starLabels.exceptAll(propLabels).isEmpty &&
      propLabels.exceptAll(starLabels).isEmpty
    println(s"[ccrounds] star: rounds=$starRounds build=${f"$starSec%.2f"}s rows=$starN")
    println(s"[ccrounds] prop: rounds=$propRounds build=${f"$propSec%.2f"}s rows=$propN")
    println(s"[ccrounds] labels_identical=$agree")
    spark.stop()
  }
}
