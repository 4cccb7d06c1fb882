package graft.tools

import org.apache.spark.sql.SparkSession

/** Star-CC round count vs graph STRUCTURE (complements CcRounds,
  * which measures the real LSH candidate graph): chains are the
  * worst case for diameter-bound propagation and exercise the
  * O(log n) star bound; cliques are the common near-dup regime
  * (tight duplicate groups) where the label-convergence early stop
  * pays — a settled star still sheds redundant chord edges for a
  * round, which edge-set stability waits out and label convergence
  * does not (measured: clique 1 round vs 2). */
object ChainRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (n <- Seq(8, 32, 128, 1024)) {
      val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id1", "id2")
      val nodes = (0L until n.toLong).toDF("doc_id")
      val (_, rounds) = graft.operators.Dedup.dupClustersStarCounted(chain, nodes, "doc_id")
      println(s"[chain] n=$n star_rounds=$rounds")
    }
    for (n <- Seq(16, 64)) {
      val clique = (for (i <- 0L until n.toLong; j <- (i + 1) until n.toLong)
        yield (i, j)).toDF("id1", "id2")
      val nodes = (0L until n.toLong).toDF("doc_id")
      val (_, rounds) = graft.operators.Dedup.dupClustersStarCounted(clique, nodes, "doc_id")
      println(s"[clique] n=$n star_rounds=$rounds")
    }
    spark.stop()
  }
}
