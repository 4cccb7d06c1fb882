package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Generalizes LocalClusterMerge's executor-boundary evidence to ANY
  * registry query: run it under `local-cluster[N,cores,mem]` (separate
  * executor JVMs — every shuffle byte is a real inter-process fetch)
  * and report wall + cross-JVM shuffle read/write. Comparing these
  * bytes with ShuffleAudit's single-JVM numbers for the same query and
  * scale closes the remaining local-mode inference for the
  * signatures-only-shuffle claims: if the bytes match, the local[32]
  * audit measured the true network cost, not an artifact.
  *
  * Usage:
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_WORKER_DIR=target/lc-work SPARK_GRAFT_SF_DIR=<sf> \
  *     sbt "runMain graft.tools.LocalClusterAudit q_a q_b ..."
  */
object LocalClusterAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .getAbsolutePath
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_minhash64", "q_text_bm25", "q_corpus_filter_clf")
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode forks executor JVMs via $SPARK_HOME/bin/spark-class")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master("local-cluster[4,4,4096]")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = new StageTotals
    spark.sparkContext.addSparkListener(t)
    def settle(): Unit =
      org.apache.spark.graftspark.ListenerDrain.drain(spark.sparkContext)
    for (name <- names) {
      val run = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (codegen, broadcast builds)
      settle(); t.reset()
      val sec = once()
      settle()
      println(f"[lc-audit] $name%-28s wall=${sec}%6.2f s " +
        f"crossJvmShuffleRead=${t.shuffleRead / 1e6}%.1f MB " +
        f"write=${t.shuffleWrite / 1e6}%.1f MB spill=${t.spillDisk / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
