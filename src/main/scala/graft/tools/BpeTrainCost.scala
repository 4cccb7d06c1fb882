package graft.tools

import org.apache.spark.sql.SparkSession

/** Cost-vs-merges measurement for the word-histogram BPE trainer
  * (PERF.md table): wall-clock of `learnBpeMerges` at increasing
  * vocabulary sizes over the same corpus. The claim under test: after
  * the one-off corpus scan that builds the word histogram, per-round
  * cost is vocabulary-scoped, so 64 merges cost far below 8x the
  * 8-merge build. */
object BpeTrainCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(8, 16, 32, 64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.limit(1).count() // session warmup outside the timings
    // SPARK_GRAFT_BPE_BATCH: merges accepted per driver barrier
    // (default 1 = textbook sequential, the oracle path)
    val batch = sys.env.getOrElse("SPARK_GRAFT_BPE_BATCH", "1").toInt
    merges.foreach { n =>
      val t0 = System.nanoTime()
      // the trainer is eager (one argmax collect per round); collect()
      // of the n-row result forces nothing extra
      val (df, rounds) = graft.operators.TextAnalysis
        .learnBpeMergesWithRounds(docs, "text", n, batch)
      val rows = df.orderBy("rank").collect()
      val t = (System.nanoTime() - t0) / 1e9
      val last = rows.last
      println(f"BPETRAIN sf=$sfDir merges=$n batch=$batch rounds=$rounds " +
        f"seconds=$t%.2f " +
        s"last_merge=${last.getString(1)}+${last.getString(2)} n=${last.getLong(3)}")
    }
    spark.stop()
  }
}
