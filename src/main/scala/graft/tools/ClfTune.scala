package graft.tools

import graft.operators.QualityClassifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quality-classifier evaluation: train/eval accuracy of the
  * closed-form fit on the held-out split, against the majority-class
  * baseline. (The GD sweep this tool originally ran is retired: every
  * full-batch integer-GD configuration ping-ponged between the
  * constant predictors — best eval 0.74 vs the closed form's 0.84 —
  * which is why QualityClassifier has no gradient path.) Usage:
  *   runMain graft.tools.ClfTune [sfDir]
  */
object ClfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.where(col("doc_id") % 5 =!= 0)
    val eval = docs.where(col("doc_id") % 5 === 0)
    val base = eval.select(QualityClassifier.marginLabel(col("text")).as("y"))
      .where(col("y") >= 0)
      .groupBy("y").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nEval = base.values.sum.toDouble
    println(f"[clf-tune] confident-eval majority baseline = ${base.values.max / nEval}%.3f (n=$nEval%.0f)")
    val t0 = System.nanoTime()
    val w = QualityClassifier.train(train)
    val fitSec = (System.nanoTime() - t0) / 1e9
    def acc(df: org.apache.spark.sql.DataFrame): Double = {
      val sc = QualityClassifier.score(df, w).where(col("y") >= 0)
      val ok = sc.where(col("pred") === col("y")).count()
      ok.toDouble / sc.count()
    }
    println(f"[clf-tune] closed-form fit ${fitSec}%.2f s " +
      f"trainAcc=${acc(train)}%.3f evalAcc=${acc(eval)}%.3f " +
      s"wMax=${w.map(math.abs).max}")
    spark.stop()
  }
}
