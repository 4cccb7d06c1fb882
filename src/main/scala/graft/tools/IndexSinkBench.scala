package graft.tools

import graft.operators.{IncrementalAnn, IncrementalText, TextAnalysis, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming index-maintenance throughput: drain a docs/embeddings
  * corpus through the standing-index `sink()`s as a rate-limited file
  * stream (`maxFilesPerTrigger` micro-batches under AvailableNow — the
  * scheduled-drain deployment shape) and report rows/s, commits made,
  * and a post-drain search parity check against the batch build.
  *
  * Usage: runMain graft.tools.IndexSinkBench <docsDir> [perTrigger]
  * (dir holds documents.parquet + embeddings.parquet; decades via
  *  ScaleUp docsOnly. perTrigger default 4 — with 32-file inputs that
  *  is 8 micro-batches, 8 snapshot commits per table.)
  */
object IndexSinkBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IndexSinkBench <docsDir> [perTrigger]")
    val dir = args(0)
    val perTrigger = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def fileStream(path: String): DataFrame = {
      val schema = spark.read.parquet(path).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(path)
    }

    // --- text index sink ---
    val docsPath = s"$dir/documents.parquet"
    val nDocs = spark.read.parquet(docsPath).count()
    val textIdx = Files.createTempDirectory("graft-sinkbench-text").toString
    val t0 = System.nanoTime()
    val tq = IncrementalText.sink(
      fileStream(docsPath).select(col("doc_id"), col("text")),
      textIdx, Files.createTempDirectory("cp").toString,
      "text", "doc_id", nBuckets = 64, drainOnce = true)
    tq.awaitTermination()
    val textS = (System.nanoTime() - t0) / 1e9
    // highest version number = commits made (versions() lists only
    // the RETAINED set after GC)
    val textCommits = graft.streaming.SnapshotUpsert
      .versions(spark, s"$textIdx/postings").last
    val qs = Seq((0L, "spark merge join")).toDF("query_id", "qtext")
    val streamedHits = IncrementalText
      .topK(spark, textIdx, qs, "query_id", "qtext").collect()
      .map(_.toSeq).toSet
    val freshHits = TextAnalysis.bm25TopK(
      spark.read.parquet(docsPath).select(col("doc_id"), col("text")),
      qs, "text", "doc_id", "query_id", "qtext").collect()
      .map(_.toSeq).toSet
    println(f"[indexsink] text  docs=$nDocs%9d drain=$textS%7.1f s " +
      f"(${nDocs / textS}%9.0f docs/s) commits=$textCommits " +
      f"parity=${streamedHits == freshHits}")

    // --- ANN index sink ---
    val vecPath = s"$dir/embeddings.parquet"
    val vecs = spark.read.parquet(vecPath)
      .select(col("vec_id"), col("embedding"))
    val nVecs = vecs.count()
    val cells = Similarity.autoCells(nVecs)
    val centroids = vecs.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("centroid"))
      .localCheckpoint()
    val annIdx = Files.createTempDirectory("graft-sinkbench-ann").toString
    val t1 = System.nanoTime()
    val aq = IncrementalAnn.sink(
      fileStream(vecPath).select(col("vec_id"), col("embedding")),
      annIdx, Files.createTempDirectory("cp").toString, centroids,
      "vec_id", "embedding", nBuckets = cells, drainOnce = true)
    aq.awaitTermination()
    val annS = (System.nanoTime() - t1) / 1e9
    val annCommits = graft.streaming.SnapshotUpsert.versions(spark, annIdx).last
    val queries = vecs.filter(col("vec_id") < 4)
    val streamedTop = IncrementalAnn.topK(spark, annIdx, centroids,
      queries, "vec_id", "embedding").collect().map(_.toSeq).toSet
    val freshTop = Similarity.ivfTopK(
      Similarity.assignCells(vecs, centroids, "vec_id", "embedding"),
      centroids, queries, "vec_id", "embedding").collect()
      .map(_.toSeq).toSet
    println(f"[indexsink] ann   vecs=$nVecs%9d drain=$annS%7.1f s " +
      f"(${nVecs / annS}%9.0f vecs/s) commits=$annCommits " +
      f"parity=${streamedTop == freshTop}")
    spark.stop()
  }
}
