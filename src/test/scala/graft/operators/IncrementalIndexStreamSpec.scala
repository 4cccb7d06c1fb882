package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The streaming face of the standing indexes: a streamed corpus must
  * build exactly the index the batch ingests build — micro-batch
  * boundaries invisible to search. */
class IncrementalIndexStreamSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-inc-stream").toString

  test("a streamed corpus builds the same text index as batch ingests") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmp()
    val input = MemoryStream[(Long, String)]
    val q = IncrementalText.sink(input.toDF().toDF("doc_id", "text"),
      dir, tmp(), "text", "doc_id", nBuckets = 8)
    val b1 = Seq((1L, "spark merges sorted runs"), (2L, "the lazy dog sleeps"))
    val b2 = Seq((3L, "sorted merge joins in spark"), (4L, "dogs and cats"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val qs = Seq((0L, "spark merge"), (1L, "lazy dog")).toDF("query_id", "qtext")
    def ranked(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val streamed = ranked(IncrementalText.topK(spark, dir, qs,
      "query_id", "qtext", k = 3))
    val fresh = ranked(TextAnalysis.bm25TopK((b1 ++ b2).toDF("doc_id", "text"),
      qs, "text", "doc_id", "query_id", "qtext", k = 3))
    assert(streamed == fresh && streamed.nonEmpty)
  }

  test("a streamed corpus builds the same LSH signature index as batch ingests") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val streamDir = tmp(); val batchDir = tmp()
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep dark forest tonight"))
    val b2 = Seq((2L, "completely unrelated text about database engines " +
      "and columnar storage formats for analytical queries"))
    val input = MemoryStream[(Long, String)]
    val q = IncrementalDedup.sink(input.toDF().toDF("doc_id", "text"),
      streamDir, tmp(), "text", "doc_id", nBuckets = 8)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    IncrementalDedup.ingest(b1.toDF("doc_id", "text"), batchDir,
      "text", "doc_id", nBuckets = 8)
    IncrementalDedup.ingest(b2.toDF("doc_id", "text"), batchDir,
      "text", "doc_id", nBuckets = 8)
    def content(d: String) = IncrementalDedup.readIndex(spark, d)
      .collect().map(_.toSeq).toSet
    assert(content(streamDir) == content(batchDir) &&
      content(streamDir).nonEmpty)
  }

  test("a streamed embedding feed builds the same ANN index as batch ingest") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val embeddings = graft.queries.QueryDef.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val centroids = embeddings.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("centroid"))
      .localCheckpoint()
    val rows = embeddings.filter(col("vec_id") < 64)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dir = tmp()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = IncrementalAnn.sink(
      input.toDF().toDF("vec_id", "embedding"), dir, tmp(), centroids,
      "vec_id", "embedding", nBuckets = 16)
    try {
      input.addData(rows.take(32).toSeq: _*); q.processAllAvailable()
      input.addData(rows.drop(32).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val queries = embeddings.filter(col("vec_id") < 4)
    def topkSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val streamed = topkSet(IncrementalAnn.topK(spark, dir, centroids,
      queries, "vec_id", "embedding", k = 3, nProbe = 4))
    val fresh = topkSet(Similarity.ivfTopK(
      Similarity.assignCells(embeddings.filter(col("vec_id") < 64),
        centroids, "vec_id", "embedding"),
      centroids, queries, "vec_id", "embedding", k = 3, nProbe = 4))
    assert(streamed == fresh && streamed.nonEmpty)
  }
}
