package graft.operators

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The standing inverted-index loop: topK from the committed postings
  * must be bit-identical to the non-incremental bm25TopK recomputed
  * from text, across ingests, replays, and retirements — and retrieval
  * must read ONLY the query terms' buckets. */
class IncrementalTextSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-inc-text").toString

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def queries(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("query_id", "qtext")
  }

  private def ranked(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Double, Int)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("topK over accumulated ingests is bit-identical to the fresh bm25TopK") {
    val dir = tmp()
    val b1 = docs((1L, "spark merges sorted runs"), (2L, "the lazy dog sleeps"))
    val b2 = docs((3L, "sorted merge joins in spark"), (4L, "dogs and cats"))
    val qs = queries((0L, "spark merge"), (1L, "lazy dog"))
    IncrementalText.ingest(b1, dir, "text", "doc_id", nBuckets = 8)
    IncrementalText.ingest(b2, dir, "text", "doc_id", nBuckets = 8)
    val inc = ranked(IncrementalText.topK(spark, dir, qs,
      "query_id", "qtext", k = 3))
    val fresh = ranked(TextAnalysis.bm25TopK(b1.unionByName(b2), qs,
      "text", "doc_id", "query_id", "qtext", k = 3))
    assert(inc == fresh && inc.nonEmpty, s"inc $inc vs fresh $fresh")
  }

  test("a replayed ingest converges; an updated doc = retire + ingest") {
    val dir = tmp()
    val b1 = docs((1L, "alpha beta gamma"), (2L, "delta epsilon"))
    IncrementalText.ingest(b1, dir, "text", "doc_id", nBuckets = 8)
    val before = SnapshotUpsert
      .readSnapshot(spark, s"$dir/postings").collect().map(_.toSeq).toSet
    IncrementalText.ingest(b1, dir, "text", "doc_id", nBuckets = 8)
    assert(SnapshotUpsert.readSnapshot(spark, s"$dir/postings").collect()
      .map(_.toSeq).toSet == before, "replay must be idempotent")
    // update doc 1: retire with the OLD text, ingest the new — the
    // removed term must stop retrieving it
    IncrementalText.retire(spark, dir, docs((1L, "alpha beta gamma")),
      "text", "doc_id")
    IncrementalText.ingest(docs((1L, "beta gamma only")), dir,
      "text", "doc_id", nBuckets = 8)
    val hits = ranked(IncrementalText.topK(spark, dir,
      queries((0L, "alpha")), "query_id", "qtext", k = 3))
    assert(hits.isEmpty, s"'alpha' was removed from doc 1: $hits")
    val corpus = docs((1L, "beta gamma only"), (2L, "delta epsilon"))
    assert(ranked(IncrementalText.topK(spark, dir, queries((0L, "beta")),
        "query_id", "qtext", k = 3)) ==
      ranked(TextAnalysis.bm25TopK(corpus, queries((0L, "beta")),
        "text", "doc_id", "query_id", "qtext", k = 3)))
  }

  test("retrieval reads only the query terms' buckets (inverted-index fetch)") {
    val dir = tmp()
    // many distinct single-term docs spread the postings over buckets
    IncrementalText.ingest(
      docs((1L to 64L).map(i => (i, s"term$i filler")): _*),
      dir, "text", "doc_id", nBuckets = 16)
    val fetched = SnapshotUpsert.readKeys(spark, s"$dir/postings",
      queries((0L, "term7 term9")).select(
        explode(split(col("qtext"), " ")).as("term")),
      Seq("term"))
    val full = SnapshotUpsert.readSnapshot(spark, s"$dir/postings")
    assert(fetched.inputFiles.length < full.inputFiles.length,
      s"${fetched.inputFiles.length} vs ${full.inputFiles.length}")
    assert(fetched.collect().map(_.getString(0)).toSet == Set("term7", "term9"))
  }

  test("real-data drive: incremental halves equal the one-shot bm25TopK") {
    import spark.implicits._
    val all = graft.queries.QueryDef.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val qs = Seq((0L, "spark merge join"), (1L, "vector window stream"))
      .toDF("query_id", "qtext")
    val dir = tmp()
    IncrementalText.ingest(all.where(col("doc_id") % 2 === 0), dir,
      "text", "doc_id", nBuckets = 16)
    IncrementalText.ingest(all.where(col("doc_id") % 2 === 1), dir,
      "text", "doc_id", nBuckets = 16)
    val inc = ranked(IncrementalText.topK(spark, dir, qs,
      "query_id", "qtext", k = 10))
    val fresh = ranked(TextAnalysis.bm25TopK(all, qs, "text", "doc_id",
      "query_id", "qtext", k = 10))
    assert(inc == fresh && inc.nonEmpty, s"inc ${inc.size} vs fresh ${fresh.size}")
  }
}
