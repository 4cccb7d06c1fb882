package graft.operators

import graft.SparkSpec

/** [[TextAnalysis.bm25TopK]] against hand-computed Okapi BM25 scores
  * on a corpus small enough to verify with pencil: idf, length
  * normalization, tf saturation, tie-breaking, and the inverted-index
  * pruning contract (a term absent from the corpus contributes
  * nothing; a doc sharing no query term never appears). */
class Bm25Spec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry cherry"),
      (4L, "durian apple"),
    ).toDF("doc_id", "text")
  }

  private def queries(qs: (Long, String)*) = {
    import spark.implicits._
    qs.toDF("query_id", "qtext")
  }

  /** The operator's exact arithmetic, replicated: per-term micro-unit
    * contributions summed as integers. */
  private def expected(terms: Seq[(Int, Int)], n: Int = 4,
      avgdl: Double = 11.0 / 4, k1: Double = 1.2, b: Double = 0.75,
      df: Int => Int = _ => 2): Double = {
    val micro = terms.map { case (tf, dl) =>
      val idf = math.log(1 + (n - df(0) + 0.5) / (df(0) + 0.5))
      val w = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
      math.round(idf * w * 1e6)
    }.sum
    BigDecimal(micro / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  test("hand-computed scores, ranking, and doc_id tie-break") {
    val out = TextAnalysis.bm25TopK(docs, queries((0L, "apple cherry")),
        "text", "doc_id", "query_id", "qtext", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // df(apple) = df(cherry) = 2 -> idf = ln(1 + 2.5/2.5) = ln 2
    val d3 = expected(Seq((4, 4))) // cherry x4, dl 4
    val d1 = expected(Seq((2, 3))) // apple x2, dl 3
    val d2 = expected(Seq((1, 2))) // cherry x1, dl 2
    val d4 = expected(Seq((1, 2))) // apple x1, dl 2 — exact tie with d2
    assert(d2 == d4, "setup: docs 2 and 4 must tie exactly")
    assert(out.toSeq == Seq((3L, d3, 1), (1L, d1, 2), (2L, d2, 3), (4L, d4, 4)),
      s"got ${out.toSeq}")
    assert(d3 > d1 && d1 > d2, "tf saturation + length norm ordering")
  }

  test("tf saturates: 4 occurrences score far less than 4x one occurrence") {
    val one = expected(Seq((1, 4)))
    val four = expected(Seq((4, 4)))
    assert(four < 4 * one * 0.7, s"saturation: $four vs 4x$one")
    assert(four > one, "but more occurrences still score higher")
  }

  test("unknown query terms contribute nothing; unmatched docs never appear") {
    val out = TextAnalysis.bm25TopK(docs, queries((0L, "zzz durian")),
        "text", "doc_id", "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only doc 4 contains 'durian'; 'zzz' has no postings at all
    assert(out.toSeq == Seq((0L, 4L)))
  }

  test("k truncates per query independently") {
    val out = TextAnalysis.bm25TopK(docs,
        queries((0L, "apple cherry"), (1L, "banana")),
        "text", "doc_id", "query_id", "qtext", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.count(_._1 == 0L) == 2, "query 0 cut to k=2")
    assert(out.count(_._1 == 1L) == 2, "banana matches docs 1 and 2")
    assert(out.filter(_._1 == 1L).map(_._2).toSet == Set(1L, 2L))
  }

  test("bm25Stats merge: index over appended corpus == recompute, any split") {
    import spark.implicits._
    val all = (1L to 60L)
      .map(i => (i, s"w${i % 7} w${i % 13} common doc number w${i % 3}"))
      .toDF("doc_id", "text")
    val (fullDf, fullStats) = TextAnalysis.bm25Stats(all, "text", "doc_id")
    for (cut <- Seq(1L, 17L, 59L)) {
      val (mdf, mstats) = TextAnalysis.bm25StatsMerge(
        TextAnalysis.bm25Stats(all.filter($"doc_id" <= cut), "text", "doc_id"),
        TextAnalysis.bm25Stats(all.filter($"doc_id" > cut), "text", "doc_id"))
      val f = fullDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val m = mdf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m == f, s"df mismatch at cut $cut")
      assert(mstats.collect().head.toSeq == fullStats.collect().head.toSeq,
        s"stats mismatch at cut $cut")
    }
  }

  test("bm25StatsMerge is associative across a 3-way fold") {
    import spark.implicits._
    val all = (1L to 30L).map(i => (i, s"a${i % 5} b${i % 4} c"))
      .toDF("doc_id", "text")
    def slice(lo: Long, hi: Long) = TextAnalysis.bm25Stats(
      all.filter($"doc_id" >= lo && $"doc_id" <= hi), "text", "doc_id")
    val leftFold = TextAnalysis.bm25StatsMerge(
      TextAnalysis.bm25StatsMerge(slice(1, 10), slice(11, 20)), slice(21, 30))
    val rightFold = TextAnalysis.bm25StatsMerge(
      slice(1, 10), TextAnalysis.bm25StatsMerge(slice(11, 20), slice(21, 30)))
    val l = leftFold._1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r = rightFold._1.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(l == r)
    assert(leftFold._2.collect().head.toSeq ==
      rightFold._2.collect().head.toSeq)
  }
}
