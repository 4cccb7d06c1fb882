package graft.operators

import graft.SparkSpec

/** [[Similarity.rrfFuse]] against hand-computed reciprocal-rank
  * fusion: consensus beats a single strong system, absent docs
  * contribute nothing, micro-unit arithmetic is exact, ties break on
  * doc_id. */
class RrfSpec extends SparkSpec {

  private def ranking(rows: (Long, Long, Int)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rank")
  }

  private def micro(rank: Int, k: Int = 60): Long =
    math.round(1e6 / (k + rank))

  test("hand-computed fusion: consensus at middling ranks beats one rank-1") {
    // doc 10: rank 1 in A only. doc 20: rank 3 in A and rank 2 in B.
    val a = ranking((0L, 10L, 1), (0L, 20L, 3))
    val b = ranking((0L, 20L, 2), (0L, 30L, 1))
    val out = Similarity.rrfFuse(Seq(a, b), k = 60, topK = 10)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._4)
    val s10 = micro(1)
    val s20 = micro(3) + micro(2)
    val s30 = micro(1)
    assert(s20 > s10, "setup: consensus must out-sum the single rank-1")
    def d(m: Long) = BigDecimal(m / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 10 and 30 tie exactly (both a lone rank-1) -> doc_id order
    assert(out.toSeq == Seq(
      (20L, d(s20), 2L, 1), (10L, d(s10), 1L, 2), (30L, d(s30), 1L, 3)),
      s"got ${out.toSeq}")
  }

  test("queries fuse independently and topK truncates per query") {
    val a = ranking((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3), (1L, 9L, 1))
    val b = ranking((0L, 2L, 1), (1L, 8L, 1))
    val out = Similarity.rrfFuse(Seq(a, b), k = 60, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    assert(out.count(_._1 == 0L) == 2, "query 0 cut to topK=2")
    assert(out.filter(_._1 == 0L).minBy(_._3)._2 == 2L,
      "doc 2 (in both systems) must fuse to rank 1")
    assert(out.count(_._1 == 1L) == 2, "query 1 has exactly 2 candidates")
  }
}
