package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.embeddingDecontaminate]]: planted paraphrase-style near-dups
  * (same direction, different magnitude -> cosine 1) must be flagged;
  * orthogonal vectors must not; the multi-table LSH block must catch a
  * near-dup even when the corpus doc never collides with the eval doc
  * in table 0 alone. */
class SemanticDecontamSpec extends SparkSpec {

  private def df(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val dims = 8
  private def unit(i: Int): Array[Float] =
    Array.tabulate(dims)(j => if (j == i) 1f else 0f)

  test("planted near-dup flagged with exact cosine; orthogonal vector clean") {
    val evalSet = df(100L -> unit(0), 101L -> unit(1))
    val corpus = df(
      1L -> unit(0).map(_ * 3f), // same direction as eval 100 -> cos 1
      2L -> unit(2), // orthogonal to both eval vectors
      3L -> Array.tabulate(dims)(j => if (j <= 1) 1f else 0f), // 45deg to both
    )
    val out = Dedup.embeddingDecontaminate(corpus, evalSet,
        "vec_id", "embedding", tau = 0.9, bits = 2, tables = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out.contains(1L), "scaled copy of an eval vector must flag")
    assert(!out.contains(2L), "orthogonal vector is clean at tau=0.9")
    assert(!out.contains(3L), "cos(45deg)=0.707 < 0.9 stays clean")
    assert(math.abs(out(1L)._1 - 1.0) < 1e-9, s"exact cosine, got ${out(1L)._1}")
    assert(out(1L)._2 == 1L)
  }

  test("lower tau flags the 45-degree vector too, counting both eval matches") {
    val evalSet = df(100L -> unit(0), 101L -> unit(1))
    val corpus = df(3L -> Array.tabulate(dims)(j => if (j <= 1) 1f else 0f))
    val out = Dedup.embeddingDecontaminate(corpus, evalSet,
        "vec_id", "embedding", tau = 0.5, bits = 1, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.get(3L).contains(2L),
      s"cos 0.707 >= 0.5 against BOTH eval vectors, got $out")
  }

  test("a table-0 bucket miss is recovered by another table (recall amplification)") {
    // Find a corpus/eval near-dup pair that lands in DIFFERENT table-0
    // buckets but shares a bucket in some other table: perturb the
    // eval vector slightly off a hyperplane boundary until table 0
    // splits them, then assert the 4-table run still flags the doc.
    val base = Array.tabulate(dims)(j => math.sin(j + 1).toFloat)
    def bucketOf(v: Array[Float], bits: Int, table: Int): Long = {
      val d = df(0L -> v)
      d.select(Similarity.lshBucket(col("embedding"), bits, table).as("b"))
        .collect().head.getLong(0)
    }
    val candidates = (1 to 400).iterator.map { i =>
      val eps = i * 1e-3f
      val v = base.clone(); v(i % dims) += eps
      v
    }
    val split = candidates.find { v =>
      bucketOf(v, 8, 0) != bucketOf(base, 8, 0) &&
        (1 until 4).exists(t => bucketOf(v, 8, t) == bucketOf(base, 8, t))
    }
    assume(split.nonEmpty, "no boundary-splitting perturbation found")
    val out4 = Dedup.embeddingDecontaminate(
        df(1L -> base), df(100L -> split.get),
        "vec_id", "embedding", tau = 0.99, bits = 8, tables = 4)
      .collect().map(_.getLong(0)).toSet
    assert(out4.contains(1L), "multi-table run recovers the table-0 miss")
    val out1 = Dedup.embeddingDecontaminate(
        df(1L -> base), df(100L -> split.get),
        "vec_id", "embedding", tau = 0.99, bits = 8, tables = 1)
      .collect().map(_.getLong(0)).toSet
    assert(!out1.contains(1L), "single-table run provably misses this pair")
  }
}
