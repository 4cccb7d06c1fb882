package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the distributed BPE trainer ([[TextAnalysis.learnBpeMerges]])
  * beyond the oracle's exact-table parity: the argmax sequence is
  * structurally a BPE run (max pair count non-increasing; later rounds
  * may merge earlier rounds' symbols), and the learned table actually
  * COMPRESSES when fed back into the apply side — the train->apply
  * loop closes.
  */
class BpeLearnSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val learned =
    TextAnalysis.learnBpeMerges(docs, "text", nMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("max pair count is non-increasing across rounds") {
    val counts = learned.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts must be non-increasing: ${counts.mkString(",")}")
  }

  test("learning is hierarchical: some round merges a learned symbol") {
    val merged = learned.map { case (_, a, b, _) => a + b }.toSet
    assert(learned.exists { case (_, a, b, _) =>
      merged.contains(a) || merged.contains(b) },
      s"no round built on an earlier merge: ${learned.mkString(" ")}")
  }

  test("the learned table compresses the corpus through the apply side") {
    val basePairs: Seq[(String, String)] = Nil
    def totalTokens(merges: Seq[(String, String)]): Long =
      docs.agg(sum(TextAnalysis.bpeTokenCount(col("text"), merges)))
        .head().getLong(0)
    val untok = totalTokens(basePairs)
    val prefixes = learned.map { case (_, a, b, _) => (a, b) }.inits.toSeq
      .reverse.drop(1) // 1-merge, 2-merge, ..., 8-merge prefixes
    val totals = prefixes.map(p => totalTokens(p.toSeq))
    assert(totals.head < untok, "first merge must reduce total tokens")
    assert(totals.zip(totals.tail).forall { case (a, b) => b <= a },
      s"each merge must not increase tokens: ${(untok +: totals).mkString(",")}")
    // each replaced occurrence removes one token, but the trainer
    // counts ADJACENT occurrences (overlapping: pair (x,x) appears
    // twice in 'xxx') while the apply side replaces left-to-right
    // non-overlapping — so the reported count is an upper bound on
    // the actual reduction. The bound is TIGHT unless the pair
    // self-overlaps, which needs lhs == rhs (a 2-symbol pattern only
    // overlaps itself when both symbols are equal) — pin the exact
    // semantics, not just the range.
    val drop = untok - totals.head
    val (_, lhs, rhs, n1) = learned.head
    if (lhs != rhs)
      assert(drop == n1,
        s"lhs != rhs pair cannot self-overlap: reduction $drop must equal count $n1")
    else
      assert(drop > 0 && drop <= n1,
        s"round-1 reduction $drop must be in (0, $n1]")
  }

  test("batched training: batch=1 is bit-identical to the default; " +
      "batch=8 cuts driver barriers ~8x and stays a structural BPE run") {
    val (seq1, seqRounds) =
      TextAnalysis.learnBpeMergesWithRounds(docs, "text", nMerges = 8, batch = 1)
    assert(seqRounds == 8, s"sequential mode must pay one barrier per merge, got $seqRounds")
    val s1 = seq1.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(s1.toSeq == learned.toSeq, "batch=1 must equal the default path exactly")

    val (batched, bRounds) =
      TextAnalysis.learnBpeMergesWithRounds(docs, "text", nMerges = 8, batch = 8)
    val bt = batched.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(bRounds < seqRounds,
      s"batching must reduce barriers: $bRounds vs $seqRounds")
    assert(bt.length == 8 && bt.map(_._1).toSeq == (1 to 8),
      s"batched table must carry contiguous ranks: ${bt.mkString(" ")}")
    // counts non-increasing within the accepted order, and every
    // accepted pair's count is exact (symbol-disjointness): the
    // round-1 winner is identical to sequential by construction
    assert(bt.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      s"batched counts must be non-increasing: ${bt.map(_._4).mkString(",")}")
    assert(bt.head == s1.head, "the top merge must match the sequential run")
  }
}
