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
    // the actual reduction, equal unless the top pair self-overlaps
    val drop = untok - totals.head
    assert(drop > 0 && drop <= learned.head._4,
      s"round-1 reduction $drop must be in (0, ${learned.head._4}]")
  }
}
