package graft.operators

import graft.SparkSpec
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The standing-LSH-index ingest loop: candidates against the
  * committed index must equal the non-incremental cross-corpus finder
  * recomputed from text, across ingests, replays, and retirements. */
class IncrementalDedupSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-inc-dedup").toString

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and then runs far away into the deep dark forest tonight"
  private val other = "completely unrelated text about database " +
    "engines and columnar storage formats for analytical queries"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ingest candidates equal the non-incremental cross finder at every step") {
    val dir = tmp()
    val b1 = docs((1L, base), (2L, other))
    val b2 = docs((3L, base + " with a tiny edit"), (4L, "novel content " +
      "entirely distinct from anything ingested before this moment"))
    val b3 = docs((5L, base), (6L, other + " plus an appended clause"))
    // empty index: first ingest has nothing to collide with
    assert(pairs(IncrementalDedup.ingest(b1, dir, "text", "doc_id")).isEmpty)
    // step 2: candidates vs the recomputed cross finder on batch1
    val c2 = pairs(IncrementalDedup.ingest(b2, dir, "text", "doc_id"))
    assert(c2 == pairs(Dedup.minHashCandidatesCross(b2, b1, "text", "doc_id")))
    assert(c2.contains((3L, 1L)), s"near-copy must collide: $c2")
    // step 3: candidates vs the cross finder on batch1 UNION batch2
    val c3 = pairs(IncrementalDedup.ingest(b3, dir, "text", "doc_id"))
    assert(c3 == pairs(Dedup.minHashCandidatesCross(b3,
      b1.unionByName(b2), "text", "doc_id")))
    assert(c3.contains((5L, 1L)) && c3.contains((5L, 3L)), c3.toString)
  }

  test("a replayed ingest converges: same candidates, identical index content") {
    val dir = tmp()
    val b1 = docs((1L, base))
    val b2 = docs((2L, base))
    IncrementalDedup.ingest(b1, dir, "text", "doc_id")
    val first = pairs(IncrementalDedup.ingest(b2, dir, "text", "doc_id"))
    val before = IncrementalDedup.readIndex(spark, dir).collect()
      .map(_.toSeq).toSet
    // the replay re-states batch2's signature rows (keyed upsert)
    val replay = pairs(IncrementalDedup.ingest(b2, dir, "text", "doc_id"))
    // replayed batch sees ITSELF in the index too — the anti join on
    // the batch's doc_ids excludes those rows, so candidates are
    // unchanged
    assert(replay == first && first == Set((2L, 1L)))
    assert(IncrementalDedup.readIndex(spark, dir).collect()
      .map(_.toSeq).toSet == before, "index content must be idempotent")
  }

  test("a replayed MULTI-doc batch emits no intra-batch pairs the first " +
      "run never saw (batch ids are anti-joined out of the index side)") {
    val dir = tmp()
    IncrementalDedup.ingest(docs((1L, base)), dir, "text", "doc_id")
    // batch with TWO near-identical docs: first run matches each
    // against indexed doc 1 only (intra-batch pairs are out of scope
    // by contract)
    val b2 = docs((2L, base), (3L, base + " slightly"))
    val first = pairs(IncrementalDedup.ingest(b2, dir, "text", "doc_id"))
    assert(first == Set((2L, 1L), (3L, 1L)), first.toString)
    // replay: the index now holds docs 2 and 3 — without the anti join
    // the candidate join would ALSO emit (2,3)/(3,2), which the first
    // run never saw
    val replay = pairs(IncrementalDedup.ingest(b2, dir, "text", "doc_id"))
    assert(replay == first,
      s"replayed candidates must equal the first run: $replay vs $first")
  }

  test("retired docs stop matching from the next version on") {
    import spark.implicits._
    val dir = tmp()
    IncrementalDedup.ingest(docs((1L, base), (2L, other)), dir,
      "text", "doc_id")
    IncrementalDedup.ingest(docs((3L, base)), dir, "text", "doc_id")
    IncrementalDedup.retire(spark, dir, Seq(1L).toDF("doc_id"))
    assert(IncrementalDedup.readIndex(spark, dir)
      .where(col("doc_id") === 1L).count() == 0L,
      "every band row of the retired doc must be tombstoned")
    // a new near-copy collides with the surviving doc 3 only
    val c = pairs(IncrementalDedup.ingest(docs((7L, base)), dir,
      "text", "doc_id"))
    assert(c == Set((7L, 3L)), s"retired doc 1 must not match: $c")
  }

  test("real-data drive: incremental halves equal the one-shot cross finder " +
      "and the index survives its own commit lazily") {
    val all = graft.queries.QueryDef.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val (first, second) =
      (all.where(col("doc_id") % 2 === 0), all.where(col("doc_id") % 2 === 1))
    val dir = tmp()
    IncrementalDedup.ingest(first, dir, "text", "doc_id", nBuckets = 16)
    // consume the returned plan only AFTER its own index commit: the
    // manifest pin over immutable files must keep it valid
    val lazyCands = IncrementalDedup.ingest(second, dir, "text", "doc_id",
      nBuckets = 16)
    val incremental = pairs(lazyCands)
    val oneShot = pairs(Dedup.minHashCandidatesCross(second, first,
      "text", "doc_id"))
    assert(incremental == oneShot && incremental.nonEmpty,
      s"incremental ${incremental.size} vs one-shot ${oneShot.size}")
  }
}
