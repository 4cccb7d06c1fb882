package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stride-windowing invariants for [[Corpus.windowChunks]]: coverage
  * (every token lands in some window), overlap (consecutive windows
  * share exactly `overlap` tokens), determinism of the layout, the
  * empty-document row, and the zero-shuffle plan shape.
  */
class WindowChunksSpec extends SparkSpec {
  import spark.implicits._

  private val C = 8
  private val O = 3
  private val step = C - O

  private def chunked = {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i,").mkString),   // 20 tokens -> 4 windows
      (2L, (1 to 8).map(i => s"u$i,").mkString),    // exactly one window
      (3L, (1 to 9).map(i => s"v$i,").mkString),    // one full + one short
      (4L, ""),                                     // empty -> 1 empty window
    ).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), ",").as("raw"))
      .select(col("doc_id"), expr("filter(raw, x -> x != '')").as("toks"))
    Corpus.windowChunks(docs, "doc_id", "toks", C, O)
  }

  test("window count and sizes follow the integer layout") {
    val rows = chunked.orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 20 tokens, ceil((20-3)/5)=4 windows: sizes 8,8,8,5
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq(8L, 8L, 8L, 5L))
    // doc 2: 8 tokens -> exactly ceil((8-3)/5)=1 window of 8
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(8L))
    // doc 3: 9 tokens -> 2 windows: 8 and (9-5)=4
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq == Seq(8L, 4L))
    // doc 4: empty -> one window with zero tokens, text ''
    assert(rows.filter(_._1 == 4L).map(_._3).toSeq == Seq(0L))
    assert(chunked.filter(col("doc_id") === 4L).select("chunk_text")
      .head().getString(0) == "")
  }

  test("coverage + overlap: windows tile the stream with `overlap` shared tokens") {
    // reconstruct doc 1's stream from windows: window k contributes its
    // tokens from position overlap (except k=0) -> concatenation of
    // non-overlapping suffixes must equal the original token stream
    val toks = (1 to 20).map(i => s"t$i")
    val windows = chunked.filter(col("doc_id") === 1L)
      .orderBy("chunk_idx").select("chunk_text").collect().map(_.getString(0))
    // each consecutive pair shares exactly the overlap's text
    windows.sliding(2).zipWithIndex.foreach { case (Array(a, b), k) =>
      val sharedA = toks.slice((k + 1) * step, (k + 1) * step + O).mkString
      assert(a.endsWith(sharedA) && b.startsWith(sharedA),
        s"windows $k/${k + 1} must share the $O-token overlap")
    }
    val rebuilt = windows.head +
      windows.tail.zipWithIndex.map { case (w, i) =>
        // strip the overlap text (token-aligned by construction)
        val shared = toks.slice((i + 1) * step, (i + 1) * step + O).mkString
        w.stripPrefix(shared)
      }.mkString
    assert(rebuilt == toks.mkString, "windows must cover every token exactly")
  }

  test("plan has zero shuffles — scan-local generate") {
    val plan = chunked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"windowChunks must not shuffle:\n$plan")
  }
}
