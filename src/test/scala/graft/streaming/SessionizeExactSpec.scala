package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** [[EventStreams.sessionizeExact]] — the stream-batch-exact
  * sessionizer: closed sessions must equal the same function's BATCH
  * output over the same rows, including late arrivals split across
  * micro-batches (the divergence [[EventStreams.sessionize]] documents
  * and trades for latency). */
class SessionizeExactSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private def closedSet(rows: Seq[Session]): Set[(Long, Long, Timestamp, Timestamp)] =
    rows.filter(_.closed)
      .map(s => (s.user_id, s.n_events, s.first_ts, s.last_ts)).toSet

  test("a late arrival split across two micro-batches stitches into " +
      "the orphan chain the previous batch opened — output equals the " +
      "batch run") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionizeExact(input.toDS(), gapMs = 10 * 60000L).writeStream
      .format("memory").queryName("exact_sessions").outputMode("append")
      .start()
    try {
      // batch 1: a future session opens (watermark -> 9880)
      input.addData(Event(1, ts(10000), 1, "click", 0))
      q.processAllAvailable()
      // batch 2: a late orphan, admitted by the watermark, > gap
      // before the open session
      input.addData(Event(2, ts(9900), 1, "click", 0))
      q.processAllAvailable()
      // batch 3: a STILL-LATER row extending that orphan — the
      // cross-batch stitch sessionize cannot do (it already emitted
      // the orphan); here the chain is live state and grows
      input.addData(Event(3, ts(9905), 1, "click", 0))
      q.processAllAvailable()
      // nothing is final yet (the watermark has not passed any chain)
      assert(spark.table("exact_sessions").count() == 0)
      // batch 4: far future — the watermark finalizes both chains
      input.addData(Event(4, ts(30000), 1, "click", 0))
      q.processAllAvailable()
      val streamed = spark.table("exact_sessions").as[Session].collect().toSeq
      assert(closedSet(streamed) == Set(
        (1L, 2L, ts(9900), ts(9905)),
        (1L, 1L, ts(10000), ts(10000))), streamed.toString)

      // the batch run over the same rows must agree on every session
      // the stream has finalized (the batch additionally closes the
      // last chain, which the stream's watermark has not passed yet)
      val batchOut = sessionizeExact(Seq(
        Event(1, ts(10000), 1, "click", 0), Event(2, ts(9900), 1, "click", 0),
        Event(3, ts(9905), 1, "click", 0), Event(4, ts(30000), 1, "click", 0))
        .toDS(), gapMs = 10 * 60000L).collect().toSeq
      assert(closedSet(streamed).subsetOf(closedSet(batchOut)))
      assert(closedSet(batchOut) -- closedSet(streamed) ==
        Set((1L, 1L, ts(30000), ts(30000))))
    } finally q.stop()
  }

  test("a later-batch row BRIDGES an orphan chain into the open " +
      "session (three batches, one merged session)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionizeExact(input.toDS(), gapMs = 10 * 60000L).writeStream
      .format("memory").queryName("exact_bridge").outputMode("append")
      .start()
    try {
      input.addData(Event(1, ts(10000), 1, "click", 0))
      q.processAllAvailable()
      input.addData(Event(2, ts(9985), 1, "click", 0)) // orphan chain
      q.processAllAvailable()
      // 9992 is within a gap of BOTH the orphan (9985) and the session
      // start (10000): the chains merge into one
      input.addData(Event(3, ts(9992), 1, "click", 0))
      q.processAllAvailable()
      input.addData(Event(4, ts(30000), 1, "click", 0)) // finalize
      q.processAllAvailable()
      val streamed = spark.table("exact_bridge").as[Session].collect().toSeq
      assert(closedSet(streamed) ==
        Set((1L, 3L, ts(9985), ts(10000))), streamed.toString)
    } finally q.stop()
  }

  test("batch execution emits every chain closed (no watermark = " +
      "everything final) and matches the window-function sessionizer's " +
      "grouping") {
    import spark.implicits._
    val out = sessionizeExact(Seq(
      Event(1, ts(10), 1, "click", 0), Event(2, ts(15), 1, "click", 0),
      Event(3, ts(60), 1, "click", 0), Event(4, ts(62), 1, "click", 0),
      Event(5, ts(40), 2, "view", 0)).toDS(), gapMs = 10 * 60000L)
      .collect().toSeq
    assert(closedSet(out) == Set(
      (1L, 2L, ts(10), ts(15)), (1L, 2L, ts(60), ts(62)),
      (2L, 1L, ts(40), ts(40))), out.toString)
  }
}
