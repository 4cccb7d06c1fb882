package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming operators.
  *
  * The reference is batch-only (SURVEY §2.9) — its incremental concern
  * is solved with the TTL cache. This module adds the streaming
  * capabilities a continuously-fed advisory/training-data pipeline
  * needs, on the engine's own tables:
  *
  *   - watermarked tumbling-window aggregation (the streaming form of
  *     `q_events_hourly`);
  *   - event sessionization with `flatMapGroupsWithState` (timeout-based
  *     session close);
  *   - a streaming advisory FSM with `mapGroupsWithState`: per
  *     (cve, package) key, proposals stream in and fold through the
  *     same [[graft.statemachine.StateMachine]] the batch path uses.
  *
  * All transforms accept either a streaming or a batch DataFrame (the
  * plans are identical; tests drive them with MemoryStream).
  */
object EventStreams {

  /** Watermarked hourly rollup per event type. Late rows beyond the
    * watermark are dropped instead of growing state forever — the knob
    * that makes this run indefinitely on an unbounded feed. */
  def hourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Watermarked stream-STREAM interval join (purchase attribution):
    * each purchase matches the same user's clicks from the preceding
    * `lookback` window. Both sides carry event-time watermarks and the
    * join condition bounds the time range in both directions, so Spark
    * can expire join state — per-key state is O(events in lookback +
    * watermark), never the whole history. This is the canonical
    * two-stream correlation shape (attribution, request/response
    * pairing, fraud windows). */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame,
      lookback: String = "10 minutes", watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    // joinType "leftOuter" gives attribution WITH the misses: an
    // unattributed purchase emits null-click once the click-side
    // watermark passes p_ts (no earlier click can still arrive), so
    // the output is complete AND state stays bounded — the both-sided
    // watermark + two-sided time bound is what makes the outer form
    // legal on two unbounded streams
    p.join(c, expr(
        s"user_id = c_user AND c_ts >= p_ts - INTERVAL $lookback AND c_ts <= p_ts"),
        joinType)
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"), col("value"))
  }

  /** Stream-static enrichment join: each streaming row picks up the
    * dimension attributes for its key. The static side is broadcast
    * (re-read per micro-batch when it is a file source, so dimension
    * updates flow in without restarting the query); the stream is
    * never shuffled and no state is kept — this is the stateless
    * workhorse shape for attaching user/advisory metadata to a feed. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      keys: Seq[String], joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long, first_ts: java.sql.Timestamp,
      last_ts: java.sql.Timestamp, closed: Boolean)

  case class SessionState(n: Long, first: Long, last: Long)

  /** Timeout-based sessionization: a user's events accumulate until
    * `gapMs` of silence, then the closed session is emitted. State per
    * key is O(1) — counts and bounds, never the events themselves.
    *
    * Late-orphan semantics: rows that predate the open session by more
    * than `gapMs` can never merge into it (the state holds ONE session
    * per key), so they are closed out immediately — but WITHIN a batch
    * they are first chained like the batch sessionizer would chain
    * them: consecutive orphans within `gapMs` of each other merge into
    * one closed session, and an orphan chain that reaches within
    * `gapMs` of the open session's start folds into the session
    * itself. The remaining approximation is cross-BATCH: an orphan
    * emitted in batch N is final and cannot be extended by a
    * still-later row in batch N+1 (that row starts a new orphan
    * session). That is this variant's LATENCY choice — sessions emit
    * the moment a successor supersedes them, so finality cannot wait
    * for the watermark. [[sessionizeExact]] (r12) removes the
    * approximation by carrying every non-finalized chain in state and
    * emitting only watermark-final sessions — batch-identical output
    * at watermark-delay latency. Batch jobs over historical data can
    * also use the batch sessionizer (`q_sessionize_batch`). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    // the clamp below may only consult the watermark when one exists:
    // in BATCH execution the analyzer eliminates the watermark node
    // and getCurrentWatermarkMs() throws (and batch timeouts are
    // no-ops anyway, so there is nothing to clamp)
    val clampToWatermark = events.isStreaming
    // event-time timeouts require a watermark; it also bounds state for
    // late data on an unbounded feed
    events.withWatermark("ts", watermark).groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n,
              new java.sql.Timestamp(s.first), new java.sql.Timestamp(s.last),
              closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val prev = state.getOption
            var out = List.empty[Session]
            var cur = prev
            // late-orphan buffer (see object doc): orphans are chained
            // within the batch like the batch sessionizer chains them,
            // instead of each becoming its own single-event session
            var pendingOrphan: Option[SessionState] = None
            def flushOrphan(): Unit = pendingOrphan.foreach { o =>
              out ::= Session(userId, o.n, new java.sql.Timestamp(o.first),
                new java.sql.Timestamp(o.last), closed = true)
              pendingOrphan = None
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // rows are sorted WITHIN a batch, but a row arriving in
                // a LATER batch can legally predate the open session
                // (the watermark admits it): merge by min/max so bounds
                // never invert — the old `last = t` write let one late
                // row drag `last` before `first`, and the next on-time
                // row then measured its gap against the corrupted bound
                // and falsely split the session
                case Some(s) if t >= s.first - gapMs && t - s.last <= gapMs =>
                  var m = SessionState(s.n + 1,
                    math.min(s.first, t), math.max(s.last, t))
                  // this row may have BRIDGED the orphan chain to the
                  // session (it pulled `first` to within a gap of the
                  // chain's end): the whole chain is then one session
                  pendingOrphan match {
                    case Some(o) if m.first - o.last <= gapMs =>
                      m = SessionState(m.n + o.n,
                        math.min(o.first, m.first), m.last)
                      pendingOrphan = None
                    case _ => ()
                  }
                  cur = Some(m)
                case Some(s) if t < s.first - gapMs =>
                  // an orphan more than a gap BEFORE the open session:
                  // it can never merge into it (the state holds one
                  // session per key) — chain it with the pending orphan
                  // when within a gap of it, else the pending chain is
                  // itself complete (rows are sorted: nothing later can
                  // fall inside it) and this row starts a new chain
                  pendingOrphan match {
                    case Some(o) if t - o.last <= gapMs =>
                      pendingOrphan = Some(SessionState(o.n + 1,
                        o.first, math.max(o.last, t)))
                    case _ =>
                      flushOrphan()
                      pendingOrphan = Some(SessionState(1, t, t))
                  }
                case Some(s) =>
                  // the orphan chain (strictly before s) closes first so
                  // emission order follows event time
                  flushOrphan()
                  out ::= Session(userId, s.n, new java.sql.Timestamp(s.first),
                    new java.sql.Timestamp(s.last), closed = true)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            flushOrphan()
            cur.foreach { s =>
              state.update(s)
              // Late-row filtering lags the watermark by ONE batch
              // (rows the previous batch's watermark accepted must
              // still be accepted), but timeout registration is
              // validated against the CURRENT watermark — so a
              // watermark jump wider than the gap (a far-future event
              // or a backfill replay in the prior batch; hit by the
              // 100M-event time-random replay rehearsal) hands this
              // function legally-accepted rows whose gap horizon lies
              // below the watermark, and registering that timeout
              // throws and kills the query. Clamp to wm+1: the
              // session keeps its true bounds and closes at the next
              // watermark tick.
              val floor =
                if (clampToWatermark) state.getCurrentWatermarkMs() + 1
                else Long.MinValue
              state.setTimeoutTimestamp(math.max(s.last + gapMs, floor))
            }
            out.reverseIterator
          }
      }
  }

  case class ChainsState(chains: List[SessionState])

  /** EXACT sessionization — [[sessionize]]'s remaining cross-batch
    * approximation removed: per key the state holds EVERY session
    * chain the watermark has not yet finalized (not just the newest),
    * so a late arrival in batch N+1 extends — or BRIDGES — chains
    * opened in batch N exactly as the batch sessionizer would have
    * merged them. A chain is emitted only once the watermark passes
    * `last + gap`: by the watermark contract no admissible row can
    * ever extend it again, so the emission is FINAL by construction —
    * over any feed the watermark admits, the closed-session multiset
    * equals the batch sessionizer's output on the same rows (pinned
    * by the stream-batch-exact spec, including a late arrival split
    * across two micro-batches). Spark's one-batch late-filter lag is
    * aligned with this rule: batch N+1's filter admits rows >= batch
    * N's watermark, and a chain emitted at batch N needed
    * `last + gap < wm_N` — an admissible row therefore lands strictly
    * past the emitted chain's horizon and can never re-open it.
    *
    * The price vs [[sessionize]] is LATENCY and state: a closed
    * session surfaces when the watermark passes it (the watermark
    * delay), not the moment a successor burst supersedes it, and the
    * per-key state holds up to `watermark / gap + 1` concurrent
    * chains (bounded because the watermark bounds admissible
    * lateness — ~5 for the defaults here). Pick per consumer:
    * dashboards wanting sessions the moment the next burst starts
    * keep [[sessionize]]'s single-chain low-latency form; training
    * pipelines wanting batch-identical sessions take this one. */
  def sessionizeExact(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val clampToWatermark = events.isStreaming
    events.withWatermark("ts", watermark).groupByKey(_.user_id)
      .flatMapGroupsWithState[ChainsState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[ChainsState]) =>
          // batch execution has no watermark: every chain is final at
          // the single invocation's end (the batch saw all rows)
          val wm =
            if (clampToWatermark) state.getCurrentWatermarkMs()
            else Long.MaxValue
          var chains = state.getOption.map(_.chains).getOrElse(Nil)
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              // a row can touch SEVERAL chains (it bridges the ones
              // whose gap windows it falls between) — merge them all
              val (touch, rest) = chains.partition(c =>
                t >= c.first - gapMs && t <= c.last + gapMs)
              val merged = touch.foldLeft(SessionState(1, t, t))((m, c) =>
                SessionState(m.n + c.n, math.min(m.first, c.first),
                  math.max(m.last, c.last)))
              chains = merged :: rest
            }
          }
          val (done, live) = chains.partition(_.last + gapMs < wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(ChainsState(live))
            if (clampToWatermark) {
              // wake when the earliest live chain becomes final; the
              // wm+1 clamp survives watermark jumps wider than the gap
              // (same hazard sessionize documents)
              val next = live.map(_.last + gapMs).min
              state.setTimeoutTimestamp(math.max(next, wm + 1))
            }
          }
          done.sortBy(_.first).map(c => Session(userId, c.n,
            new java.sql.Timestamp(c.first), new java.sql.Timestamp(c.last),
            closed = true)).iterator
      }
  }

  /** Streaming exact dedup for a continuously-fed document/event
    * stream: drop rows whose key was already seen within the watermark
    * horizon. State stores only keys and ages out with the watermark —
    * the streaming form of [[graft.operators.Dedup.exactDedupGroups]]
    * (an unbounded-state global dedup cannot run forever). */
  def streamingDedup(rows: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Exactly-once parquet FILE sink: the checkpoint tracks committed
    * batch ids and the sink's file-manifest log makes partially-written
    * batches invisible to readers, so a crash/restart never duplicates
    * or tears a batch. Readers see only committed files (they must go
    * through the same Spark file-source path, which consults the
    * manifest). This is the default landing pattern for a corpus feed:
    * append-only parquet, optionally hive-partitioned. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      partitionBy: Seq[String] = Nil, drainOnce: Boolean = false): StreamingQuery = {
    var w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
    // Trigger.AvailableNow: process the full backlog in rate-limited
    // micro-batches, then STOP — the scheduled-batch-ingest pattern
    // (cron a drain instead of keeping a cluster resident) with the
    // same checkpoint/exactly-once guarantees as the resident query
    if (drainOnce) {
      w = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    }
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Idempotent per-micro-batch write for [[foreachBatchSink]]: each
    * batch lands in its own `batch_id=N` hive partition under dynamic
    * partition overwrite, so a REPLAYED batch (restart after a failure
    * between sink write and checkpoint commit) overwrites exactly its
    * own partition instead of duplicating rows — the standard
    * batchId-keyed idempotence recipe for sinks without transactions. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, targetDir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(targetDir)

  /** foreachBatch sink: runs arbitrary BATCH logic per micro-batch —
    * the escape hatch for sinks Structured Streaming lacks natively
    * (JDBC upserts, multi-table writes). Exactly-once = source replay
    * (checkpoint) + the idempotent batch write above. */
  def foreachBatchSink(stream: DataFrame, targetDir: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatchIdempotent(b.toDF(), id, targetDir))
      .start()

  /** Streaming incremental near-dup detection: every micro-batch of
    * incoming documents is checked against the STATIC existing corpus
    * via [[graft.operators.Dedup.minHashCandidatesCross]] inside
    * foreachBatch — the idiom for running batch-only relational logic
    * in a stream while keeping checkpointed exactly-once sink
    * semantics (each batch's candidate pairs land in their own
    * batch_id partition). Per batch the join touches only shared
    * (band, key) signature buckets, never corpus x batch; at 100 TB
    * the corpus side's banded index is the thing to pre-compute and
    * persist, which the batch operator's shape already allows. */
  def incrementalNearDupSink(docs: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, targetDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatchIdempotent(
          graft.operators.Dedup.minHashCandidatesCross(
            b.toDF(), corpus, textCol, idCol),
          id, targetDir))
      .start()

  final case class CandidatePair(id1: Long, id2: Long)
  final case class BucketState(ids: List[Long])

  /** Stream-vs-STREAM near-dup candidates: the LSH index itself lives
    * in keyed state, so every arriving document is checked against the
    * ENTIRE corpus seen so far — not just a static snapshot
    * ([[incrementalNearDupSink]]'s regime). This is dedup-on-ingest
    * for a growing corpus: state is keyed by LSH bucket
    * (band, band-signature), each key holding the doc ids previously
    * hashed there; a new arrival emits a candidate pair per co-bucketed
    * prior member (and per same-batch member, in id order), then joins
    * the bucket.
    *
    * The MinHash signature here is computed SCAN-LOCALLY as pure array
    * expressions (array_min over the permuted shingle-hash array) —
    * bit-identical to [[graft.operators.Dedup.minHashSignature]]'s
    * explode+groupBy form (spec-pinned), but with no aggregation
    * before the stateful operator, which is what lets the whole thing
    * run as ONE flatMapGroupsWithState (Structured Streaming rejects
    * most stateful-after-stateful chains).
    *
    * Scale/state posture: state size is one id-list per OCCUPIED
    * bucket, sharded by group key across executors; `bucketCap` bounds
    * the pathological ubiquitous-bucket case (boilerplate text landing
    * 10^6 docs in one bucket would otherwise make that key's state —
    * and its per-arrival emit fan-out — unbounded). Beyond the cap a
    * bucket stops ACCUMULATING new members (arrivals still pair
    * against the capped membership), trading recall on degenerate
    * buckets for a hard state bound — the same df-cut compromise the
    * batch substring profiler makes. Pairs may repeat across bands
    * and batches (exactly like the batch self-join before its
    * distinct); downstream dedups. */
  def streamingNearDupCandidates(docs: DataFrame, textCol: String,
      idCol: String, k: Int = 8, bands: Int = 4, n: Int = 3,
      bucketCap: Int = 64): Dataset[CandidatePair] = {
    require(k % bands == 0, "bands must divide k")
    require(bucketCap > 1, "bucketCap must be > 1")
    import docs.sparkSession.implicits._
    import graft.operators.Dedup
    val rowsPerBand = k / bands
    val staged = docs
      .select(col(idCol).cast("long").as("id"), Dedup.words(col(textCol)).as("__ws"))
      .select(col("id"), Dedup.shinglesFromWords(col("__ws"), n).as("__s"))
      .select(col("id"), transform(col("__s"), g => Dedup.md5Hash32(g)).as("__hs"))
    val sigCols = Dedup.minHashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("__hs"), h => (h * a + b) % Dedup.MinHashPrime))
        .as(s"m$i")
    }
    val sig = staged.select(col("id") +: sigCols: _*)
    val bandKeys = (0 until bands).map { b =>
      concat_ws("-", lit(b) +: (0 until rowsPerBand)
        .map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }
    val buckets = sig
      .select(col("id"), explode(array(bandKeys: _*)).as("bucket"))
      .as[(Long, String)]
    buckets.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, String)],
            state: GroupState[BucketState]) => {
          val prior = state.getOption.map(_.ids).getOrElse(Nil)
          // id order within a batch: deterministic emission no matter
          // how the micro-batch's rows were partitioned upstream
          val arrivals = rows.map(_._1).toArray.sorted.distinct
          val out = Seq.newBuilder[CandidatePair]
          var members = prior
          arrivals.foreach { nid =>
            members.foreach { m =>
              if (m != nid)
                out += (if (m < nid) CandidatePair(m, nid)
                        else CandidatePair(nid, m))
            }
            if (members.size < bucketCap) members = nid :: members
          }
          state.update(BucketState(members))
          out.result().iterator
        })
  }

  final case class Proposal(cve_id: String, package_name: String, proposed: String)
  final case class KeyedState(cve_id: String, package_name: String, status: String,
      transitions: Long, blocked: Long)

  /** Streaming advisory FSM: proposals fold through the batch FSM's
    * exact transition semantics, keyed by (cve, package). Invalid or
    * terminal-blocked proposals leave the state and bump `blocked`. */
  def streamingFsm(proposals: Dataset[Proposal]): Dataset[KeyedState] = {
    import proposals.sparkSession.implicits._
    proposals.groupByKey(p => (p.cve_id, p.package_name))
      .mapGroupsWithState[KeyedState, KeyedState](
        GroupStateTimeout.NoTimeout()) {
        case ((cve, pkg), rows, state) =>
          var s = state.getOption.getOrElse(KeyedState(cve, pkg, "unknown", 0L, 0L))
          rows.foreach { p =>
            // null proposal = "no state change proposed" (the batch
            // UDFs' exact null rule, applyTransitionUdf) — without the
            // guard applyTransition NPEs on the executor and the
            // checkpoint replays the same poison row forever
            if (p.proposed != null) {
              val r = graft.statemachine.StateMachine.applyTransition(s.status, p.proposed)
              s =
                if (r.success && r.newState != s.status)
                  s.copy(status = r.newState, transitions = s.transitions + 1)
                else if (!r.success) s.copy(blocked = s.blocked + 1)
                else s
            }
          }
          state.update(s)
          s
      }
  }
}
