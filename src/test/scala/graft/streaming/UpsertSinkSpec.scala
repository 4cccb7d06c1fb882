package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class UpsertSinkSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-upsert").toString

  private def latestSet(dir: String): Set[(Long, String, Long)] =
    UpsertSink.readLatest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  // (key, payload, version) rows
  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "status", "v")
  }

  test("upsertBatch: latest version per key wins; incoming beats existing on a tie") {
    val dir = tmp()
    UpsertSink.upsertBatch(df((1L, "new", 1L), (2L, "new", 1L)),
      dir, Seq("id"), "v", nBuckets = 8)
    // update key 1 at a HIGHER version, re-state key 2 at the SAME
    // version with different payload (the incoming row must win), add 3
    UpsertSink.upsertBatch(df((1L, "fixed", 2L), (2L, "revised", 1L), (3L, "new", 1L)),
      dir, Seq("id"), "v", nBuckets = 8)
    assert(latestSet(dir) ==
      Set((1L, "fixed", 2L), (2L, "revised", 1L), (3L, "new", 1L)))
    // a STALE version must not regress the row
    UpsertSink.upsertBatch(df((1L, "stale", 1L)), dir, Seq("id"), "v", nBuckets = 8)
    assert(latestSet(dir).contains((1L, "fixed", 2L)))
  }

  test("replaying a batch is idempotent (the exactly-once half the sink owns)") {
    val dir = tmp()
    UpsertSink.upsertBatch(df((1L, "a", 1L), (2L, "b", 1L)), dir, Seq("id"), "v")
    val b2 = df((1L, "a2", 2L), (3L, "c", 1L))
    UpsertSink.upsertBatch(b2, dir, Seq("id"), "v")
    val after = latestSet(dir)
    // crash-between-write-and-commit replay: same batch, same target
    UpsertSink.upsertBatch(b2, dir, Seq("id"), "v")
    assert(latestSet(dir) == after)
  }

  test("only the touched hash buckets are rewritten") {
    val dir = tmp()
    UpsertSink.upsertBatch(
      df((0L to 63L).map(i => (i, "seed", 1L)): _*), dir, Seq("id"), "v",
      nBuckets = 8)
    def filesByBucket(): Map[String, Set[String]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("kb=")).map { d =>
        d.getName -> d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
      }.toMap
    }
    val before = filesByBucket()
    assert(before.size == 8, s"expected all 8 buckets seeded: ${before.keySet}")
    // one key -> exactly one touched bucket
    UpsertSink.upsertBatch(df((5L, "upd", 2L)), dir, Seq("id"), "v", nBuckets = 8)
    val after = filesByBucket()
    val changed = after.keySet.filter(k => before(k) != after(k))
    val expected = df((5L, "x", 1L))
      .select(UpsertSink.bucketOf(Seq("id"), 8)).head().getInt(0)
    assert(changed == Set(s"kb=$expected"),
      s"expected only kb=$expected rewritten, got $changed")
    assert(latestSet(dir).contains((5L, "upd", 2L)))
  }

  test("streaming end-to-end: MemoryStream feed maintains the live table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmp()
    val ckpt = tmp()
    val input = MemoryStream[(Long, String, Long)]
    val q = UpsertSink.upsertSink(input.toDF().toDF("id", "status", "v"),
      dir, ckpt, Seq("id"), "v", nBuckets = 8)
    try {
      input.addData((1L, "new", 1L), (2L, "new", 1L))
      q.processAllAvailable()
      input.addData((1L, "fixed", 2L), (3L, "new", 1L))
      q.processAllAvailable()
      assert(latestSet(dir) ==
        Set((1L, "fixed", 2L), (2L, "new", 1L), (3L, "new", 1L)))
    } finally q.stop()
  }

  test("write clustering: every bucket holds exactly ONE file after any merge") {
    val dir = tmp()
    // repeated merges into the same buckets must not drift into a
    // small-files table: the overwrite replaces each touched bucket
    // with a single clustered file regardless of shuffle partitioning
    (1L to 5L).foreach { v =>
      UpsertSink.upsertBatch(df((5L, s"v$v", v), (100L + v, "other", 1L)),
        dir, Seq("id"), "v", nBuckets = 4)
    }
    val root = new java.io.File(dir)
    val filesPerBucket = root.listFiles().filter(_.getName.startsWith("kb="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    assert(filesPerBucket.nonEmpty && filesPerBucket.values.forall(_ == 1),
      s"one file per bucket expected: $filesPerBucket")
    assert(latestSet(dir) ==
      ((1L to 5L).map(v => (100L + v, "other", 1L)).toSet + ((5L, "v5", 5L))))
  }

  test("streaming FSM revisions flow through the sink into a live prod table") {
    // the reference's end state: a prod advisory table holding each
    // key's LATEST fsm state. streamingFsm emits per-key revisions in
    // update mode; `transitions` is non-decreasing per key, so it is
    // the upsert order column (ties - e.g. a blocked proposal - resolve
    // incoming-wins, which is the newer revision)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import EventStreams.Proposal
    val dir = tmp()
    val input = MemoryStream[Proposal]
    val q = UpsertSink.upsertSink(
      EventStreams.streamingFsm(input.toDS()).toDF(), dir, tmp(),
      Seq("cve_id", "package_name"), "transitions", nBuckets = 8,
      outputMode = "update")
    try {
      input.addData(Proposal("C1", "p", "pending_upstream"),
        Proposal("C2", "p", "bogus"))
      q.processAllAvailable()
      input.addData(Proposal("C1", "p", "fixed"),
        Proposal("C2", "p", "pending_upstream"))
      q.processAllAvailable()
      val live = UpsertSink.readLatest(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(live == Set(
        ("C1", "fixed", 2L, 0L), // unknown -> pending_upstream -> fixed
        ("C2", "pending_upstream", 1L, 1L))) // bogus blocked, then valid
    } finally q.stop()
  }

  test("a partially-committed batch is repaired by replaying it " +
      "(per-bucket pre/post mix converges)") {
    import java.nio.file.{Files => JFiles, Path => JPath, StandardCopyOption}
    def snapshot(dir: String): Map[String, Array[(String, Array[Byte])]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("kb="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> JFiles.readAllBytes(f.toPath))).toMap
    def restoreBucket(dir: String, kb: String,
        saved: Map[String, Array[(String, Array[Byte])]]): Unit = {
      val d = new java.io.File(dir, kb)
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
      saved(kb).foreach { case (name, bytes) =>
        JFiles.write(JPath.of(d.getPath, name), bytes)
      }
    }
    val dir = tmp()
    UpsertSink.upsertBatch(df((0L to 63L).map(i => (i, "seed", 1L)): _*),
      dir, Seq("id"), "v", nBuckets = 8)
    val pre = snapshot(dir)
    // two keys in DIFFERENT buckets so the batch commit spans buckets
    val keyBuckets = df((0L to 63L).map(i => (i, "x", 1L)): _*)
      .select(col("id"), UpsertSink.bucketOf(Seq("id"), 8).as("kb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq
    val Seq((k1, kb1), (k2, _)) = keyBuckets.distinctBy(_._2).take(2)
    val b2 = df((k1, "upd", 2L), (k2, "upd", 2L))
    UpsertSink.upsertBatch(b2, dir, Seq("id"), "v", nBuckets = 8)
    val healthy = latestSet(dir)
    // crash mid-commit: ONE touched bucket reverts to its pre-batch
    // content, the other kept the post-batch content (per-bucket
    // commit is a directory swap, so pre/post is the crash state
    // space); the checkpoint then replays the SAME batch
    restoreBucket(dir, s"kb=$kb1", pre)
    assert(latestSet(dir) != healthy, "the tear should be observable")
    UpsertSink.upsertBatch(b2, dir, Seq("id"), "v", nBuckets = 8)
    assert(latestSet(dir) == healthy, "replay must repair the partial commit")
  }

  test("real-data drive: sf0.001 events fold to per-user latest state, " +
      "incrementally equal to the one-shot merge") {
    // end-to-end on real testdata: the table maintained by two
    // incremental merges must equal the single-batch merge of the same
    // rows — the upsert's incrementality contract
    val all = graft.queries.QueryDef.loadEvents(spark, sf)
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_type"), col("ts"))
    val events = proj(all)
    val (first, second) = (proj(all.where(col("event_id") % 2 === 0)),
      proj(all.where(col("event_id") % 2 === 1)))
    val incDir = tmp()
    UpsertSink.upsertBatch(first, incDir, Seq("user_id"), "ts", nBuckets = 16)
    UpsertSink.upsertBatch(second, incDir, Seq("user_id"), "ts", nBuckets = 16)
    val oneDir = tmp()
    UpsertSink.upsertBatch(events, oneDir, Seq("user_id"), "ts", nBuckets = 16)
    val inc = UpsertSink.readLatest(spark, incDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2))).toMap
    val one = UpsertSink.readLatest(spark, oneDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2))).toMap
    assert(inc.nonEmpty && inc.size == one.size)
    // per-user latest TS must agree exactly (payload can differ only on
    // exact-ts ties, where batch split order legitimately decides)
    assert(inc == one, "incremental vs one-shot latest-ts mismatch")
  }

  test("reserved columns in the batch are rejected, not clobbered") {
    // __rn in particular would otherwise be silently REPLACED by the
    // merge's row_number and come out as all-1s in the table; __old and
    // _change are reserved so any upsert table stays change-feed-safe
    for (reserved <- Seq("kb", "__src", "__rn", "__old", "_change")) {
      val bad = df((1L, "a", 1L)).withColumn(reserved, lit(9))
      val e = intercept[IllegalArgumentException] {
        UpsertSink.upsertBatch(bad, tmp(), Seq("id"), "v", nBuckets = 8)
      }
      assert(e.getMessage.contains("reserved"), s"$reserved: ${e.getMessage}")
    }
  }

  test("merging with a different nBuckets than the table layout is refused") {
    // the bucket is a function of nBuckets: a mismatched merge would
    // leave each key's old row in a bucket it neither reads nor
    // overwrites — duplicate keys with NO error. The layout marker
    // written on first merge pins the count.
    val dir = tmp()
    UpsertSink.upsertBatch(df((1L, "a", 1L)), dir, Seq("id"), "v", nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      UpsertSink.upsertBatch(df((1L, "b", 2L)), dir, Seq("id"), "v", nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets=8"), e.getMessage)
    // same count still merges, and the marker is invisible to readers
    UpsertSink.upsertBatch(df((1L, "b", 2L)), dir, Seq("id"), "v", nBuckets = 8)
    assert(latestSet(dir) == Set((1L, "b", 2L)))
  }

  test("the input batch is evaluated exactly once when merging into a populated table") {
    // the merge runs two actions (touched-bucket collect + write); an
    // un-materialized batch would recompute its upstream per action —
    // 2x compute under foreachBatch, and for a non-deterministic batch
    // a second evaluation can emit rows into buckets absent from
    // `touched`, which the overwrite then replaces unread (data loss).
    // A FIRST write has no existing rows to lose, so the seed batch —
    // the one table-sized input — deliberately skips the snapshot.
    val acc = spark.sparkContext.longAccumulator("batch-evals")
    val counted = udf { (s: String) => acc.add(1L); s }.asNondeterministic()
    def counting(rows: (Long, String, Long)*) =
      df(rows: _*).withColumn("status", counted(col("status")))
    val dir = tmp()
    UpsertSink.upsertBatch(counting((10L, "seed", 1L)), dir, Seq("id"), "v",
      nBuckets = 8)
    val seedEvals = acc.value // lazy seed path: one eval per action
    acc.reset()
    UpsertSink.upsertBatch(
      counting((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      dir, Seq("id"), "v", nBuckets = 8)
    assert(acc.value == 3L,
      s"3-row incremental batch evaluated ${acc.value / 3.0}x " +
        s"(expected exactly once; seed path had used $seedEvals evals/row)")
    assert(latestSet(dir).size == 4)
  }

  test("the merge scan PRUNES to the touched buckets (partition filter, not a full read)") {
    val dir = tmp()
    UpsertSink.upsertBatch(
      df((0L to 63L).map(i => (i, "seed", 1L)): _*), dir, Seq("id"), "v",
      nBuckets = 8)
    // the read the merge performs: target filtered to one touched bucket
    val touched = df((5L, "x", 1L))
      .select(UpsertSink.bucketOf(Seq("id"), 8)).head().getInt(0)
    val scan = spark.read.parquet(dir).where(col("kb") === touched)
    val files = scan.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles.toInt
    }.sum
    val total = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("kb="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(files < total,
      s"partition pruning must cut the scan: $files of $total files")
  }
}
