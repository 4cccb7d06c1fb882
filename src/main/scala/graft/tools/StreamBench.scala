package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Streaming throughput rehearsal for the §2.9 surface: drains the
  * real events/documents tables through the registered stateful
  * operators as a rate-limited file stream (`maxFilesPerTrigger`
  * micro-batches under `Trigger.AvailableNow` — the scheduled-drain
  * deployment shape) against the `noop` sink, and reports rows,
  * wall seconds, micro-batch count, peak stateful-operator state rows
  * and max batch duration per operator as ONE JSON line.
  *
  * Watermark note: the synthetic tables are hash-laid-out, so a file
  * replay is time-RANDOM — a production-width watermark would mark
  * most of batches 2..N late and drop them at the first stateful
  * operator, measuring the drop path instead of the operator. The
  * rehearsal therefore runs with a watermark wider than the table's
  * full time range: every row exercises the stateful machinery and
  * state is bounded by KEY cardinality (hours x types, users,
  * dedup keys, LSH buckets), which is the quantity reported. Join
  * state expiry under ordered arrival is a semantics concern, covered
  * by StreamBatchEquivalenceSpec's ordered fixtures.
  *
  * Env: SPARK_GRAFT_SF_DIR (events side, needs a multi-file
  * events.parquet DIRECTORY — sf1+), SPARK_GRAFT_DOCS_DIR (near-dup
  * side, defaults to the events dir), SPARK_GRAFT_FILES_PER_TRIGGER.
  * Args: subset of {rollup, dedup, sessionize, attribution, neardup,
  * upsert, upsert-snapshot}.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val docsDir = sys.env.getOrElse("SPARK_GRAFT_DOCS_DIR", sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val perTrigger = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "2")
    // SPARK_GRAFT_STATE_STORE=rocksdb swaps the state backend: the
    // default HDFS-backed provider keeps every state row on-heap
    // (state is bounded by executor memory), RocksDB keeps it
    // off-heap/on-disk (state bounded by local disk — the 100 TB
    // posture for linearly-growing state like the LSH bucket index)
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      // metrics below sum over recentProgress, which retains only
      // this many batches — keep it above any plausible drain length
      // or rows/rate silently undercount on fine-grained triggers
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      // same legacy-nanos handling as QueryDef.loadEvents: some
      // testdata ships ts as parquet TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("graft-stream-bench")
    if (stateStore == "rocksdb") {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // wider than any table's time range: nothing is ever late
    val wm = "100000 hours"

    def fileStream(dir: String): DataFrame = {
      val schema = spark.read.parquet(dir).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", perTrigger).parquet(dir)
    }

    /** Same ts normalization as QueryDef.loadEvents, on a stream. */
    def eventsStream(): DataFrame = {
      val raw = fileStream(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    }

    val streams = Map[String, () => (DataFrame, String)](
      "rollup" -> (() =>
        (graft.streaming.EventStreams.hourlyRollup(eventsStream(), wm),
          "update")),
      "dedup" -> (() =>
        (graft.streaming.EventStreams.streamingDedup(
          eventsStream(), Seq("user_id", "event_type"), "ts", wm), "append")),
      "sessionize" -> (() =>
        (graft.streaming.EventStreams.sessionize(
          eventsStream().select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
            .as[graft.streaming.EventStreams.Event],
          watermark = wm).toDF(), "append")),
      "attribution" -> (() =>
        (graft.streaming.EventStreams.purchaseAttribution(
          eventsStream().where(col("event_type") === "purchase"),
          eventsStream().where(col("event_type") === "click"),
          watermark = wm), "append")),
      "neardup" -> (() =>
        (graft.streaming.EventStreams.streamingNearDupCandidates(
          fileStream(s"$docsDir/documents.parquet"), "text", "doc_id")
          .toDF(), "append")),
    )

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("rollup", "dedup", "sessionize", "attribution", "neardup",
        "upsert")

    val results = names.map { name =>
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-sb-$name").toString
      val t0 = System.nanoTime()
      val q = if (name == "upsert" || name == "upsert-snapshot") {
        // keyed latest-state table maintenance: per-user latest event,
        // merged incrementally with bucket-granular rewrites (state is
        // the TABLE, not the state store — peak_state reads 0);
        // `upsert-snapshot` drains the same feed through the
        // manifest-committed variant
        val target = java.nio.file.Files
          .createTempDirectory("graft-sb-upsert-table").toString
        val feed = eventsStream()
          .select(col("user_id"), col("event_type"), col("ts"))
        if (name == "upsert-snapshot")
          graft.streaming.SnapshotUpsert.sink(feed, target, ckpt,
            Seq("user_id"), "ts", nBuckets = 64, drainOnce = true)
        else
          graft.streaming.UpsertSink.upsertSink(feed, target, ckpt,
            Seq("user_id"), "ts", nBuckets = 64, drainOnce = true)
      } else {
        val (df, mode) = streams(name)()
        df.writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      val rows = progress.map(_.numInputRows).sum
      val state = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
      val maxBatch = progress.map(_.batchDuration).foldLeft(0L)(math.max)
      System.err.println(f"[stream-bench] $name%-12s rows=$rows%9d " +
        f"secs=$secs%7.1f rate=${rows / secs}%9.0f/s batches=${progress.size}%3d " +
        f"peak_state=${if (state.isEmpty) 0L else state.max}%9d " +
        f"max_batch_ms=$maxBatch%6d")
      name -> (rows, secs, progress.size,
        if (state.isEmpty) 0L else state.max, maxBatch)
    }

    val json = results.map { case (n, (rows, secs, batches, st, mb)) =>
      f""""$n":{"rows":$rows,"secs":$secs%.1f,"rows_per_sec":${rows / secs}%.0f,""" +
        s""""batches":$batches,"peak_state_rows":$st,"max_batch_ms":$mb}"""
    }.mkString(",")
    println(s"""{"metric":"stream_bench","sf":"$sfDir","docs":"$docsDir",""" +
      s""""files_per_trigger":$perTrigger,"queries":{$json}}""")
    // Unload every state-store provider BEFORE the session (and JVM)
    // tears down: with the RocksDB backend, a provider left loaded
    // keeps a native logger callback alive into JVM shutdown, where
    // rocksdbjni's LoggerJniCallback can SEGV after the last metrics
    // print — harmless to data but exit-code-polluting for automation.
    // StateStore.stop() closes the providers (and their native logs)
    // while the JVM is fully alive, making the exit deterministic.
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.stop()
  }
}
