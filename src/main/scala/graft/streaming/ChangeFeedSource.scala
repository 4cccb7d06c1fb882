package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Structured Streaming SOURCE over a [[SnapshotUpsert]] table's change
  * feed — the consumption story the batch [[SnapshotUpsert.drainChanges]]
  * cursor only polls: a downstream job `readStream`s the table and
  * receives each commit's row-level changes as a micro-batch, with the
  * engine's checkpoint doing the version bookkeeping.
  *
  * Why the V1 `Source` API (not DataSource V2 `MicroBatchStream`): the
  * change feed of a version range is a manifest-pruned DIFF — a
  * distributed join between the two versions' changed buckets — and V1
  * `getBatch` returns a lazily-planned DataFrame, so the diff executes
  * as a normal Spark job reading only the changed buckets' files. A V2
  * `PartitionReader` would have to produce the rows itself (re-
  * implementing a parquet reader plus the diff), or the commit path
  * would have to materialize change files per version (extra write +
  * storage on every commit). Spark's own file stream source and the
  * open-source Delta Lake streaming source sit on the same V1 API for
  * the same reason.
  *
  * Offsets ARE table versions (`LongOffset(version)`); the batch
  * planner is [[SnapshotUpsert.changesBetween]], so a micro-batch
  * covering versions (a, b] reads ONLY the buckets those manifests
  * disagree on. Exactly-once per version offset: the engine checkpoints
  * offset ranges, and replaying a range re-plans the SAME immutable
  * files (a crashed micro-batch re-emits its exact slice). The engine
  * may COALESCE several commits into one micro-batch (image diff over
  * the whole range — idempotent for any keyed downstream, same contract
  * as drainChanges); `maxVersionsPerBatch` bounds that when slice-sized
  * batches matter.
  *
  * Options:
  *   - `path` (required) — the snapshot table directory
  *   - `keys` (required) — comma-separated key column names (the same
  *     keys every merge against the table states)
  *   - `emitDeletes` (default true) — emit `_change='delete'` rows
  *     carrying the deleted key's last known values
  *   - `emitBefore` (default false) — append `_before`, the key's row
  *     at the range start as one struct of the data columns (NULL on
  *     insert and on every bootstrap-image row) — what a delta
  *     consumer needs to RETRACT old contributions (the streaming
  *     face of `diffImages(emitBefore = true)`; see IncrementalMv)
  *   - `startingVersion` (default: bootstrap) — `"latest"` starts from
  *     the current version (changes only, no initial image); a number N
  *     starts the feed at versions > N; absent = BOOTSTRAP, the whole
  *     current image as one `_change='insert'` batch first (the
  *     [[SnapshotUpsert.drainChanges]] bootstrap shape)
  *   - `withCommitVersion` (default false) — append a `_commit_version`
  *     LONG column: the version whose commit produced the batch (the
  *     range END when commits were coalesced)
  *   - `maxVersionsPerBatch` (default unbounded) — cap how many
  *     versions one micro-batch may coalesce (enforced on every batch:
  *     the engine hands this source its checkpointed floor through the
  *     admission-control API)
  *   - `failOnDataLoss` (default true) — fail when a needed version
  *     range has aged out of retention; `false` skips to the oldest
  *     retained version (the lost gap's changes are NOT delivered)
  *
  * Schema: the table's CURRENT recorded schema at stream start, plus
  * `_change` (and optionally `_commit_version`). Columns appended by a
  * later schema evolution surface after a stream RESTART (the standard
  * streaming-source contract — a running query's schema is fixed).
  *
  * Retention: a stopped consumer must restart while its checkpointed
  * version is still retained — size `keepVersions`/`keepAgeMs` to the
  * consumer's worst-case downtime, exactly like the drainChanges
  * cursor. A consumer that lost the window fails loudly on restart
  * (the range's manifest is gone); delete its checkpoint to
  * re-bootstrap from the current image.
  */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      ChangeFeedSource.feedSchema(sqlContext.sparkSession, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val pinned = schema.getOrElse(
      ChangeFeedSource.feedSchema(sqlContext.sparkSession, parameters))
    new ChangeFeedSource(sqlContext.sparkSession, pinned, parameters)
  }
}

private[streaming] object ChangeFeedSource {

  def path(params: Map[String, String]): String =
    params.getOrElse("path", sys.error(
      "graft-changes: set option 'path' to the snapshot table directory"))

  def keys(params: Map[String, String]): Seq[String] = {
    val ks = params.getOrElse("keys", sys.error(
      "graft-changes: set option 'keys' to the table's comma-separated " +
        "key columns")).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(ks.nonEmpty, "graft-changes: option 'keys' is empty")
    ks
  }

  /** The stream's pinned schema: the table's current recorded data
    * schema + the feed metadata columns. Requires a committed version
    * (an uncreated table has no schema to pin — create it first or
    * pass an explicit schema). */
  def feedSchema(spark: SparkSession, params: Map[String, String])
      : StructType = {
    val dir = path(params)
    val (_, dataSchema) = SnapshotUpsert.currentVersionInfo(spark, dir)
      .getOrElse(sys.error(s"graft-changes: no committed version at $dir — " +
        "commit the table's first version before starting a stream over " +
        "its feed (or pass an explicit schema)"))
    val meta = StructField("_change", StringType, nullable = false) +:
      ((if (params.get("emitBefore").exists(_.toBoolean))
        Seq(StructField("_before", StructType(dataSchema.fields),
          nullable = true))
      else Seq.empty) ++
      (if (params.get("withCommitVersion").exists(_.toBoolean))
        Seq(StructField("_commit_version", LongType, nullable = false))
      else Seq.empty))
    StructType(dataSchema.fields ++ meta)
  }
}

private[streaming] class ChangeFeedSource(spark: SparkSession,
    pinned: StructType, params: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val targetDir = ChangeFeedSource.path(params)
  private val keys = ChangeFeedSource.keys(params)
  private val emitDeletes =
    params.get("emitDeletes").forall(_.toBoolean)
  private val emitBefore =
    params.get("emitBefore").exists(_.toBoolean)
  private val withCommitVersion =
    params.get("withCommitVersion").exists(_.toBoolean)
  private val failOnDataLoss =
    params.get("failOnDataLoss").forall(_.toBoolean)
  private val maxVersionsPerBatch: Long =
    params.get("maxVersionsPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
  require(maxVersionsPerBatch >= 1,
    "graft-changes: maxVersionsPerBatch must be >= 1")
  // the offset BEFORE the first version this stream serves; None =
  // bootstrap (serve the current image as inserts, then changes)
  private val startingVersion: Option[Long] =
    params.get("startingVersion").map {
      case "latest" =>
        SnapshotUpsert.currentVersionInfo(spark, targetDir).map(_._1)
          .getOrElse(0L)
      case n => n.toLong
    }
  keys.foreach(k => require(pinned.fieldNames.contains(k),
    s"graft-changes: key '$k' is not in the feed schema " +
      s"(${pinned.fieldNames.mkString(",")})"))

  override def schema: StructType = pinned

  private def versionOf(o: Offset): Long = o.json.trim.toLong

  /** Admission-controlled offset planning (the engine prefers this
    * over [[getOffset]] for sources implementing
    * SupportsAdmissionControl): `start` is the engine's own
    * checkpointed floor — a real one even on the first trigger after a
    * restart — so `maxVersionsPerBatch` caps EVERY batch without any
    * offset-regression risk. The bootstrap sentinel (-1, from
    * [[initialOffset]] with no startingVersion) plans the whole
    * current image uncapped (it is one image, not a version range).
    * Returns null when there is no new data. The saturating-add guard
    * matters: the unbounded default is Long.MaxValue and a plain
    * `floor + max` wraps negative. */
  override def latestOffset(start: org.apache.spark.sql.connector.read
      .streaming.Offset, limit: org.apache.spark.sql.connector.read
      .streaming.ReadLimit): org.apache.spark.sql.connector.read
      .streaming.Offset = {
    val curOpt = SnapshotUpsert.currentVersionInfo(spark, targetDir)
      .map(_._1)
    curOpt match {
      case None => null
      case Some(cur0) =>
        // Trigger.AvailableNow: never plan past the version snapshotted
        // at prepare time — the run must terminate
        val cur = availableNowCap.fold(cur0)(math.min(cur0, _))
        // the engine passes NULL start before any batch is planned
        // (initialOffset is not consulted on this path) — fall back to
        // the same initial floor
        val floor = Option(start).map(_.json.trim.toLong)
          .getOrElse(startingVersion.getOrElse(-1L))
        val end =
          if (floor < 0) cur // bootstrap image
          else if (floor > cur - maxVersionsPerBatch) cur
          else floor + maxVersionsPerBatch
        if (floor >= 0 && end <= floor) null else LongOffset(end)
    }
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    SnapshotUpsert.currentVersionInfo(spark, targetDir)
      .map(v => LongOffset(v._1)).orNull

  /** The offset BEFORE the first version this stream serves: the
    * configured startingVersion, or the -1 bootstrap sentinel (serve
    * the whole current image first). Only consulted by the engine as
    * [[latestOffset]]'s floor when no batch has been checkpointed. */
  override def initialOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    LongOffset(startingVersion.getOrElse(-1L))

  override def deserializeOffset(json: String)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    LongOffset(json.trim.toLong)

  @volatile private var availableNowCap: Option[Long] = None

  /** Trigger.AvailableNow support: snapshot the current version; this
    * run drains up to it (in `maxVersionsPerBatch` slices) and stops,
    * ignoring commits that land mid-drain. */
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      SnapshotUpsert.currentVersionInfo(spark, targetDir).map(_._1)

  /** Legacy V1 planning hook — engines with admission-control support
    * (this Spark) call [[latestOffset]] instead; kept correct for
    * completeness: newest committed version, uncapped. */
  override def getOffset: Option[Offset] =
    SnapshotUpsert.currentVersionInfo(spark, targetDir)
      .map(v => LongOffset(v._1))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    val effStart: Option[Long] = start.map(versionOf).orElse(startingVersion)
    def emptySlice = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(pinned.fields.filterNot(f => f.name == "_commit_version")))
    // a range whose manifests aged out of retention is UNSERVABLE: the
    // consumer was down longer than the retention window (the engine
    // also re-plans the last checkpointed range on every restart, so a
    // long-dead consumer hits this immediately on its first batch).
    // failOnDataLoss=true (default): fail loudly with the sizing
    // advice. false: skip to the oldest retained version — the changes
    // in the lost gap are NOT delivered (that is what the flag means).
    def lost(s: Long): DataFrame =
      if (failOnDataLoss)
        sys.error(s"graft-changes: version range ($s, $endV] of " +
          s"$targetDir is no longer retained — the consumer was down " +
          "longer than the table's retention window (size keepVersions/" +
          "keepAgeMs to the worst-case lag); delete the stream's " +
          "checkpoint to re-bootstrap from the current image, or set " +
          "failOnDataLoss=false to skip the lost range")
      else {
        val retained = SnapshotUpsert.versions(spark, targetDir)
        val oldest = retained.headOption.getOrElse(endV)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft-changes: skipping lost range ($s, " +
            s"${math.min(oldest, endV)}] of $targetDir (failOnDataLoss=" +
            "false); downstream state may be missing those changes")
        if (oldest >= endV) emptySlice
        else SnapshotUpsert.changesBetween(spark, targetDir, oldest, endV,
          keys, emitDeletes, emitBefore)
      }
    val slice = effStart match {
      case Some(s) if s >= endV =>
        // the engine never plans an empty range forward; this is the
        // restart probe of an already-current checkpoint
        emptySlice
      case Some(s) =>
        try SnapshotUpsert.changesBetween(spark, targetDir, s, endV, keys,
          emitDeletes, emitBefore)
        catch { case _: java.io.FileNotFoundException => lost(s) }
      case None =>
        // bootstrap: the whole image at endV as inserts — identical to
        // the drainChanges bootstrap slice
        try SnapshotUpsert.readVersion(spark, targetDir, endV)
          .withColumn("_change", lit("insert"))
        catch { case _: java.io.FileNotFoundException => lost(0L) }
    }
    val stamped =
      if (withCommitVersion) slice.withColumn("_commit_version", lit(endV))
      else slice
    // align to the pinned schema: columns appended by a post-start
    // schema evolution are dropped until the stream restarts (fixed
    // query schema — the standard streaming-source contract). The
    // REVERSE skew also happens: a restarted stream pins the EVOLVED
    // schema, then repositions over a pre-evolution version range
    // whose image lacks the new column — null-fill it, exactly the
    // NULL those rows read as in the table itself.
    val have = stamped.columns.map(_.toLowerCase).toSet
    val aligned = stamped.select(pinned.fields.toSeq.map { f =>
      if (!have(f.name.toLowerCase)) lit(null).cast(f.dataType).as(f.name)
      else if (emitBefore && f.name == "_before") {
        // the inner struct can skew against the pinned one exactly like
        // the top-level columns do (a restarted stream pins the evolved
        // schema, then repositions over a pre-evolution range) —
        // rebuild it field-by-field, null-filling what the range's
        // image lacks, NULL staying NULL for inserts. (Gated on
        // emitBefore: without the option, a data column that happens to
        // be named `_before` is just a column.)
        val want = f.dataType.asInstanceOf[StructType]
        val innerFields = stamped.schema(f.name).dataType
          .asInstanceOf[StructType].fieldNames
        if (innerFields.map(_.toLowerCase)
            .sameElements(want.fieldNames.map(_.toLowerCase))) col(f.name)
        else {
          val inner = innerFields.map(_.toLowerCase).toSet
          when(col(f.name).isNull, lit(null).cast(want))
            .otherwise(struct(want.fields.toSeq.map { g =>
              if (inner(g.name.toLowerCase)) col(s"${f.name}.${g.name}").as(g.name)
              else lit(null).cast(g.dataType).as(g.name)
            }: _*)).cast(want).as(f.name)
        }
      } else col(f.name)
    }: _*)
    StreamingShim.streamingDataFrame(spark,
      StreamingShim.toInternalRdd(aligned), pinned)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String =
    s"ChangeFeedSource[$targetDir, keys=(${keys.mkString(",")})]"
}
