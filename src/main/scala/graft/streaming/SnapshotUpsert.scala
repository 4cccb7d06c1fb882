package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import scala.collection.immutable.SortedMap

/** Snapshot-committed variant of [[UpsertSink]]: same keyed latest-state
  * merge (rule shared via [[UpsertSink.selectWinners]]), but each batch
  * commits by ATOMIC MANIFEST SWAP instead of dynamic partition
  * overwrite — the lakehouse table-format idea (immutable data files +
  * a versioned manifest), reduced to what a latest-state table needs.
  *
  * Why: the overwrite commit has two honest caveats at 100 TB. Inside
  * the per-partition overwrite there is a delete-before-rename window
  * in which a bucket's prior rows exist nowhere durable (data loss on a
  * store without atomic rename), and a reader racing the rewrite can
  * see a torn snapshot (some buckets pre-batch, some post). Here data
  * files are IMMUTABLE — each merge writes its output to a fresh
  * `batches/v{N}` directory and never deletes a live file — and
  * the only mutation readers observe is one rename of a manifest file
  * listing exactly which files make up version N. Readers pin a
  * manifest and get a consistent point-in-time snapshot regardless of
  * concurrent commits; old versions stay readable (time travel) until
  * `keepVersions` ages them out.
  *
  * Layout under `targetDir`:
  *   - `batches/v{N}/kb={b}/part-*.parquet` — the buckets version N
  *     rewrote (untouched buckets are carried forward BY REFERENCE in
  *     the manifest, so incremental merges write only the touched
  *     slice, same cost shape as the overwrite sink's pruned regime)
  *   - `_manifests/v{N}.txt` — `#nbuckets=`/`#schema=` header lines
  *     (the version's layout and data schema, so rebucket and additive
  *     schema evolution commit atomically with their files) followed by
  *     `<bucket>\t<relative file path>` lines; the rename of this file
  *     IS the commit point
  *   - `_graft_buckets` — the shared nBuckets layout pin
  * Do NOT read `targetDir` with a bare `spark.read.parquet` — it would
  * mix every retained version; go through [[readSnapshot]] /
  * [[readVersion]], which read the manifest's file list.
  *
  * Crash contract (single writer, e.g. one streaming query): a crash
  * BEFORE the manifest rename leaves readers on the old version and the
  * replayed batch recomputes the same version number, deletes the
  * orphaned `batches/v{N}` directory and redoes it — convergent. A
  * crash AFTER the rename means the batch is durably applied and the
  * replay re-merges it idempotently as version N+1 with identical
  * logical content. There is no state in which a reader can observe a
  * half-committed batch, and no point where a live file is deleted
  * before its replacement is referenced — the two failure modes the
  * overwrite commit documents are gone, at the cost of a GC pass
  * (bounded by the dropped version's touched buckets, computed from
  * manifest diffs — never a full table listing).
  */
object SnapshotUpsert {

  private val ManifestDir = "_manifests"
  private val BatchesDir = "batches"

  /** A committed version: its bucket layout, its DATA schema (without
    * the `kb` layout column), and bucket -> relative file paths. Layout
    * and schema travel IN the manifest so a [[rebucket]] or an additive
    * schema evolution changes them and the file set in the same atomic
    * commit — a side marker could disagree with the file set after a
    * crash between two writes. Files written before an evolution lack
    * the newer columns; readers apply the version's recorded schema, so
    * those columns surface as NULL. */
  case class Snapshot(version: Long, nBuckets: Int,
      schema: org.apache.spark.sql.types.StructType,
      files: Map[Int, Seq[String]])

  private def manifestPath(root: Path, v: Long): Path =
    new Path(root, f"$ManifestDir/v$v%012d.txt")

  /** Committed versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, targetDir: String): Seq[Long] = {
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listVersions(fs, root)
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong
      }.toSeq.sorted
  }

  private def readManifest(fs: FileSystem, root: Path, v: Long): Snapshot = {
    val in = fs.open(manifestPath(root, v))
    val lines = try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    val headers = lines.takeWhile(_.startsWith("#"))
      .map { h => val Array(k, rest) = h.stripPrefix("#").split("=", 2); k -> rest }
      .toMap
    require(headers.contains("nbuckets") && headers.contains("schema"),
      s"malformed manifest v$v at $root: missing #nbuckets/#schema headers")
    val files = lines.dropWhile(_.startsWith("#")).filter(_.nonEmpty)
      .map { line =>
        val Array(b, rel) = line.split('\t')
        b.toInt -> rel
      }.groupBy(_._1).map { case (b, fs0) => b -> fs0.map(_._2).toSeq }
    Snapshot(v, headers("nbuckets").toInt,
      org.apache.spark.sql.types.StructType.fromDDL(headers("schema")), files)
  }

  /** Write-then-rename of a manifest file — THE commit point of every
    * snapshot operation. */
  private def commitManifest(fs: FileSystem, root: Path, version: Long,
      nBuckets: Int, schema: org.apache.spark.sql.types.StructType,
      files: Map[Int, Seq[String]]): Unit = {
    fs.mkdirs(new Path(root, ManifestDir))
    val tmp = new Path(root, s"$ManifestDir/.v$version.tmp")
    val out = fs.create(tmp, true)
    try {
      val body = (Iterator(s"#nbuckets=$nBuckets", s"#schema=${schema.toDDL}") ++
        SortedMap.from(files).iterator.flatMap { case (b, fs0) =>
          fs0.map(f => s"$b\t$f")
        }).mkString("\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    // best-effort lost-update guard (single-writer is the contract; a
    // local-FS rename would silently REPLACE a manifest another writer
    // committed for the same version number)
    val target = manifestPath(root, version)
    if (fs.exists(target))
      sys.error(s"snapshot upsert: manifest v$version already exists — " +
        "another writer committed concurrently (single-writer contract)")
    if (!fs.rename(tmp, target))
      sys.error(s"snapshot upsert: cannot commit manifest v$version")
  }

  /** Enumerate the bucket files a just-written version directory holds
    * (authoritative for the manifest entry). */
  private def stagedFiles(fs: FileSystem, versionDir: Path,
      version: Long): Map[Int, Seq[String]] =
    fs.listStatus(versionDir).iterator
      .filter(_.getPath.getName.startsWith("kb="))
      .map { d =>
        val b = d.getPath.getName.stripPrefix("kb=").toInt
        b -> fs.listStatus(d.getPath).iterator.map(_.getPath.getName)
          .filter(_.endsWith(".parquet"))
          .map(n => s"$BatchesDir/v$version/kb=$b/$n").toSeq
      }.toMap

  /** Fresh (crash-reclaimed) version directory for the next commit. */
  private def nextVersionDir(fs: FileSystem, root: Path,
      version: Long): Path = {
    val dir = new Path(root, s"$BatchesDir/v$version")
    // a leftover directory is a crashed predecessor's orphan (its
    // manifest never committed, so nothing references it): redo cleanly
    if (fs.exists(dir)) fs.delete(dir, true)
    dir
  }

  private def currentSnapshot(fs: FileSystem, root: Path): Option[Snapshot] =
    listVersions(fs, root).lastOption.map(readManifest(fs, root, _))

  /** Deep-nullable normalization: recorded schemas must admit the
    * NULLs that pre-evolution files produce for appended columns, and
    * the manifest DDL round-trip loses container nullability anyway
    * (ARRAY<BIGINT> containsNull=false comes back true from fromDDL) —
    * so schemas are normalized before recording AND before comparing,
    * or a same-typed batch would be refused as "type changed" forever
    * after its first commit. */
  private def nullableTop(s: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(
      s.fields.map(f => f.copy(dataType = deepNullable(f.dataType),
        nullable = true)))

  private def deepNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case a: ArrayType =>
        a.copy(elementType = deepNullable(a.elementType), containsNull = true)
      case m: MapType => m.copy(keyType = deepNullable(m.keyType),
        valueType = deepNullable(m.valueType), valueContainsNull = true)
      case s: StructType => nullableTop(s)
      case other => other
    }
  }

  /** Merge one batch of row versions as a new committed version. Same
    * semantics as [[UpsertSink.upsertBatch]]; see object doc for the
    * commit difference. `keepVersions` >= 2 controls how many committed
    * versions stay readable (older files are garbage-collected); the
    * minimum is 2 because a reader pinned to the CURRENT version must
    * survive the next commit's GC — retention of 1 would let that GC
    * delete files out from under an in-flight scan, re-introducing the
    * torn-read race this commit protocol exists to remove. */
  def upsertBatchSnapshot(batch: DataFrame, targetDir: String,
      keys: Seq[String], orderCol: String, nBuckets: Int = 64,
      keepVersions: Int = 2): Unit = {
    require(keepVersions >= 2,
      "keepVersions must be >= 2: the next commit's GC must not delete " +
        "files a reader pinned to the current version may still be scanning")
    val spark = batch.sparkSession
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentSnapshot(fs, root)
    cur match {
      case Some(c) =>
        // the CURRENT manifest's header is the layout authority (it
        // changes atomically with the file set on rebucket; the side
        // marker can lag a crash-interrupted refresh)
        require(c.nBuckets == nBuckets,
          s"upsert: table at $root is laid out with nBuckets=${c.nBuckets}; " +
            s"merging with nBuckets=$nBuckets would strand rows in stale " +
            "buckets (use rebucket to change the layout)")
      case None =>
        UpsertSink.pinLayout(fs, root, nBuckets)
    }
    // ADDITIVE schema evolution: a batch must carry every existing
    // data column with its recorded type (rows are FULL upserts — a
    // partial row would silently null a column the table has values
    // for) and may APPEND new columns, which read back as NULL on
    // pre-evolution rows. The evolved schema commits atomically in the
    // same manifest as the files that introduce it.
    val dataSchema: org.apache.spark.sql.types.StructType = cur match {
      case Some(c) =>
        // name matching is case-INSENSITIVE like Spark's default
        // resolution: a case-variant name must be refused here with a
        // clear message, not appended as a duplicate that later dies
        // in analysis with "Found duplicate column(s)"
        c.schema.fields.foreach { f =>
          val b = batch.schema.fields
            .find(_.name.equalsIgnoreCase(f.name)).getOrElse(
              sys.error(s"upsert: batch is missing existing column " +
                s"'${f.name}' — rows are full upserts; additive evolution " +
                "only appends columns"))
          require(b.name == f.name,
            s"upsert: batch column '${b.name}' differs only by case from " +
              s"existing column '${f.name}'")
          require(deepNullable(b.dataType) == deepNullable(f.dataType),
            s"upsert: column '${f.name}' type changed " +
              s"${f.dataType.simpleString} -> ${b.dataType.simpleString}; " +
              "type changes are not supported")
        }
        val known = c.schema.fieldNames.map(_.toLowerCase).toSet
        nullableTop(org.apache.spark.sql.types.StructType(
          c.schema.fields ++ batch.schema.fields.filterNot(f =>
            known(f.name.toLowerCase))))
      case None => nullableTop(batch.schema)
    }
    UpsertSink.withPreparedBatch(batch, keys, nBuckets,
      populatedTable = cur.exists(_.files.nonEmpty)) { withBucket =>
      commitVersion(withBucket, root, fs, cur, dataSchema, keys, orderCol,
        nBuckets, keepVersions)
    }
  }

  /** Rewrite the table into a new bucket layout as one committed
    * version — the growth path when the table has outgrown the bucket
    * count it was created with (each bucket should stay a comfortable
    * single-file rewrite unit). Every row is re-hashed and every bucket
    * staged fresh, so the commit is table-sized (like a seed), atomic
    * (layout and files swap together in the manifest), and old versions
    * remain time-travel-readable in their own layout.
    *
    * rebucket IS a writer: the single-writer contract covers it, so
    * STOP the table's streaming sink (or pause its trigger) before
    * rebucketing — run concurrently, both compute the same next version
    * number, and rebucket would reclaim the in-flight merge's staging
    * directory as a crash orphan. The manifest commit refuses to
    * replace an existing version as a best-effort backstop. */
  def rebucket(spark: SparkSession, targetDir: String, newBuckets: Int,
      keys: Seq[String], keepVersions: Int = 2): Unit = {
    require(newBuckets > 0, s"rebucket: newBuckets must be > 0, got $newBuckets")
    require(keepVersions >= 2, "keepVersions must be >= 2")
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentSnapshot(fs, root).getOrElse(
      sys.error(s"rebucket: no committed version at $targetDir"))
    val version = cur.version + 1
    val versionDir = nextVersionDir(fs, root, version)
    val allPaths = cur.files.valuesIterator.flatten
      .map(rel => s"$root/$rel").toSeq
    // read under the recorded schema: files from before a schema
    // evolution lack the newer columns (null-filled here)
    spark.read.schema(cur.schema).parquet(allPaths: _*)
      .withColumn("kb", UpsertSink.bucketOf(keys, newBuckets))
      .repartition(newBuckets min 4096, col("kb"))
      .write.partitionBy("kb").parquet(versionDir.toString)
    // nothing is carried: the new layout's manifest is exactly the
    // staged set, and the header flips the layout in the same commit
    val staged = stagedFiles(fs, versionDir, version)
    commitManifest(fs, root, version, newBuckets, cur.schema, staged)
    gc(fs, root, version, staged, Some(cur), keepVersions)
    // best-effort marker refresh for humans; the manifest header is
    // what merges validate against
    UpsertSink.refreshLayoutMarker(fs, root, newBuckets)
  }

  private def commitVersion(withBucket: DataFrame, root: Path,
      fs: FileSystem, cur: Option[Snapshot],
      dataSchema: org.apache.spark.sql.types.StructType, keys: Seq[String],
      orderCol: String, nBuckets: Int, keepVersions: Int): Unit = {
    val spark = withBucket.sparkSession
    val dataCols = dataSchema.fieldNames.toSeq
    val populated: Set[Int] = cur.map(_.files.keySet).getOrElse(Set.empty)
    val touched = withBucket.select("kb").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return

    // existing rows of the touched buckets, by explicit manifest paths
    // (structural pruning: no directory discovery at all), read under
    // the EVOLVED schema (pre-evolution files simply lack the newer
    // columns, which parquet surfaces as NULL); kb is not stored in
    // the files (partitionBy strips it) but is a pure function of the
    // keys, so re-derive it
    val toRead = touched.filter(populated)
      .flatMap(b => cur.get.files(b)).map(rel => s"$root/$rel")
    val existing =
      if (toRead.nonEmpty)
        spark.read.schema(dataSchema).parquet(toRead: _*)
          .withColumn("kb", UpsertSink.bucketOf(keys, nBuckets))
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          withBucket.schema)

    val version = cur.map(_.version + 1).getOrElse(1L)
    val versionDir = nextVersionDir(fs, root, version)

    // one clustered file per touched bucket, written to an immutable
    // fresh directory — no live path is read and overwritten, so no
    // lineage truncation is needed and the merge is evaluated ONCE
    UpsertSink.selectWinners(existing, withBucket, dataCols, keys, orderCol)
      .repartition(touched.length, col("kb"))
      .write.partitionBy("kb").parquet(versionDir.toString)

    // staged buckets from the job's committed output (authoritative:
    // with the single-evaluation rule this equals `touched` on a
    // populated table, and on a first write it covers every row)
    val staged = stagedFiles(fs, versionDir, version)
    val carried = cur.map(_.files).getOrElse(Map.empty)
      .filterNot { case (b, _) => staged.contains(b) }
    val manifest = carried ++ staged
    commitManifest(fs, root, version, nBuckets, dataSchema, manifest)
    gc(fs, root, version, manifest, cur, keepVersions)
  }

  /** Drop manifests older than the retention window and delete the
    * files only they referenced. Everything is computed from manifest
    * CONTENTS — cost is bounded by the dropped versions' touched
    * buckets, never by a table listing. One directory listing; the
    * previous snapshot is reused from memory, so a steady-state
    * keepVersions=2 commit reads no manifest at all here. */
  private def gc(fs: FileSystem, root: Path, version: Long,
      newManifest: Map[Int, Seq[String]], prev: Option[Snapshot],
      keepVersions: Int): Unit = {
    val oldest = version - keepVersions + 1
    val all = listVersions(fs, root)
    val dropped = all.filter(_ < oldest)
    if (dropped.isEmpty) return
    val kept: Set[String] =
      (all.filter(_ >= oldest).filter(_ != version)
        .flatMap { v =>
          val m = prev.filter(_.version == v).getOrElse(readManifest(fs, root, v))
          m.files.valuesIterator.flatten
        }
        ++ newManifest.valuesIterator.flatten.toSeq).toSet
    dropped.foreach { d =>
      val stale = readManifest(fs, root, d).files.valuesIterator.flatten
        .filterNot(kept).toSeq
      stale.foreach(rel => fs.delete(new Path(root, rel), false))
      // drop now-empty bucket/version directories the stale files lived in
      stale.map(rel => new Path(root, rel).getParent).distinct.foreach { d =>
        if (fs.exists(d) && fs.listStatus(d).forall(
            _.getPath.getName.startsWith("_")))
          fs.delete(d, true)
        val vdir = d.getParent
        if (fs.exists(vdir) && fs.listStatus(vdir).forall(
            _.getPath.getName.startsWith("_")))
          fs.delete(vdir, true)
      }
      fs.delete(manifestPath(root, d), false)
    }
  }

  /** The table as of a committed `version` — a consistent point-in-time
    * snapshot (time travel within the retention window). */
  def readVersion(spark: SparkSession, targetDir: String,
      version: Long): DataFrame = {
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = readManifest(fs, root, version)
    val paths = snap.files.valuesIterator.flatten.map(rel => s"$root/$rel").toSeq
    // the version's RECORDED schema: pre-evolution files lack newer
    // columns (read as NULL), and each version keeps its own schema
    spark.read.schema(snap.schema).parquet(paths: _*)
  }

  /** Current table state (same contract as [[UpsertSink.readLatest]]). */
  def readSnapshot(spark: SparkSession, targetDir: String): DataFrame = {
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentSnapshot(fs, root).getOrElse(
      sys.error(s"snapshot upsert: no committed version at $targetDir"))
    readVersion(spark, targetDir, cur.version)
  }

  /** Row-level changes between two committed versions — the CHANGE
    * FEED an incremental downstream consumer replays instead of
    * re-reading the table. Output: the data columns of the
    * `toVersion` image plus `_change` ("insert" for keys absent at
    * `fromVersion`, "update" for keys whose row differs). The
    * latest-state merge never removes a key, so there are no deletes.
    *
    * Scale shape: the manifest diff identifies exactly the buckets any
    * intervening merge rewrote, so both sides read ONLY those buckets'
    * files — cost is bounded by the changed slice, never the table.
    * A bucket rewrite re-writes co-located rows whose keys did not
    * change, so rows are compared exactly (null-safe struct equality)
    * and unchanged rows are filtered out. */
  def changesBetween(spark: SparkSession, targetDir: String,
      fromVersion: Long, toVersion: Long, keys: Seq[String]): DataFrame = {
    require(fromVersion < toVersion,
      s"changesBetween needs fromVersion < toVersion ($fromVersion, $toVersion)")
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val from = readManifest(fs, root, fromVersion)
    val to = readManifest(fs, root, toVersion)
    // bucket numbers are comparable ONLY within one layout: across a
    // rebucket the same number holds different key sets (and a bucket
    // empty under the new layout would HIDE the old file sharing its
    // number), so a cross-layout diff reads both images whole
    val sameLayout = from.nBuckets == to.nBuckets
    val changedBuckets: Seq[Int] =
      if (sameLayout) to.files.collect {
        case (b, files) if !from.files.get(b).contains(files) => b
      }.toSeq
      else to.files.keySet.toSeq
    def paths(m: Snapshot, buckets: Seq[Int]): Seq[String] = buckets
      .filter(m.files.contains).flatMap(m.files).map(rel => s"$root/$rel")
    if (changedBuckets.isEmpty) {
      // identical manifests: empty feed with the table's schema (one
      // footer read — the only case that needs a sample)
      return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], to.schema)
        .withColumn("_change", lit(""))
    }
    // both sides read under the NEWER version's schema (schemas only
    // grow, so to.schema covers from; a column added between the two
    // versions reads as NULL on the old side — a row whose only change
    // is a now-populated new column correctly reports as an update)
    val newSide = spark.read.schema(to.schema)
      .parquet(paths(to, changedBuckets): _*)
    val oldPaths = paths(from,
      if (sameLayout) changedBuckets else from.files.keySet.toSeq)
    val oldSide =
      if (oldPaths.nonEmpty) spark.read.schema(to.schema).parquet(oldPaths: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], to.schema)
    diffImages(newSide, oldSide, keys)
  }

  /** The change-feed diff over two table IMAGES — the expression logic
    * [[changesBetween]] applies to its manifest-pruned reads, exposed
    * for use on arbitrary DataFrames (and oracle-gated as
    * `q_change_feed`): rows of `newImage` whose key is absent from
    * `oldImage` ("insert") or whose row differs ("update"); unchanged
    * rows are dropped by exact null-safe struct comparison. Keys match
    * null-SAFELY: the merge groups null keys like any other value
    * (bucketOf hashes them, the window partitions them), so the feed
    * must match them too or a null-keyed row would be re-reported as a
    * spurious insert on every diff that rewrites its bucket. */
  def diffImages(newImage: DataFrame, oldImage: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dataCols = newImage.columns.toSeq
    val old = oldImage.select(
      keys.map(k => col(k).as(s"__old_$k")) :+
        struct(dataCols.map(col): _*).as("__old"): _*)
    val joinCond = keys.map(k => col(k) <=> col(s"__old_$k")).reduce(_ && _)
    newImage.join(old, joinCond, "left")
      .where(col("__old").isNull ||
        !(struct(dataCols.map(col): _*) <=> col("__old")))
      .withColumn("_change",
        when(col("__old").isNull, "insert").otherwise("update"))
      .select((dataCols :+ "_change").map(col): _*)
  }

  /** Continuous snapshot-committed upsert under the streaming
    * checkpoint's replay guarantee (mirror of [[UpsertSink.upsertSink]]). */
  def sink(stream: DataFrame, targetDir: String, checkpoint: String,
      keys: Seq[String], orderCol: String, nBuckets: Int = 64,
      keepVersions: Int = 2, drainOnce: Boolean = false,
      outputMode: String = "append"): StreamingQuery =
    UpsertSink.startForeachBatch(stream, checkpoint, outputMode, drainOnce)(
      b => upsertBatchSnapshot(b, targetDir, keys, orderCol, nBuckets,
        keepVersions))
}
