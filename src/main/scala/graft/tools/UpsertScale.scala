package graft.tools

import graft.streaming.{SnapshotUpsert, UpsertSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-scale rehearsal for the upsert sink's PRUNED regime — the claim
  * that per-batch merge cost tracks the BATCH (touched buckets), not
  * the table. StreamBench's drain measures the worst case (every batch
  * spans all keys -> all buckets rewritten); this tool measures the
  * intended CDC-shaped case: seed the latest-state table from the full
  * events history at a production-shaped bucket count, then time small
  * update batches whose keys touch only a sliver of the buckets.
  *
  * Env: SPARK_GRAFT_SF_DIR. Args: [nBuckets] [smallKeys] [broadKeys]
  * [mode: overwrite|snapshot] — `snapshot` routes the same merges
  * through [[SnapshotUpsert]]'s manifest commit for a like-for-like
  * comparison of the two commit paths. Prints one JSON line: seed
  * build seconds, small/broad batch merge seconds and their
  * touched-bucket counts.
  */
object UpsertScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val nBuckets = args.headOption.map(_.toInt).getOrElse(4096)
    val smallKeys = args.lift(1).map(_.toInt).getOrElse(100)
    val broadKeys = args.lift(2).map(_.toInt).getOrElse(100000)
    // `chain` = snapshot merges PLUS a cursor-drained downstream
    // consumer after each: the full incremental DAG shape (table ->
    // change feed -> downstream table) whose cost must track the
    // slice, not the table
    // `stream` = chain's DAG with the downstream maintained by the
    // r11 STREAMING SOURCE over the change feed (graft-changes,
    // AvailableNow drains) instead of the batch cursor loop
    // `merge` = snapshot's seed, then the small/broad batches applied
    // through mergeInto (updateAll + insert — MERGE's whole-row shape)
    // instead of the upsert rule: pins that the conditional-DML path
    // keeps the slice-tracking cost shape at a production bucket count
    // `sqlrel` = snapshot's seed + merges, then a point-lookup
    // comparison: the bespoke readKeys probe vs the SAME lookup
    // through the SQL relation's automatic file skipping (WHERE
    // user_id IN (...)) — pins that the no-special-API read path
    // keeps the pruned-serve cost at a production bucket count
    // `bloom` = seed a latest-state table carrying event_id (HIGH-
    // cardinality, NOT the bucket column), declare it in
    // BloomColsProp, then measure (a) the commit-time overhead of
    // building the sidecars vs the identical seed without them and
    // (b) a point probe on event_id: files opened (equalityKept) and
    // wall time vs the same probe with the bloom tier disabled
    val mode = args.lift(3).getOrElse("overwrite")
    require(
      Seq("overwrite", "snapshot", "chain", "stream", "merge", "sqlrel",
        "bloom").contains(mode),
      s"bad mode $mode")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-upsert-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.queries.QueryDef.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))

    val target = java.nio.file.Files
      .createTempDirectory("graft-upsert-scale").toString

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    if (mode == "bloom") {
      val img = graft.queries.QueryDef.loadEvents(spark, sfDir)
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("top"))
        .select(col("user_id"), col("top.event_id").as("event_id"),
          col("top.event_type").as("event_type"), col("top.ts").as("ts"))
        .localCheckpoint(true)
      val tableRows = img.count()
      // size each file's bloom to ~4x its expected key count
      val ndv = math.max(1024L, 4L * tableRows / nBuckets)
      val seedSecs = timed {
        SnapshotUpsert.upsertBatchSnapshot(img, target, Seq("user_id"),
          "ts", nBuckets, keepVersions = 8,
          props = Map(SnapshotUpsert.BloomColsProp -> "event_id",
            SnapshotUpsert.BloomNdvProp -> ndv.toString))
      }
      val plain = java.nio.file.Files
        .createTempDirectory("graft-upsert-scale-nb").toString
      val seedPlainSecs = timed {
        SnapshotUpsert.upsertBatchSnapshot(img, plain, Seq("user_id"),
          "ts", nBuckets, keepVersions = 8)
      }
      val probes = img.select("event_id").limit(5).collect()
        .map(_.getLong(0)).toSeq
      val (kept, total) = graft.streaming.SnapshotRelation
        .equalityKept(spark, target, "event_id", probes)
      def best(f: => Long): Double =
        (1 to 3).map(_ => { val t0 = System.nanoTime(); val n = f
          require(n > 0); (System.nanoTime() - t0) / 1e9 }).min
      val pruned = best {
        graft.streaming.SnapshotRelation.readSql(spark, target)
          .where(col("event_id").isin(probes: _*)).count()
      }
      val full = {
        System.setProperty("graft.bloom.maxProbeFiles", "0")
        try best {
          graft.streaming.SnapshotRelation.readSql(spark, target)
            .where(col("event_id").isin(probes: _*)).count()
        } finally System.clearProperty("graft.bloom.maxProbeFiles")
      }
      System.err.println(f"[upsert-scale] bloom: table=$tableRows " +
        f"seed=$seedSecs%.1fs (plain $seedPlainSecs%.1fs) " +
        f"probe opens $kept of $total files, " +
        f"pruned=$pruned%.2fs full=$full%.2fs")
      println(s"""{"metric":"bloom_scale","sf":"$sfDir",""" +
        s""""n_buckets":$nBuckets,"table_rows":$tableRows,""" +
        f""""seed_secs":$seedSecs%.1f,"seed_plain_secs":$seedPlainSecs%.1f,""" +
        s""""probe_keys":${probes.size},"files_opened":$kept,""" +
        s""""files_total":$total,""" +
        f""""probe_secs":$pruned%.2f,"noprune_secs":$full%.2f}""")
      spark.stop()
      return
    }

    var seeded = false
    def merge(batch: DataFrame): Unit = {
      if (mode == "merge" && seeded)
        SnapshotUpsert.mergeInto(batch, target, Seq("user_id"),
          updateAll = true, keepVersions = 8)
      else if (mode != "overwrite")
        // retain every version so the change feed can be timed across
        // both the small and the broad merge below
        SnapshotUpsert.upsertBatchSnapshot(batch, target, Seq("user_id"),
          "ts", nBuckets, keepVersions = 8)
      else
        UpsertSink.upsertBatch(batch, target, Seq("user_id"), "ts", nBuckets)
      seeded = true
    }

    def readTable(): DataFrame =
      if (mode != "overwrite") SnapshotUpsert.readSnapshot(spark, target)
      else UpsertSink.readLatest(spark, target)

    // chain mode: a downstream latest-state table maintained ONLY from
    // cursor-drained feed slices (bootstrap = the whole image once,
    // then each drain applies the changed slice)
    val downstream = java.nio.file.Files
      .createTempDirectory("graft-upsert-downstream").toString
    val cursorFile = s"${java.nio.file.Files
      .createTempDirectory("graft-upsert-cursor")}/consumer.cursor"
    val chainSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val streamCkpt = java.nio.file.Files
      .createTempDirectory("graft-upsert-streamckpt").toString
    def drainApply(label: String): Unit = mode match {
      case "chain" =>
        val s = timed {
          SnapshotUpsert.drainChanges(spark, target, cursorFile,
              Seq("user_id")).foreach { slice =>
            UpsertSink.upsertBatch(slice.changes.drop("_change"), downstream,
              Seq("user_id"), "ts", nBuckets)
            slice.commitCursor()
          }
        }
        System.err.println(f"[upsert-scale] chain drain+apply $label=$s%.1fs")
        chainSecs += label -> s
      case "stream" =>
        // one AvailableNow run of the change-feed SOURCE: processes the
        // pending version range as micro-batches, then stops — the
        // scheduled-drain deployment shape, with the engine checkpoint
        // (not a cursor file) tracking the consumed versions
        val s = timed {
          val q = SnapshotUpsert.readChangeStream(spark, target,
              Seq("user_id"), emitDeletes = false)
            .writeStream
            .option("checkpointLocation", streamCkpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              UpsertSink.upsertBatch(b.drop("_change"), downstream,
                Seq("user_id"), "ts", nBuckets)
              ()
            }.start()
          q.awaitTermination()
        }
        System.err.println(
          f"[upsert-scale] stream drain+apply $label=$s%.1fs")
        chainSecs += label -> s
      case _ => ()
    }

    // seed: the full history folds to per-user latest (worst case — one
    // batch touching every bucket)
    val seedSecs = timed { merge(events) }
    val tableRows = readTable().count()
    drainApply("bootstrap")

    // update batch: `k` users re-stated one hour later than their
    // current latest — the CDC shape
    def updateBatch(k: Int): DataFrame = events
      .groupBy("user_id").agg(max("ts").as("ts"))
      .limit(k)
      .select(col("user_id"), lit("updated").as("event_type"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("ts"))

    def touched(df: DataFrame): Long = df
      .select(UpsertSink.bucketOf(Seq("user_id"), nBuckets)).distinct().count()

    val small = updateBatch(smallKeys).localCheckpoint(true)
    val smallTouched = touched(small)
    val smallSecs = timed { merge(small) }
    drainApply("small")

    val broad = updateBatch(broadKeys).localCheckpoint(true)
    val broadTouched = touched(broad)
    val broadSecs = timed { merge(broad) }
    drainApply("broad")

    // chain mode: the downstream table, built ONLY from feed slices,
    // must equal the source table exactly (count + row checksum)
    if (mode == "chain" || mode == "stream") {
      def sig(df: DataFrame): (Long, Any) = {
        val r = df.select(count(lit(1)),
          sum(xxhash64(col("user_id"), col("event_type"), col("ts"))
            .cast("decimal(38,0)"))).head()
        (r.getLong(0), r.get(1))
      }
      val (srcN, srcH) = sig(readTable())
      val (dstN, dstH) = sig(UpsertSink.readLatest(spark, downstream))
      require(srcN == dstN && srcH == dstH,
        s"chained consumer diverged: source=($srcN,$srcH) downstream=($dstN,$dstH)")
      System.err.println(s"[upsert-scale] $mode downstream EXACT match " +
        s"($dstN rows, checksum $dstH)")
    }

    // snapshot mode: time the change feed across the small (CDC-shaped,
    // bounded by the changed buckets) and broad (worst-case, every
    // bucket changed) merges
    val feedSecs = if (mode == "snapshot") {
      def feed(from: Long, to: Long): (Long, Double) = {
        var n = 0L
        val s = timed {
          n = SnapshotUpsert.changesBetween(spark, target, from, to,
            Seq("user_id")).count()
        }
        (n, s)
      }
      val (smallN, smallFeed) = feed(1L, 2L)
      val (broadN, broadFeed) = feed(2L, 3L)
      // layout growth: double the bucket count (a table-sized rewrite,
      // committed atomically like any version)
      val rebucketSecs = timed {
        SnapshotUpsert.rebucket(spark, target, nBuckets * 2, Seq("user_id"),
          keepVersions = 8)
      }
      System.err.println(f"[upsert-scale] change feed " +
        f"small(rows=$smallN)=$smallFeed%.1fs broad(rows=$broadN)=$broadFeed%.1fs " +
        f"rebucket(${nBuckets * 2})=$rebucketSecs%.1fs")
      Some((smallFeed, broadFeed, rebucketSecs))
    } else None

    // sqlrel mode: the same 100-key point lookup through (a) readKeys
    // (bespoke probe API) and (b) the SQL relation (plain WHERE ... IN,
    // manifest-planned file skipping). Fresh relation per pass so the
    // timing includes planning (manifest read + bucket-hash routing).
    val sqlRelSecs = if (mode == "sqlrel") {
      import spark.implicits._
      val probe = readTable().select("user_id").distinct()
        .limit(100).collect().map(_.getLong(0)).toSeq
      def best(f: => Long): Double =
        (1 to 3).map(_ => { val t0 = System.nanoTime(); val n = f
          require(n > 0); (System.nanoTime() - t0) / 1e9 }).min
      val viaKeys = best {
        SnapshotUpsert.readKeys(spark, target, probe.toDF("user_id"),
          Seq("user_id")).count()
      }
      val viaSql = best {
        graft.streaming.SnapshotRelation.readSql(spark, target)
          .where(col("user_id").isin(probe: _*)).count()
      }
      System.err.println(
        f"[upsert-scale] point lookup 100 keys: readKeys=$viaKeys%.2fs " +
          f"sqlRelation=$viaSql%.2fs")
      Some((viaKeys, viaSql))
    } else None

    System.err.println(f"[upsert-scale] mode=$mode table=$tableRows " +
      f"seed=$seedSecs%.1fs " +
      f"small($smallKeys keys, $smallTouched buckets)=$smallSecs%.1fs " +
      f"broad($broadKeys keys, $broadTouched buckets)=$broadSecs%.1fs")
    println(s"""{"metric":"upsert_scale","sf":"$sfDir","mode":"$mode",""" +
      s""""n_buckets":$nBuckets,""" +
      f""""table_rows":$tableRows,"seed_secs":$seedSecs%.1f,""" +
      s""""small_keys":$smallKeys,"small_touched":$smallTouched,""" +
      f""""small_secs":$smallSecs%.1f,""" +
      s""""broad_keys":$broadKeys,"broad_touched":$broadTouched,""" +
      f""""broad_secs":$broadSecs%.1f""" +
      feedSecs.map { case (s, b, r) =>
        f""","feed_small_secs":$s%.1f,"feed_broad_secs":$b%.1f,""" +
          f""""rebucket_secs":$r%.1f"""
      }.getOrElse("") +
      sqlRelSecs.map { case (k, q) =>
        f""","readkeys_secs":$k%.2f,"sqlrel_secs":$q%.2f"""
      }.getOrElse("") +
      (if (chainSecs.isEmpty) "}"
       else chainSecs.map { case (k, v) => f""""chain_${k}_secs":$v%.1f""" }
         .mkString(",", ",", "}")))
    spark.stop()
  }
}
