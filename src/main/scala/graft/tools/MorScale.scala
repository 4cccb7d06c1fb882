package graft.tools

import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-scale rehearsal for MERGE-ON-READ delta commits — the claim that
  * ingest cost tracks the BATCH, not the buckets it lands in. The CoW
  * commit's pruned regime (UpsertScale) already bounds a merge by its
  * touched buckets; at a production bucket size (hundreds of MB each)
  * that is still a massive rewrite for a trickle batch. This tool
  * seeds two identical latest-state tables from the events history,
  * then times the SAME trickle batch committed copy-on-write vs as a
  * delta layer, the read-side fold price as layers stack, and the
  * compaction that retires them.
  *
  * Env: SPARK_GRAFT_SF_DIR. Args: [nBuckets] [batchKeys] [layers]
  * Prints one JSON line with seed/commit/read/compact seconds.
  */
object MorScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val nBuckets = args.headOption.map(_.toInt).getOrElse(256)
    val batchKeys = args.lift(1).map(_.toInt).getOrElse(1000)
    val layers = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-mor-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val image = graft.queries.QueryDef.loadEvents(spark, sfDir)
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
        .as("top"))
      .select(col("user_id"), col("top.event_type").as("event_type"),
        col("top.ts").as("ts"))
      .localCheckpoint(true)
    val nKeys = image.count()

    val cow = java.nio.file.Files.createTempDirectory("graft-mor-cow").toString
    val mor = java.nio.file.Files.createTempDirectory("graft-mor-mor").toString

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val seedS = timed {
      SnapshotUpsert.upsertBatchSnapshot(image, cow, Seq("user_id"), "ts",
        nBuckets)
    }
    SnapshotUpsert.upsertBatchSnapshot(image, mor, Seq("user_id"), "ts",
      nBuckets)

    // the trickle batch: batchKeys random existing keys bumped — at
    // batchKeys >= nBuckets this touches essentially EVERY bucket, the
    // CoW worst case and the MOR design case
    def batch(i: Int): DataFrame = image
      .where(pmod(xxhash64(col("user_id"), lit(i)), lit(1000000)) <
        lit(1000000L * batchKeys / math.max(nKeys, 1L)))
      .withColumn("ts", col("ts") + expr(s"INTERVAL ${i + 1} SECOND"))
      .localCheckpoint(true)

    val b0 = batch(0)
    val touched = b0.select(graft.streaming.UpsertSink
        .bucketOf(Seq("user_id"), nBuckets).as("kb")).distinct().count()
    val cowS = timed {
      SnapshotUpsert.upsertBatchSnapshot(b0, cow, Seq("user_id"), "ts",
        nBuckets)
    }
    val morS = timed {
      SnapshotUpsert.appendDeltaSnapshot(b0, mor, Seq("user_id"), "ts",
        nBuckets)
    }

    // stack layers, then price the fold and its retirement
    val stackS = timed {
      (1 until layers).foreach(i =>
        SnapshotUpsert.appendDeltaSnapshot(batch(i), mor, Seq("user_id"),
          "ts", nBuckets))
    }
    def readAll(dir: String): Double = timed {
      SnapshotUpsert.readSnapshot(spark, dir)
        .agg(count(lit(1)), max(col("ts"))).collect()
    }
    val readCowS = readAll(cow)
    val readLayeredS = readAll(mor)
    val compactS = timed { SnapshotUpsert.compactDeltas(spark, mor) }
    val readCompactedS = readAll(mor)

    println(
      s"""{"tool":"mor_scale","sf_dir":"$sfDir","n_keys":$nKeys,""" +
      s""""n_buckets":$nBuckets,"batch_keys":$batchKeys,""" +
      s""""touched_buckets":$touched,"layers":$layers,""" +
      f""""seed_s":$seedS%.2f,"cow_batch_s":$cowS%.2f,""" +
      f""""delta_batch_s":$morS%.2f,"stack_s":$stackS%.2f,""" +
      f""""read_cow_s":$readCowS%.2f,"read_layered_s":$readLayeredS%.2f,""" +
      f""""compact_s":$compactS%.2f,"read_compacted_s":$readCompactedS%.2f}""")
    spark.stop()
  }
}
