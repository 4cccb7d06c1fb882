package graft.tools

import graft.operators.IncrementalMv
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade rehearsal for the incremental MV claim: refresh cost tracks
  * the CHANGED SLICE (feed buckets + touched groups), not the base —
  * while a from-scratch GROUP BY grows linearly with the corpus.
  *
  * Shape: a base table of N rows keyed (grp, id), BUCKETED BY grp (so
  * the refreshByGroups recompute can point-read the touched groups'
  * buckets), `nGroups` groups. Each decade seeds the base, bootstraps
  * two MVs (delta: count+sum+nn; groups: count/min/max/distinct), then
  * commits one production-shaped slice — updates concentrated in
  * `hotGroups` groups, inserts into fresh groups, deletes from one
  * group — and times each refresh against the full recompute. Both MV
  * contents are asserted equal to the recompute before any number is
  * reported (a fast wrong refresh is not a result).
  *
  * Args: [rows...] (default 100000 1000000 10000000). Env: none — the
  * base is synthetic (deterministic columns of a sequence; testdata
  * documents top out far below the decades this must cover). Prints
  * one JSON line per decade.
  */
object MvScale {

  def main(args: Array[String]): Unit = {
    val decades =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(100000L, 1000000L, 10000000L)
    val nGroups = 4096
    val hotGroups = 32
    val sliceRows = 20000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-mv-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    /** Deterministic synthetic rows over [lo, hi): grp spread via a
      * multiplicative scramble so group membership is not contiguous
      * in id (buckets hold a mix, like a real corpus). */
    def rows(lo: Long, hi: Long, grpOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        vShift: Long): DataFrame =
      spark.range(lo, hi, 1, 32)
        .select(grpOf(col("id")).as("grp"), col("id"),
          (pmod(col("id") * 2654435761L, lit(100003L)) + vShift).as("v"))

    def defaultGrp(id: org.apache.spark.sql.Column) =
      pmod(id * 1103515245L, lit(nGroups.toLong)).cast("int")

    decades.foreach { n =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft-mv-scale-$n").toString
      val base = s"$tmp/base"
      val mvD = s"$tmp/mv_delta"; val mvG = s"$tmp/mv_groups"
      // buckets sized to a ~constant rewrite unit (the deployment
      // contract splitOverfull maintains): with a FIXED bucket count
      // the per-bucket row count — and with it the feed diff and merge
      // amplification of a same-sized slice — would grow linearly with
      // the corpus, burying the slice-tracking claim under layout debt
      val nBuckets = math.max(64, (n / 16000L).toInt)
      def commit(b: DataFrame, del: Option[String] = None): Unit =
        SnapshotUpsert.upsertBatchSnapshot(b, base,
          keys = Seq("grp", "id"), orderCol = "", nBuckets = nBuckets,
          bucketCols = Seq("grp"), tombstoneCol = del)
      def foldDelta(): Unit = {
        IncrementalMv.refreshDelta(spark, base, mvD,
          baseKeys = Seq("grp", "id"), groupCols = Seq("grp"),
          sumCols = Seq("v"), nBuckets = 64); ()
      }
      val aggsG = Seq(count(lit(1)).as("n"), min("v").as("min_v"),
        max("v").as("max_v"), countDistinct(col("v")).as("d_v"))
      def foldGroups(): Unit = {
        IncrementalMv.refreshByGroups(spark, base, mvG,
          baseKeys = Seq("grp", "id"), groupCols = Seq("grp"),
          aggs = aggsG, nBuckets = 64); ()
      }

      val seedS = timed { commit(rows(0L, n, defaultGrp, 0L)) }
      val bootDeltaS = timed { foldDelta() }
      val bootGroupsS = timed { foldGroups() }

      // the slice: updates concentrated in `hotGroups` groups (same
      // keys, new v), inserts into two FRESH groups, deletes from one
      // hot group — commit it, then time the two refreshes
      val hot = rows(0L, n, defaultGrp, 1000000L)
        .where(col("grp") < hotGroups)
        .limit(sliceRows.toInt)
      val fresh = rows(n, n + 1000L,
        id => (lit(nGroups) + pmod(id, lit(2L))).cast("int"), 0L)
      val dels = rows(0L, n, defaultGrp, 0L)
        .where(col("grp") === hotGroups) // untouched by the updates
        .limit(1000)
      val sliceS = timed {
        commit(hot.unionByName(fresh).withColumn("_d", lit(false))
          .unionByName(dels.withColumn("_d", lit(true))),
          del = Some("_d"))
      }
      val deltaS = timed { foldDelta() }
      val groupsS = timed { foldGroups() }

      // ground truth: from-scratch aggregates over the current base
      var full: DataFrame = null
      val recomputeS = timed {
        // eager localCheckpoint: the timing covers the base scan + agg,
        // and the truth collects below read the materialized result
        full = SnapshotUpsert.readSnapshot(spark, base)
          .groupBy("grp").agg(count(lit(1)).as("n"),
            sum("v").as("sum_v"), count(col("v")).as("nn_v"))
          .localCheckpoint(true)
      }
      val wantD = full.collect().map(_.toSeq).toSet
      val gotD = IncrementalMv.readMv(spark, mvD).collect()
        .map(_.toSeq).toSet
      require(gotD == wantD,
        s"delta MV diverged from recompute at n=$n " +
          s"(${gotD.size} vs ${wantD.size} rows)")
      val wantG = SnapshotUpsert.readSnapshot(spark, base)
        .groupBy("grp").agg(aggsG.head, aggsG.tail: _*)
        .collect().map(_.toSeq).toSet
      val gotG = IncrementalMv.readMv(spark, mvG).collect()
        .map(_.toSeq).toSet
      require(gotG == wantG,
        s"groups MV diverged from recompute at n=$n " +
          s"(${gotG.size} vs ${wantG.size} rows)")

      println(f"""{"rows":$n,"groups":${nGroups + 2},"nbuckets":$nBuckets,""" +
        f""""seed_s":$seedS%.2f,"boot_delta_s":$bootDeltaS%.2f,""" +
        f""""boot_groups_s":$bootGroupsS%.2f,"slice_commit_s":$sliceS%.2f,""" +
        f""""refresh_delta_s":$deltaS%.2f,"refresh_groups_s":$groupsS%.2f,""" +
        f""""full_recompute_s":$recomputeS%.2f,"exact":true}""")
    }
    spark.stop()
  }
}
