package graft.tools

import graft.operators.{IncrementalAnn, Similarity}
import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The cell-split growth rehearsal: a standing IVF index grows 10x by
  * progressive ingest, and between decades the only maintenance is
  * [[IncrementalAnn.splitOversized]] — NO centroid retrain, NO index
  * rebuild. The CONTROL is the pre-r12 answer to the same growth: a
  * FULL REBUILD per step (re-assign + re-commit the whole
  * ingested-so-far corpus against fresh centroids at the SAME cell
  * count the split path reached, so recall compares apples to
  * apples). Per step, for split-grown vs rebuilt:
  *   - recall@10 against the exact brute-force answer over the
  *     ingested-so-far corpus — the claim is PARITY: splits track the
  *     rebuilt layout's recall without paying the rebuild;
  *   - maintenance seconds — split_s must track the touched cells
  *     (slice-sized) while rebuild_s grows with the corpus;
  *   - search seconds (warm best-of-3) and probed files fetched vs
  *     total.
  *
  * Usage: runMain graft.tools.AnnSplitScale <embeddingsDir> [steps]
  * [rebalance] (slices by vec_id modulo; dir holds
  * embeddings.parquet). With the `rebalance` flag the maintained arm
  * runs [[IncrementalAnn.rebalance]] after each split pass (seeded on
  * the split cells, neighbor expansion 3) — the r12 answer to the
  * measured past-5x recall sag of splits alone (a split can divide a
  * region but never move mass between sibling subtrees; rebalance
  * re-homes the drifted vectors around each split site). Prints one
  * JSON line per step. */
object AnnSplitScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnSplitScale <embeddingsDir> [steps]")
    val dir = args(0)
    val steps = args.lift(1).map(_.toInt).getOrElse(10)
    val doRebalance = args.lift(2).contains("rebalance")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val nProbe = 8
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = vecs.count()
    val queries = vecs.filter(col("vec_id") % 997 === 3).limit(16)
      .localCheckpoint(true)

    // centroids sized for the FIRST slice (sqrt of N/steps) and never
    // retrained — growth is absorbed by splits alone
    val cells0 = Similarity.autoCells(n / steps)
    var centroids = vecs.filter(col("vec_id") < cells0)
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("centroid"))
      .localCheckpoint(true)
    // the per-cell budget that triggers splits, per CURRENT corpus
    // size: ~2*sqrt(N) rows per cell keeps the steady-state cell
    // count tracking the FAISS sqrt-N rule (autoCells) as the corpus
    // grows. A FIXED budget is the measured mistake (first r12 run):
    // it drives cells linear in N, and at fixed nProbe the probed
    // mass fraction collapses — recall sagged to 0.61 vs the rebuild
    // control's 0.86 by 6x growth. With the sqrt budget both layouts
    // hold the same cell-count regime and recall compares like for
    // like.
    def cellBudget(nCur: Long): Long =
      math.max(64L, 2L * math.round(math.sqrt(nCur.toDouble)))

    val split = java.nio.file.Files
      .createTempDirectory("graft-splitscale-s").toString

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def recallAndCost(idx: String, cents: DataFrame,
        ingested: DataFrame): (Double, Double, Int, Int) = {
      val brute = Similarity.bruteForceTopK(ingested, queries,
        "vec_id", "embedding", k = k).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (plan, probes) = IncrementalAnn.topKLazy(spark, idx, cents,
        queries, "vec_id", "embedding", k, nProbe, smallIndexFiles = 0)
      val marker = new java.io.File(idx).getName
      val fetched = plan.inputFiles.count(_.contains(marker))
      val approx = plan.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      probes.unpersist(false)
      val total = SnapshotUpsert.currentFileCount(spark, idx).get
      val rec = if (brute.isEmpty) 1.0
        else approx.intersect(brute).size.toDouble / brute.size
      val secs = Timing.best3(() => IncrementalAnn.topK(spark, idx, cents,
        queries, "vec_id", "embedding", k = k, nProbe = nProbe,
        smallIndexFiles = 0))
      (rec, secs, fetched, total)
    }

    var ingestedSoFar: DataFrame = null
    for (step <- 1 to steps) {
      val slice = vecs.filter(col("vec_id") % steps === (step - 1))
      ingestedSoFar =
        if (ingestedSoFar == null) slice
        else ingestedSoFar.unionByName(slice)
      ingestedSoFar = ingestedSoFar.localCheckpoint(true)
      val ingS = timed {
        IncrementalAnn.ingest(slice, split, centroids, "vec_id",
          "embedding", nBuckets = cells0, keepVersions = 2)
      }
      var splits = 0
      var moved = 0L
      var rebS = 0.0
      // split and rebalance timed SEPARATELY (nesting the rebalance
      // block inside the split timer double-counted reb_s in split_s
      // — caught in review after the r12 decade run; that run's
      // recorded split_s therefore includes reb_s)
      var splitIds: Seq[Long] = Seq.empty
      val splitS = timed {
        val before = centroids.count()
        val (cents, ids) = IncrementalAnn.splitOversizedWithIds(
          spark, split, centroids, cellBudget((n / steps) * step),
          "vec_id", "embedding", maxCells = 256, keepVersions = 2)
        centroids = cents.localCheckpoint(true)
        splits = (centroids.count() - before).toInt
        splitIds = ids
      }
      if (doRebalance) rebS = timed {
        moved = IncrementalAnn.rebalance(spark, split, centroids,
          splitIds, "vec_id", "embedding", neighbors = 3,
          keepVersions = 2)
      }
      val cellsNow = centroids.count().toInt
      // the control: full rebuild at the SAME cell count — fresh
      // deterministic centroids, whole ingested-so-far corpus
      // re-assigned and re-committed (what retiring the rebuild saves)
      val ctrl = java.nio.file.Files
        .createTempDirectory("graft-splitscale-c").toString
      val ctrlCentroids = vecs.filter(col("vec_id") < cellsNow)
        .select(col("vec_id").as("cell"),
          col("embedding").cast("array<double>").as("centroid"))
        .localCheckpoint(true)
      val rebuildS = timed {
        IncrementalAnn.ingest(ingestedSoFar, ctrl, ctrlCentroids,
          "vec_id", "embedding", nBuckets = cellsNow, keepVersions = 2)
      }
      val (recS, secS, fS, tS) = recallAndCost(split, centroids,
        ingestedSoFar)
      val (recC, secC, fC, tC) = recallAndCost(ctrl, ctrlCentroids,
        ingestedSoFar)
      System.err.println(f"[split-scale] step=$step vecs=${(n / steps) * step} " +
        f"cells=$cellsNow splits=$splits split_s=$splitS%.1f " +
        f"moved=$moved reb_s=$rebS%.1f rebuild_s=$rebuildS%.1f " +
        f"split(rec=$recS%.3f s=$secS%.2f files=$fS/$tS) " +
        f"rebuilt(rec=$recC%.3f s=$secC%.2f files=$fC/$tC)")
      println(s"""{"metric":"ann_split_scale","step":$step,""" +
        s""""vecs":${(n / steps) * step},"cells":$cellsNow,""" +
        f""""splits":$splits,"split_s":$splitS%.2f,""" +
        s""""rebalanced":$moved,""" + f""""rebalance_s":$rebS%.2f,""" +
        f""""rebuild_s":$rebuildS%.2f,"ingest_s":$ingS%.2f,""" +
        f""""recall_split":$recS%.4f,"search_split_s":$secS%.2f,""" +
        s""""files_split":"$fS/$tS",""" +
        f""""recall_rebuilt":$recC%.4f,"search_rebuilt_s":$secC%.2f,""" +
        s""""files_rebuilt":"$fC/$tC"}""")
    }
    spark.stop()
  }
}
