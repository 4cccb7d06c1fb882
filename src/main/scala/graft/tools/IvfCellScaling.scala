package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF cell-count scaling rehearsal: does nCells ~ sqrt(N) keep
  * per-query search work sub-linear as the corpus grows, where a fixed
  * cell count degrades to linear? (The r5 registered config pins
  * nCells=16 for oracle replayability; PERF.md called the sqrt rule
  * "the knob" — this executes it instead of arguing it.)
  *
  * For each corpus decade x {fixed 16 cells, autoCells(N)}, measures:
  *   - build_s: KMeans index build + assignment materialization;
  *   - cand/q: scored candidates per query (EXACT, deterministic, the
  *     box-load-immune scale metric — this is the number that must
  *     grow like nProbe*sqrt(N), not N);
  *   - search_s: wall-clock for the full top-k (warm, best of 3);
  *   - recall@10 vs exact brute force on the same 32 queries.
  *
  * Usage: runMain graft.tools.IvfCellScaling <dir1> [dir2 ...]
  * (each dir holds an embeddings.parquet; generate decades with
  *  ScaleUp docsOnly.)
  */
object IvfCellScaling {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfCellScaling <embeddingsDir>...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val nProbe = 8
    println(f"[ivfcells] ${"dir"}%-18s ${"N"}%9s ${"cells"}%6s ${"build_s"}%8s " +
      f"${"cand/q"}%10s ${"search_s"}%9s ${"recall@10"}%9s")
    for (dir <- args) {
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .localCheckpoint()
      val n = corpus.count()
      val queries = corpus.filter(col("vec_id") < 32)
      // exact ground truth once per corpus
      val truth = topKSet(Similarity.bruteForceTopK(
        corpus, queries, "vec_id", "embedding", k = k))
      for (cells <- Seq(16, Similarity.autoCells(n)).distinct) {
        val t0 = System.nanoTime()
        val (assigned0, centroids) =
          Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = cells)
        val assigned = assigned0.localCheckpoint() // write-once, probe-many
        val buildS = (System.nanoTime() - t0) / 1e9
        val candPerQ = Similarity.ivfScored(assigned, centroids, queries,
          "vec_id", "embedding", nProbe).count().toDouble / 32
        // GRAFT_IVF_PQ=1: search through the full residual IVF-PQ
        // composition instead of exact-cosine IVF — the question is
        // whether the sqrt(N) cell rule carries over to ADC search
        val pqMode = sys.env.get("GRAFT_IVF_PQ").contains("1")
        def search() =
          if (pqMode) Similarity.ivfPqResidualTopK(assigned, centroids,
            queries, "vec_id", "embedding", k = k, m = 16, kCodes = 16,
            nProbe = nProbe, rerank = 128)
          else Similarity.ivfTopK(assigned, centroids, queries,
            "vec_id", "embedding", k = k, nProbe = nProbe)
        search().count() // warm (plan + codegen)
        val searchS = (1 to 3).map { _ =>
          val s0 = System.nanoTime()
          search().count()
          (System.nanoTime() - s0) / 1e9
        }.min
        val got = topKSet(search())
        val recall = truth.toSeq.map { case (q, ids) =>
          got.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
        }.sum / truth.size
        println(f"[ivfcells] $dir%-18s $n%9d $cells%6d $buildS%8.1f " +
          f"$candPerQ%10.0f $searchS%9.2f $recall%9.3f")
      }
    }
    spark.stop()
  }

  private def topKSet(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }
}
