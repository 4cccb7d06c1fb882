package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for [[Dedup.embeddingDecontaminate]], isolating the
  * two variables the registered oracle query conflates:
  *
  *   - EVAL SIZE: q_decontaminate_semantic's eval side is `vec_id %
  *     25 == 0`, which GROWS with the corpus — so the rehearsed decade
  *     sweep grows both join sides and the blocked pair space
  *     quadratically (measured 15x on the third decade). The operator
  *     contract is a FIXED benchmark suite; this tool holds eval at
  *     the sf0.1 set (80 vectors) while the corpus takes the decades.
  *   - BUCKET BITS: like IVF's nCells, the hyperplane count is the
  *     corpus-sized knob — the collision fraction is ~2^-bits per
  *     table, so bits should grow ~log2(corpus growth) to hold the
  *     per-eval-vector candidate count flat.
  *
  * Usage: runMain graft.tools.DecontamScaling <dir1> [dir2 ...]
  */
object DecontamScaling {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DecontamScaling <embeddingsDir>...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"[decontam] ${"dir"}%-18s ${"corpus"}%8s ${"bits"}%5s " +
      f"${"flagged"}%8s ${"wall_s"}%7s")
    for (dir <- args) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
      // FIXED eval suite: the sf0.1-range ids (80 vectors) at every scale
      val evalSet = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .localCheckpoint()
      // hold out ONLY the fixed 80-vector eval suite — the production
      // corpus shape of q_decontaminate_semantic (ids %25==0 at >= 2000
      // are corpus, not eval)
      val corpus = e.filter(col("vec_id") % 25 =!= 0 || col("vec_id") >= 2000)
      val n = corpus.count()
      for (bits <- Seq(4, 8)) {
        // warm pass, then best of 2 (quick-mode methodology)
        def run() = Dedup.embeddingDecontaminate(corpus, evalSet,
          "vec_id", "embedding", tau = 0.2, bits = bits, tables = 2).count()
        run()
        var flagged = 0L
        val wall = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          flagged = run()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[decontam] $dir%-18s $n%8d $bits%5d $flagged%8d $wall%7.2f")
      }
    }
    spark.stop()
  }
}
