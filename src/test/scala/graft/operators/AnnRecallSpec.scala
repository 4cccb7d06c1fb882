package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall-QUALITY floors for the approximate-nearest-neighbor paths.
  *
  * The registered oracles (q_sim_topk_lsh / q_sim_topk_ivf) prove
  * output parity with a DuckDB run of the same algorithm — they catch
  * implementation drift but not a recall regression from a bad
  * hyperplane seed or centroid set (both engines would agree on the
  * same bad answer). This spec pins the approximate operators against
  * the BRUTE-FORCE ground truth on the embeddings fixture with fixed
  * seeds; everything here is deterministic, so the floors are exact
  * regression lines, not flaky statistical bounds. Measured values are
  * recorded in PERF.md (ANN recall section).
  *
  * The fixture is a hard case on purpose: 500 near-uniform vectors
  * have weak cosine margins at k=10, so single-table LSH caps out
  * around 0.64 even probing most buckets — which is WHY lshTopK grew
  * the `tables` knob (L independent hyperplane tables, miss
  * probability (1-p)^L). These floors would have caught that gap.
  */
class AnnRecallSpec extends SparkSpec {

  private val K = 10
  private val NQueries = 50

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < NQueries)

  /** (query, neighbor) ground-truth set from exact search. */
  private lazy val exact: Set[(Long, Long)] =
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def lshRecall(bits: Int, probes: Int, tables: Int): Double = {
    val got = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = K, bits = bits, probes = probes, tables = tables)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.intersect(got).size.toDouble / exact.size
  }

  private def ivfRecall(nCells: Int, nProbe: Int): Double = {
    val (assigned, centroids) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = nCells)
    val got = Similarity.ivfTopK(assigned, centroids, queries, "vec_id",
        "embedding", k = K, nProbe = nProbe)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.intersect(got).size.toDouble / exact.size
  }

  test("multi-table LSH (bits=4, tables=8, probes=4) recall@10 >= 0.80") {
    val recall = lshRecall(bits = 4, probes = 4, tables = 8)
    info(f"LSH recall@$K = $recall%.3f (measured 0.804; floor 0.80)")
    assert(recall >= 0.80, f"LSH recall@$K $recall%.3f below 0.80 floor")
  }

  test("LSH recall is monotone in tables (the multi-table amplifier works)") {
    val r1 = lshRecall(bits = 4, probes = 4, tables = 1)
    val r8 = lshRecall(bits = 4, probes = 4, tables = 8)
    info(f"LSH recall tables=1: $r1%.3f, tables=8: $r8%.3f")
    assert(r8 > r1 + 0.2,
      f"8 tables ($r8%.3f) must amplify recall well past 1 table ($r1%.3f)")
  }

  test("PQ+ADC (m=16, k=16, rerank=64) recall@10 >= 0.75; rerank budget amplifies") {
    def pqRecall(m: Int, rerank: Int): Double = {
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = m, k = 16)
      val got = Similarity.pqTopK(emb, cb, queries, "vec_id", "embedding",
          k = K, m = m, rerank = rerank)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    // the registered q_sim_topk_pq config
    val r = pqRecall(m = 16, rerank = 64)
    info(f"PQ recall@$K m=16 rerank=64: $r%.3f (measured 0.784; floor 0.75)")
    assert(r >= 0.75, f"PQ recall@$K $r%.3f below 0.75 floor")
    // coarse quantization (m=8) with a thin rerank budget must be the
    // weaker config — the knob ordering that makes m/rerank REAL knobs
    val weak = pqRecall(m = 8, rerank = 32)
    info(f"PQ recall@$K m=8 rerank=32: $weak%.3f (measured 0.378)")
    assert(r > weak + 0.2,
      f"finer subspaces + deeper rerank ($r%.3f) must beat coarse ($weak%.3f)")
  }

  test("Lloyd-trained PQ codebook lifts recall over the seeded init " +
      "at identical m/k/rerank budgets") {
    def recallWith(cb: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.pqTopK(emb, cb, queries, "vec_id", "embedding",
          k = K, m = 16, rerank = 64)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val seeded = recallWith(
      Similarity.pqCodebook(emb, "vec_id", "embedding", m = 16, k = 16))
    val it1 = recallWith(
      Similarity.pqCodebookTrained(emb, "vec_id", "embedding",
        m = 16, k = 16, iters = 1))
    val it2 = recallWith(
      Similarity.pqCodebookTrained(emb, "vec_id", "embedding",
        m = 16, k = 16, iters = 2))
    info(f"PQ recall@$K m=16 rerank=64: seeded $seeded%.3f, " +
      f"lloyd-1 $it1%.3f, lloyd-2 $it2%.3f")
    // measured: seeded 0.784, lloyd-1 0.846, lloyd-2 0.880 — training
    // must clearly beat the seeded init, and iterating must not regress
    assert(it2 >= 0.85, f"lloyd-2 recall $it2%.3f below 0.85 floor")
    assert(it2 > seeded + 0.05,
      f"training ($it2%.3f) must clearly beat the seeded init ($seeded%.3f)")
    assert(it2 >= it1 - 0.02, f"second iteration regressed: $it1%.3f -> $it2%.3f")
  }

  test("PQ codes honor the memory contract: m codes, each < k") {
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 16, k = 16)
    val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding", m = 16)
    val bad = codes.filter(size(col("codes")) =!= 16 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0, s"$bad vectors with malformed code arrays")
  }

  test("IVF-PQ (nCells=16, nProbe=8 = 50% of cells, m=16, rerank=128) recall@10 >= 0.70") {
    val (assigned, centroids) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 16)
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 16, k = 16)
    def recallAt(nProbe: Int): Double = {
      val got = Similarity.ivfPqTopK(assigned, centroids, cb, queries,
          "vec_id", "embedding", k = K, m = 16, nProbe = nProbe, rerank = 128)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r8 = recallAt(8)
    info(f"IVF-PQ recall@$K nProbe=8/16: $r8%.3f (measured 0.744; floor 0.70)")
    assert(r8 >= 0.70, f"IVF-PQ recall@$K $r8%.3f below 0.70 floor")
    // probing every cell recovers flat-PQ: cell pruning is the ONLY
    // recall knob the composition adds on top of q_sim_topk_pq's config
    val r16 = recallAt(16)
    info(f"IVF-PQ recall@$K nProbe=16/16: $r16%.3f (= flat PQ)")
    assert(r16 >= r8, "probing more cells must not lose recall")
  }

  test("residual IVF-PQ (nCells=16, nProbe=8, m=16, rerank=128): recall floor, " +
      "and residual encoding does not lose to raw at identical budgets") {
    val (assigned, centroids) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 16)
    val res = Similarity.ivfPqResidualTopK(assigned, centroids, queries,
        "vec_id", "embedding", k = K, m = 16, kCodes = 16, nProbe = 8,
        rerank = 128)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rRes = exact.intersect(res).size.toDouble / exact.size
    val cbRaw = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 16, k = 16)
    val raw = Similarity.ivfPqTopK(assigned, centroids, cbRaw, queries,
        "vec_id", "embedding", k = K, m = 16, nProbe = 8, rerank = 128)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rRaw = exact.intersect(raw).size.toDouble / exact.size
    info(f"IVF-PQ recall@$K nProbe=8/16: residual $rRes%.3f vs raw $rRaw%.3f")
    assert(rRes >= 0.70, f"residual IVF-PQ recall@$K $rRes%.3f below 0.70 floor")
    assert(rRes >= rRaw - 0.02,
      f"residual codes ($rRes%.3f) must not lose to raw codes ($rRaw%.3f)")
    // the fully-trained composition (residual + Lloyd) — the complete
    // IndexIVFPQ — must clearly beat the seeded residual book
    val trained = Similarity.ivfPqResidualTopK(assigned, centroids, queries,
        "vec_id", "embedding", k = K, m = 16, kCodes = 16, nProbe = 8,
        rerank = 128, trainIters = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rTrained = exact.intersect(trained).size.toDouble / exact.size
    info(f"IVF-PQ recall@$K nProbe=8/16 residual+lloyd-2: $rTrained%.3f")
    assert(rTrained > rRes,
      f"training the residual book ($rTrained%.3f) must beat seeded ($rRes%.3f)")
  }

  test("registered q_sim_topk_ivfpq_trained config (autoCells, 50% probe, " +
      "residual + lloyd-2) holds the recall floor and beats the seeded config") {
    // mirrors the REGISTERED composition exactly: fixed first-N
    // centroids (oracle parity), nCells = autoCells(N), nProbe = 50%
    def registered(trainIters: Int): Set[(Long, Long)] = {
      val nCells = Similarity.autoCells(emb.count())
      val nProbe = (nCells + 1) / 2
      val cents = emb.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"),
          col("embedding").cast("array<double>").as("centroid"))
      val assigned = Similarity.assignCells(emb, cents, "vec_id", "embedding")
      Similarity.ivfPqResidualTopK(assigned, cents, queries, "vec_id",
          "embedding", k = K, m = 16, kCodes = 16, nProbe = nProbe,
          rerank = 128, trainIters = trainIters)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val trained = registered(2)
    val seeded = registered(0)
    val rTrained = exact.intersect(trained).size.toDouble / exact.size
    val rSeeded = exact.intersect(seeded).size.toDouble / exact.size
    info(f"registered IVF-PQ recall@$K: trained $rTrained%.3f vs seeded $rSeeded%.3f")
    assert(rTrained >= 0.75,
      f"deployed trained config recall $rTrained%.3f below 0.75 floor")
    assert(rTrained >= rSeeded - 0.02,
      f"trained ($rTrained%.3f) must not lose to seeded ($rSeeded%.3f)")
  }

  test("IVF (nCells=8) recall@10: >= 0.70 at nProbe=4, >= 0.85 at nProbe=6") {
    val r4 = ivfRecall(nCells = 8, nProbe = 4)
    val r6 = ivfRecall(nCells = 8, nProbe = 6)
    info(f"IVF recall@$K nProbe=4: $r4%.3f (measured 0.754; floor 0.70), " +
      f"nProbe=6: $r6%.3f (measured 0.900; floor 0.85)")
    assert(r4 >= 0.70, f"IVF nProbe=4 recall $r4%.3f below 0.70 floor")
    assert(r6 >= 0.85, f"IVF nProbe=6 recall $r6%.3f below 0.85 floor")
    assert(r6 > r4, "probing more cells must not lose recall")
  }
}
