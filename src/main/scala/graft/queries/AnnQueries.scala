package graft.queries

import graft.operators.{Dedup, Similarity, SkewJoin}
import org.apache.spark.sql.functions._

/** Scale-path ANN / dedup / skew operators promoted into the hard
  * correctness gate (round-1 verdict: these were spec-tested only).
  *
  * The LSH family is oracle-able because the random hyperplanes are a
  * deterministic function of (plane, dim) — [[Similarity.hyperplaneSignValue]]
  * emits the SAME signs as literal vectors into the DuckDB SQL, so both
  * engines bucket identically. The salted join is oracle-able because
  * salting is result-invariant: its output must equal the plain join.
  */
object AnnQueries {

  /** Testdata embedding dimensionality (TESTDATA.md). */
  private val Dims = 64

  private def signList(j: Int): String =
    (0 until Dims).map(i => Similarity.hyperplaneSignValue(j, i))
      .mkString("[", ", ", "]")

  /** DuckDB bucket id from `bits` signed projections of `vExpr` —
    * mirrors [[Similarity.lshBucket]] with the hyperplanes inlined.
    * `table` selects the independent hyperplane family (plane index
    * `table * bits + j`), exactly as the Spark operator does. */
  private def duckBucket(vExpr: String, bits: Int, table: Int = 0): String =
    (0 until bits).map { j =>
      s"(CASE WHEN list_dot_product($vExpr, ${signList(table * bits + j)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Left-associated squared-L2 over `dims`-element list expressions —
    * the identical float addition order as [[Similarity.l2sq]]'s
    * sequential fold, so both engines produce bit-identical doubles. */
  private def duckL2sq(a: String, b: String, dims: Int): String =
    (1 to dims).map(i => s"($a[$i] - $b[$i]) * ($a[$i] - $b[$i])")
      .mkString("(", " + ", ")")

  /** One Lloyd iteration over the PQ codebook `prev` -> `out`:
    * argmin re-assignment of every subvector (exact L2, ties to the
    * lowest code — ROW_NUMBER mirrors Spark's min(struct(d, code))),
    * then per-(sub, code, pos) exact micro-unit means rebuilt into
    * ordered centroid lists; codes that captured nothing keep their
    * previous centroid. Width-4 subvectors (64 dims / m=16). */
  private def duckLloydIter(prev: String, out: String, idx: Int): String =
    s"""a$idx AS (SELECT vec_id, sub, sv, code FROM (
       |  SELECT s.vec_id, s.sub, s.sv, $prev.code,
       |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
       |      ORDER BY ${duckL2sq("s.sv", s"$prev.c", 4)} ASC, $prev.code ASC) AS rn
       |  FROM csub s JOIN $prev ON s.sub = $prev.sub) WHERE rn = 1),
       |m$idx AS (SELECT sub, code, pos,
       |  CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
       |       ELSE -((-2 * s + n) // (2 * n)) END / 1e6 AS cv
       |  FROM (SELECT a$idx.sub, a$idx.code, p.pos,
       |    CAST(sum(CAST(round(sv[p.pos] * 1e6) AS BIGINT)) AS BIGINT) AS s,
       |    count(*) AS n
       |    FROM a$idx CROSS JOIN (SELECT unnest(range(1, 5)) AS pos) p
       |    GROUP BY 1, 2, 3)),
       |n$idx AS (SELECT sub, code, list(cv ORDER BY pos) AS newc
       |  FROM m$idx GROUP BY sub, code),
       |$out AS (SELECT $prev.sub, $prev.code,
       |  coalesce(n$idx.newc, $prev.c) AS c
       |  FROM $prev LEFT JOIN n$idx
       |    ON n$idx.sub = $prev.sub AND n$idx.code = $prev.code)""".stripMargin

  private def duckSimhashSig(bits: Int) =
    s"""w AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
       |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM w),
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |hs AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM ex),
       |bits AS (SELECT doc_id, h, unnest(range(0, $bits)) AS j FROM hs),
       |votes AS (SELECT doc_id, j, sum(((h >> CAST(j AS INT)) & 1) * 2 - 1) AS v
       |  FROM bits GROUP BY doc_id, j),
       |sig AS (SELECT doc_id AS id,
       |  CAST(sum(CASE WHEN v >= 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** The IVF-PQ oracle (shared verbatim by `q_sim_topk_ivfpq` and
    * `q_sim_topk_ivfpq_incremental`: stored-code search over the
    * two-half standing index must be bit-identical to the fresh
    * whole-corpus encode). */
  private def ivfPqOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
                |cent AS (SELECT vec_id AS cell, v AS centroid FROM e WHERE vec_id < 16),
                |asg AS (SELECT vec_id, cell FROM (
                |  SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
                |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
                |  FROM e, cent c) WHERE rn = 1),
                |probes AS (SELECT query_id, cell FROM (
                |  SELECT q.vec_id AS query_id, c.cell,
                |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
                |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
                |  FROM e q, cent c WHERE q.vec_id < 8) WHERE pr <= 8),
                |seeds AS (SELECT CAST(vec_id AS VARCHAR) AS sid, v,
                |  ('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
                |  FROM e ORDER BY h, sid LIMIT 16),
                |coded AS (SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS code, v
                |  FROM seeds),
                |subsq AS (SELECT unnest(range(0, 16)) AS sub),
                |cb AS (SELECT sub, code,
                |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS c
                |  FROM coded CROSS JOIN subsq),
                |csub AS (SELECT vec_id, sub,
                |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS sv
                |  FROM e CROSS JOIN subsq),
                |dists AS (SELECT s.vec_id, s.sub, cb.code,
                |  ${duckL2sq("s.sv", "cb.c", 4)} AS dd
                |  FROM csub s JOIN cb ON s.sub = cb.sub),
                |best AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code,
                |  ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                |    ORDER BY dd ASC, code ASC) AS rn FROM dists) WHERE rn = 1),
                |qsub AS (SELECT vec_id AS query_id, sub,
                |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS qs
                |  FROM e CROSS JOIN subsq WHERE vec_id < 8),
                |qtab AS (SELECT q.query_id, q.sub, cb.code,
                |  CAST(round(${duckL2sq("q.qs", "cb.c", 4)} * 1e9) AS BIGINT) AS dq
                |  FROM qsub q JOIN cb ON q.sub = cb.sub),
                |approx AS (SELECT t.query_id, b.vec_id AS neighbor_id,
                |  CAST(sum(t.dq) AS BIGINT) AS ds
                |  FROM best b JOIN asg a ON a.vec_id = b.vec_id
                |  JOIN probes p ON p.cell = a.cell
                |  JOIN qtab t ON t.query_id = p.query_id
                |    AND b.sub = t.sub AND b.code = t.code
                |  WHERE t.query_id != b.vec_id GROUP BY 1, 2),
                |short AS (SELECT query_id, neighbor_id, (ds + 500) // 1000 / 1e6 AS pq_dist FROM (SELECT *,
                |  ROW_NUMBER() OVER (PARTITION BY query_id
                |    ORDER BY ds ASC, neighbor_id ASC) AS ar FROM approx)
                |  WHERE ar <= 128),
                |rer AS (SELECT s.query_id, s.neighbor_id,
                |  list_cosine_similarity(qe.v, ne.v) AS cos, s.pq_dist
                |  FROM short s
                |  JOIN e ne ON ne.vec_id = s.neighbor_id
                |  JOIN e qe ON qe.vec_id = s.query_id)
                |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos,
                |  CAST(rnk AS BIGINT) AS rank, round(pq_dist, 6) + 0.0 AS pq_dist
                |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                |  ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM rer)
                |WHERE rnk <= 5""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // LSH-bucketed approximate top-k with multi-probe, exact result
    // parity (not just recall): identical hyperplanes on both engines.
    QueryDef(
      "q_sim_topk_lsh",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, bits = 8, probes = 4)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |cb AS (SELECT vec_id AS neighbor_id, v AS nv,
              |  ${duckBucket("v", 8)} AS bucket FROM e),
              |qb0 AS (SELECT vec_id AS query_id, v AS qv,
              |  ${duckBucket("v", 8)} AS bucket FROM e WHERE vec_id < 8),
              |qb AS (SELECT query_id, qv, bucket FROM qb0
              |  UNION SELECT query_id, qv, xor(bucket, 1) FROM qb0
              |  UNION SELECT query_id, qv, xor(bucket, 2) FROM qb0
              |  UNION SELECT query_id, qv, xor(bucket, 4) FROM qb0
              |  UNION SELECT query_id, qv, xor(bucket, 8) FROM qb0),
              |scored AS (SELECT q.query_id, c.neighbor_id,
              |  list_cosine_similarity(q.qv, c.nv) AS cos
              |  FROM cb c JOIN qb q ON c.bucket = q.bucket
              |  WHERE q.query_id != c.neighbor_id),
              |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
              |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
              |FROM ranked WHERE rank <= 5""".stripMargin),
    ),

    // MULTI-TABLE LSH top-k (4 independent hyperplane tables x 4 bits,
    // 2 probe flips per table): the recall amplifier — a true neighbor
    // only needs to collide in ONE table, so miss probability drops
    // from (1-p) to (1-p)^4. Exact result parity with DuckDB running
    // the identical 16 inlined hyperplanes; recall quality itself is
    // floored by AnnRecallSpec against brute force.
    QueryDef(
      "q_sim_topk_mtlsh",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, bits = 4, probes = 2, tables = 4)
      },
      Some {
        val corpusTables = (0 until 4).map { t =>
          s"SELECT vec_id, v, $t AS t, ${duckBucket("v", 4, t)} AS bucket FROM e"
        }.mkString(" UNION ALL ")
        val queryTables = (0 until 4).map { t =>
          s"SELECT vec_id, v, $t AS t, ${duckBucket("v", 4, t)} AS bucket FROM e WHERE vec_id < 8"
        }.mkString(" UNION ALL ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cb AS (SELECT vec_id AS neighbor_id, v AS nv, t, bucket
           |  FROM ($corpusTables)),
           |qb0 AS (SELECT vec_id AS query_id, v AS qv, t, bucket
           |  FROM ($queryTables)),
           |qb AS (SELECT query_id, qv, t, bucket FROM qb0
           |  UNION SELECT query_id, qv, t, xor(bucket, 1) FROM qb0
           |  UNION SELECT query_id, qv, t, xor(bucket, 2) FROM qb0),
           |scored AS (SELECT DISTINCT q.query_id, c.neighbor_id,
           |  list_cosine_similarity(q.qv, c.nv) AS cos
           |  FROM cb c JOIN qb q ON c.t = q.t AND c.bucket = q.bucket
           |  WHERE q.query_id != c.neighbor_id),
           |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
           |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
           |FROM ranked WHERE rank <= 5""".stripMargin
      },
    ),

    // IVF probe-and-rerank with a deterministic (fixed-centroid) index:
    // cells are the argmax-cosine assignment to the first 16 vectors,
    // so assignment + probing + rerank are all SQL-expressible. The
    // KMeans-learned path (ivfIndex) shares this exact search code.
    QueryDef(
      "q_sim_topk_ivf",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val assigned = Similarity.assignCells(e, centroids, "vec_id", "embedding")
        Similarity.ivfTopK(assigned, centroids, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nProbe = 4)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cell, v AS centroid FROM e WHERE vec_id < 16),
             |asg AS (SELECT vec_id, v, cell FROM (
             |  SELECT e.vec_id, e.v, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
             |  FROM e, cent c) WHERE rn = 1),
             |probes AS (SELECT query_id, qv, cell FROM (
             |  SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
             |  FROM e q, cent c WHERE q.vec_id < 8) WHERE pr <= 4),
             |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             |  list_cosine_similarity(p.qv, a.v) AS cos
             |  FROM asg a JOIN probes p ON a.cell = p.cell
             |  WHERE a.vec_id != p.query_id),
             |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
             |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
             |FROM ranked WHERE rank <= 5""".stripMargin),
    ),

    // IN-PLACE CELL SPLIT on the standing index (r12,
    // IncrementalAnn.splitCell — the centroid-level linear-hashing
    // move that retires the full-retrain maintenance event): the
    // whole corpus is ingested against 16 fixed centroids, then cell
    // 0 splits between two EXPLICIT child centroids (vec_id 16/17's
    // embeddings — the deterministic, oracle-checkable path; the
    // learned 2-means path is spec-pinned in IncrementalAnnSplitSpec)
    // as one atomic commit (movers tombstone + re-insert; every other
    // cell untouched), and the search runs against the post-split
    // layout with the UPDATED centroid table. The oracle replays the
    // assignment, the argmax division of cell 0, the centroid-table
    // edit, and the probe+rerank. NOTE for bench readers: ingest +
    // split execute at plan construction; per-pass timings see the
    // pruned post-split search.
    QueryDef(
      "q_sim_topk_ivf_split",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val dir = java.nio.file.Files
          .createTempDirectory("graft-annsplit-q").toString
        graft.operators.IncrementalAnn.ingest(e, dir, centroids,
          "vec_id", "embedding", nBuckets = 16)
        val ch = e.filter(col("vec_id").isin(16L, 17L))
          .orderBy("vec_id")
          .select(col("embedding").cast("array<double>"))
          .collect().map(_.getSeq[Double](0).toArray)
        val updated = graft.operators.IncrementalAnn.splitCell(s, dir,
          centroids, 0L, "vec_id", "embedding", newCellId = Some(16L),
          children = Some((ch(0), ch(1))))
        graft.operators.IncrementalAnn.topKLazy(s, dir, updated,
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nProbe = 4)._1
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent0 AS (SELECT vec_id AS cell, v AS centroid FROM e WHERE vec_id < 16),
             |ch AS (SELECT
             |  (SELECT v FROM e WHERE vec_id = 16) AS c1,
             |  (SELECT v FROM e WHERE vec_id = 17) AS c2),
             |asg0 AS (SELECT vec_id, v, cell FROM (
             |  SELECT e.vec_id, e.v, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
             |  FROM e, cent0 c) WHERE rn = 1),
             |asg AS (SELECT vec_id, v,
             |  CASE WHEN cell = 0 THEN
             |    CASE WHEN list_cosine_similarity(v, (SELECT c1 FROM ch)) >=
             |              list_cosine_similarity(v, (SELECT c2 FROM ch))
             |         THEN 0 ELSE 16 END
             |  ELSE cell END AS cell FROM asg0),
             |cent AS (SELECT cell, centroid FROM cent0 WHERE cell <> 0
             |  UNION ALL SELECT 0 AS cell, c1 AS centroid FROM ch
             |  UNION ALL SELECT 16 AS cell, c2 AS centroid FROM ch),
             |probes AS (SELECT query_id, qv, cell FROM (
             |  SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
             |  FROM e q, cent c WHERE q.vec_id < 8) WHERE pr <= 4),
             |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             |  list_cosine_similarity(p.qv, a.v) AS cos
             |  FROM asg a JOIN probes p ON a.cell = p.cell
             |  WHERE a.vec_id != p.query_id),
             |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
             |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
             |FROM ranked WHERE rank <= 5""".stripMargin),
    ),

    // NEIGHBORHOOD REBALANCE on the standing index (r12,
    // IncrementalAnn.reassign — the inter-subtree mass move greedy
    // hierarchical splits cannot make): the corpus is ingested against
    // 12 OLD centroids, then 4 new centroids appear (as splits
    // elsewhere would plant them) and reassign re-homes every drifted
    // vector to its CURRENT argmax cell in one atomic commit. The
    // committed index must then BE the fresh assignment under all 16
    // centroids — so the oracle is exactly q_sim_topk_ivf's (16-cell
    // assign + probe + rerank): any vector left in a stale cell
    // surfaces as a missing/extra neighbor. NOTE for bench readers:
    // ingest + reassign execute at plan construction; per-pass timings
    // see the post-rebalance search.
    QueryDef(
      "q_sim_topk_ivf_rebalance",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        def cents(n: Int) = e.filter(col("vec_id") < n)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val dir = java.nio.file.Files
          .createTempDirectory("graft-annreb-q").toString
        graft.operators.IncrementalAnn.ingest(e, dir, cents(12),
          "vec_id", "embedding", nBuckets = 16)
        graft.operators.IncrementalAnn.reassign(s, dir, cents(16),
          (0L until 12L).toSeq, "vec_id", "embedding")
        graft.operators.IncrementalAnn.topKLazy(s, dir, cents(16),
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nProbe = 4)._1
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cell, v AS centroid FROM e WHERE vec_id < 16),
             |asg AS (SELECT vec_id, v, cell FROM (
             |  SELECT e.vec_id, e.v, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
             |  FROM e, cent c) WHERE rn = 1),
             |probes AS (SELECT query_id, qv, cell FROM (
             |  SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
             |  FROM e q, cent c WHERE q.vec_id < 8) WHERE pr <= 4),
             |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             |  list_cosine_similarity(p.qv, a.v) AS cos
             |  FROM asg a JOIN probes p ON a.cell = p.cell
             |  WHERE a.vec_id != p.query_id),
             |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
             |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
             |FROM ranked WHERE rank <= 5""".stripMargin),
    ),

    // The INCREMENTAL ANN ingest loop (IncrementalAnn): cell
    // assignments committed to a standing snapshot-table index in TWO
    // ingests (vec_id parity halves), then probe-and-rerank against
    // the COMMITTED index — the result must be bit-identical to
    // assigning the whole corpus fresh, so the oracle is exactly
    // q_sim_topk_ivf's. NOTE for bench readers: the two index commits
    // execute at plan construction (eager temp-dir writes); per-pass
    // timings see the committed-index read + probe + rerank — the
    // deployment's per-query cost.
    QueryDef(
      "q_sim_topk_ivf_incremental",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val dir = java.nio.file.Files
          .createTempDirectory("graft-incann-q").toString
        graft.operators.IncrementalAnn.ingest(
          e.filter(col("vec_id") % 2 === 0), dir, centroids,
          "vec_id", "embedding", nBuckets = 16)
        graft.operators.IncrementalAnn.ingest(
          e.filter(col("vec_id") % 2 === 1), dir, centroids,
          "vec_id", "embedding", nBuckets = 16)
        // the LAZY variant keeps the search IN the per-pass timing:
        // the public topK materializes eagerly (so it can release its
        // probe checkpoint — the long-lived-driver contract), which
        // would move the search into build time and leave passes
        // re-reading a local result. One probe checkpoint per plan
        // construction is the registry's usual eager-build shape.
        graft.operators.IncrementalAnn.topKLazy(s, dir, centroids,
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, nProbe = 4)._1
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT vec_id AS cell, v AS centroid FROM e WHERE vec_id < 16),
             |asg AS (SELECT vec_id, v, cell FROM (
             |  SELECT e.vec_id, e.v, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
             |  FROM e, cent c) WHERE rn = 1),
             |probes AS (SELECT query_id, qv, cell FROM (
             |  SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
             |  FROM e q, cent c WHERE q.vec_id < 8) WHERE pr <= 4),
             |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             |  list_cosine_similarity(p.qv, a.v) AS cos
             |  FROM asg a JOIN probes p ON a.cell = p.cell
             |  WHERE a.vec_id != p.query_id),
             |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
             |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
             |FROM ranked WHERE rank <= 5""".stripMargin),
    ),

    // The IVF-PQ STANDING index (IncrementalAnn.ingestPq/topKPq): the
    // codes are computed ONCE per ingest against the fixed codebook
    // and stored in the cell-bucketed table, so search reads the
    // probed cells' buckets and ADC-scores STORED codes — never
    // re-encoding the corpus. Must be bit-identical to
    // q_sim_topk_ivfpq's fresh whole-corpus encode (same oracle, the
    // fixed centroids/codebook artifacts built over the full corpus
    // like a production train-once deployment). NOTE for bench
    // readers: the two ingests (assign + encode + commit) execute at
    // plan construction; per-pass timings see the pruned ADC search,
    // the deployment's per-query cost.
    QueryDef(
      "q_sim_topk_ivfpq_incremental",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val cb = Similarity.pqCodebook(e, "vec_id", "embedding", m = 16, k = 16)
        val dir = java.nio.file.Files
          .createTempDirectory("graft-incpq-q").toString
        graft.operators.IncrementalAnn.ingestPq(
          e.filter(col("vec_id") % 2 === 0), dir, centroids, cb,
          "vec_id", "embedding", m = 16, nBuckets = 16)
        graft.operators.IncrementalAnn.ingestPq(
          e.filter(col("vec_id") % 2 === 1), dir, centroids, cb,
          "vec_id", "embedding", m = 16, nBuckets = 16)
        // lazy variant for the same reason as q_sim_topk_ivf_incremental
        graft.operators.IncrementalAnn.topKPqLazy(s, dir, centroids, cb,
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, m = 16, nProbe = 8, rerank = 128)._1
      },
      Some(ivfPqOracle),
    ),

    // Embedding near-dup: random-hyperplane blocks + exact cosine.
    // The testdata embeddings carry no planted near-dups (max pairwise
    // cosine ~0.5), so the threshold is set low enough to yield a
    // non-trivial verified pair set.
    QueryDef(
      "q_dedup_embedding",
      (s, d) => Dedup.embeddingDedup(QueryDef.load(s, d, "embeddings"),
          "vec_id", "embedding", threshold = 0.2, bits = 4)
        .select(col("id1"), col("id2"), (round(col("cos"), 4) + lit(0.0)).as("cos")),
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |b AS (SELECT vec_id AS id, v, ${duckBucket("v", 4)} AS bucket FROM e),
              |p AS (SELECT l.id AS id1, r.id AS id2,
              |  list_cosine_similarity(l.v, r.v) AS cos
              |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id)
              |SELECT id1, id2, round(cos, 4) + 0.0 AS cos FROM p WHERE cos >= 0.2"""
        .stripMargin),
    ),

    // Embedding-side END-TO-END semantic dedup (SemDeDup-style): LSH
    // near-dup pairs -> connected components -> canonical keep-set
    // (keep = the min-id representative of each duplicate cluster).
    // Same composition shape as the text-side q_corpus_pipeline.
    QueryDef(
      "q_dedup_semantic",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val pairs = Dedup.embeddingDedup(e, "vec_id", "embedding",
          threshold = 0.2, bits = 4).select(col("id1"), col("id2"))
        Dedup.dupClusters(pairs, e, "vec_id")
          .select(col("vec_id"), col("cluster"),
            (col("vec_id") === col("cluster")).as("keep"))
      },
      Some(s"""WITH RECURSIVE
              |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |b AS (SELECT vec_id AS id, v, ${duckBucket("v", 4)} AS bucket FROM e),
              |p AS (SELECT l.id AS id1, r.id AS id2
              |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id
              |  WHERE list_cosine_similarity(l.v, r.v) >= 0.2),
              |edges AS (SELECT id1, id2 FROM p
              |  UNION ALL SELECT id2, id1 FROM p),
              |reach(id, r) AS (
              |  SELECT vec_id, vec_id FROM embeddings
              |  UNION
              |  SELECT e2.id2, reach.r FROM reach JOIN edges e2 ON e2.id1 = reach.id),
              |c AS (SELECT id AS vec_id, min(r) AS cluster FROM reach GROUP BY id)
              |SELECT vec_id, cluster, vec_id = cluster AS keep FROM c"""
        .stripMargin),
    ),

    // HYBRID retrieval: lexical BM25 and embedding-cosine rankings
    // for the same 8 doc-as-query probes, fused by reciprocal-rank
    // fusion (1/(60+rank) micro-unit sums) — the modern two-tower
    // retrieval composition, and the reason rrfFuse exists: BM25
    // scores and cosines are not calibrated against each other; ranks
    // are. Both legs reuse registered, independently-oracled
    // operators; the fusion layer itself is what this query gates.
    QueryDef(
      "q_hybrid_retrieval",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val e = QueryDef.load(s, d, "embeddings")
        val q = docs.filter(col("doc_id") < 8)
          .select(col("doc_id").as("query_id"), col("text").as("qtext"))
        val lex = graft.operators.TextAnalysis.bm25TopK(docs, q, "text",
            "doc_id", "query_id", "qtext", k = 20, excludeSelf = true)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val sem = Similarity.bruteForceTopK(e,
            e.filter(col("vec_id") < 8), "vec_id", "embedding", k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank"))
        Similarity.rrfFuse(Seq(lex, sem), k = 60, topK = 10)
      },
      Some("""WITH w AS (SELECT doc_id,
             |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
             |  FROM documents),
             |toks AS (SELECT doc_id, len(ws) AS n_toks, unnest(ws) AS term FROM w),
             |tf AS (SELECT doc_id, term, count(*) AS tf_cnt, min(n_toks) AS n_toks
             |  FROM toks GROUP BY doc_id, term),
             |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
             |st AS (SELECT count(*) AS n_docs, CAST(sum(len(ws)) AS BIGINT) AS sum_dl FROM w),
             |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws)) AS term
             |  FROM w WHERE doc_id < 8),
             |c AS (SELECT qt.query_id, tf.doc_id,
             |  CAST(round(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             |    * (tf_cnt * 2.2 / (tf_cnt + 1.2 * (0.25 + 0.75 * tf.n_toks
             |        / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1e6) AS BIGINT) AS c_micro
             |  FROM tf JOIN qt USING (term) JOIN dfq USING (term), st),
             |sc AS (SELECT query_id, doc_id, CAST(sum(c_micro) AS BIGINT) AS s_micro
             |  FROM c WHERE query_id != doc_id GROUP BY 1, 2),
             |lex AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY s_micro DESC, doc_id ASC) AS rank FROM sc),
             |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |pairs AS (SELECT q.vec_id AS query_id, n.vec_id AS doc_id,
             |  list_cosine_similarity(q.v, n.v) AS cos
             |  FROM e q JOIN e n ON n.vec_id != q.vec_id WHERE q.vec_id < 8),
             |sem AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY cos DESC, doc_id ASC) AS rank FROM pairs),
             |uni AS (SELECT query_id, doc_id,
             |    CAST(round(1e6 / (60 + rank)) AS BIGINT) AS cc
             |  FROM lex WHERE rank <= 20
             |  UNION ALL SELECT query_id, doc_id,
             |    CAST(round(1e6 / (60 + rank)) AS BIGINT)
             |  FROM sem WHERE rank <= 20),
             |fused AS (SELECT query_id, doc_id, CAST(sum(cc) AS BIGINT) AS s,
             |  count(*) AS n_systems FROM uni GROUP BY 1, 2),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY s DESC, doc_id ASC) AS rank FROM fused)
             |SELECT query_id, doc_id, round(s / 1e6, 6) + 0.0 AS rrf,
             |  n_systems, rank
             |FROM r WHERE rank <= 10""".stripMargin),
    ),

    // SEMANTIC decontamination: corpus embeddings near-dup (cosine)
    // to ANY eval-set embedding, blocked by 2-table LSH so the corpus
    // never pairs against itself — the embedding-space analogue of
    // q_decontaminate's n-gram matching (catches paraphrases n-grams
    // miss). Eval set = vec_id % 25 == 0 AND vec_id < 2000: a FIXED
    // benchmark suite (<= 80 vectors at every sf) disjoint from the
    // corpus side — deriving eval as a corpus fraction made the
    // decade sweep quadratic (both join sides grew; see PERF.md /
    // DecontamScaling), which is not the operator's contract.
    QueryDef(
      "q_decontaminate_semantic",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        Dedup.embeddingDecontaminate(
            e.filter(col("vec_id") % 25 =!= 0 || col("vec_id") >= 2000),
            e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000),
            "vec_id", "embedding", tau = 0.2, bits = 4, tables = 2)
          .select(col("vec_id"),
            (round(col("max_cos"), 4) + lit(0.0)).as("max_cos"),
            col("n_matches"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |ev AS (SELECT * FROM e WHERE vec_id % 25 = 0 AND vec_id < 2000),
              |co AS (SELECT * FROM e WHERE vec_id % 25 != 0 OR vec_id >= 2000),
              |cb AS (SELECT vec_id AS cid, v AS cv, 0 AS tbl,
              |    ${duckBucket("v", 4, 0)} AS bucket FROM co
              |  UNION ALL SELECT vec_id, v, 1, ${duckBucket("v", 4, 1)} FROM co),
              |eb AS (SELECT vec_id AS eid, v AS evv, 0 AS tbl,
              |    ${duckBucket("v", 4, 0)} AS bucket FROM ev
              |  UNION ALL SELECT vec_id, v, 1, ${duckBucket("v", 4, 1)} FROM ev),
              |p AS (SELECT cid, eid, list_cosine_similarity(cv, evv) AS cos
              |  FROM cb JOIN eb USING (tbl, bucket))
              |SELECT cid AS vec_id, round(max(cos), 4) + 0.0 AS max_cos,
              |  count(DISTINCT eid) AS n_matches
              |FROM p WHERE cos >= 0.2 GROUP BY cid""".stripMargin),
    ),

    // Multi-band SimHash near-dup pairs (hamming <= 3 over 32 bits in
    // 4 bands; pigeonhole makes recall exact). 32-bit signatures, not
    // 16: an 8-bit band key gives 256 buckets per band, keeping the
    // within-bucket self-join subquadratic as the corpus grows (16-bit
    // sigs = 16 buckets/band ran a 3M-pair join at sf0.1).
    QueryDef(
      "q_dedup_simhash_pairs",
      (s, d) => Dedup.simHashPairs(QueryDef.load(s, d, "documents"),
        "text", "doc_id", maxDist = 3, bits = 32, bands = 4),
      Some(s"""WITH ${duckSimhashSig(32)},
              |banded AS (SELECT id, simhash, b.band,
              |  (simhash >> CAST(8 * b.band AS INT)) & 255 AS key
              |  FROM sig, (SELECT unnest(range(0, 4)) AS band) b),
              |cand AS (SELECT DISTINCT l.id AS id1, r.id AS id2,
              |  CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
              |  FROM banded l JOIN banded r
              |  ON l.band = r.band AND l.key = r.key AND l.id < r.id)
              |SELECT id1, id2, hamming FROM cand WHERE hamming <= 3""".stripMargin),
    ),

    // Product quantization + ADC search + exact rerank — the memory
    // path for billion-vector ANN: 64 floats -> 8 codes; search reads
    // only codes + an m*k lookup table, original vectors touched only
    // for the rerank shortlist. The seeded-sample codebook (md5-hash
    // order, like every deterministic draw here) makes the WHOLE
    // pipeline hash-match the oracle: per-lookup distances quantize to
    // integer nano-units so the m-term ADC sums are exact integer
    // arithmetic on both engines, and the subspace L2 folds spell the
    // identical left-associated float sum.
    QueryDef(
      "q_sim_topk_pq",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        // m=16 (4-dim subspaces): the recall-bearing knob on this
        // near-uniform fixture — AnnRecallSpec floors the config at
        // 0.75 vs brute force where m=8/rerank=32 measures 0.38
        val cb = Similarity.pqCodebook(e, "vec_id", "embedding", m = 16, k = 16)
        Similarity.pqTopK(e, cb, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, m = 16, rerank = 64)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |seeds AS (SELECT CAST(vec_id AS VARCHAR) AS sid, v,
              |  ('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
              |  FROM e ORDER BY h, sid LIMIT 16),
              |coded AS (SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS code, v
              |  FROM seeds),
              |subsq AS (SELECT unnest(range(0, 16)) AS sub),
              |cb AS (SELECT sub, code,
              |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS c
              |  FROM coded CROSS JOIN subsq),
              |csub AS (SELECT vec_id, sub,
              |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS sv
              |  FROM e CROSS JOIN subsq),
              |dists AS (SELECT s.vec_id, s.sub, cb.code,
              |  ${duckL2sq("s.sv", "cb.c", 4)} AS dd
              |  FROM csub s JOIN cb ON s.sub = cb.sub),
              |best AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code,
              |  ROW_NUMBER() OVER (PARTITION BY vec_id, sub
              |    ORDER BY dd ASC, code ASC) AS rn FROM dists) WHERE rn = 1),
              |qsub AS (SELECT vec_id AS query_id, sub,
              |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS qs
              |  FROM e CROSS JOIN subsq WHERE vec_id < 8),
              |qtab AS (SELECT q.query_id, q.sub, cb.code,
              |  CAST(round(${duckL2sq("q.qs", "cb.c", 4)} * 1e9) AS BIGINT) AS dq
              |  FROM qsub q JOIN cb ON q.sub = cb.sub),
              |approx AS (SELECT t.query_id, b.vec_id AS neighbor_id,
              |  CAST(sum(t.dq) AS BIGINT) AS ds
              |  FROM best b JOIN qtab t ON b.sub = t.sub AND b.code = t.code
              |  WHERE t.query_id != b.vec_id GROUP BY 1, 2),
              |short AS (SELECT query_id, neighbor_id, (ds + 500) // 1000 / 1e6 AS pq_dist FROM (SELECT *,
              |  ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY ds ASC, neighbor_id ASC) AS ar FROM approx)
              |  WHERE ar <= 64),
              |rer AS (SELECT s.query_id, s.neighbor_id,
              |  list_cosine_similarity(qe.v, ne.v) AS cos, s.pq_dist
              |  FROM short s
              |  JOIN e ne ON ne.vec_id = s.neighbor_id
              |  JOIN e qe ON qe.vec_id = s.query_id)
              |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos,
              |  CAST(rnk AS BIGINT) AS rank, round(pq_dist, 6) + 0.0 AS pq_dist
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM rer)
              |WHERE rnk <= 5""".stripMargin),
    ),

    // Flat PQ search with a Lloyd-TRAINED codebook: two per-subspace
    // k-means iterations on the seeded init lift recall@10 from 0.784
    // to 0.880 at identical m/k/rerank budgets (AnnRecallSpec). The
    // training loop itself is oracle-replayed: exact-L2 argmin
    // re-assignment + micro-unit exact means, both engines
    // deterministic round for round.
    QueryDef(
      "q_sim_topk_pq_trained",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val cb = Similarity.pqCodebookTrained(e, "vec_id", "embedding",
          m = 16, k = 16, iters = 2)
        Similarity.pqTopK(e, cb, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, m = 16, rerank = 64)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |seeds AS (SELECT CAST(vec_id AS VARCHAR) AS sid, v,
              |  ('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
              |  FROM e ORDER BY h, sid LIMIT 16),
              |coded AS (SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS code, v
              |  FROM seeds),
              |subsq AS (SELECT unnest(range(0, 16)) AS sub),
              |cb0 AS (SELECT sub, code,
              |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS c
              |  FROM coded CROSS JOIN subsq),
              |csub AS (SELECT vec_id, sub,
              |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS sv
              |  FROM e CROSS JOIN subsq),
              |${duckLloydIter("cb0", "cb1", 1)},
              |${duckLloydIter("cb1", "cb", 2)},
              |dists AS (SELECT s.vec_id, s.sub, cb.code,
              |  ${duckL2sq("s.sv", "cb.c", 4)} AS dd
              |  FROM csub s JOIN cb ON s.sub = cb.sub),
              |best AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code,
              |  ROW_NUMBER() OVER (PARTITION BY vec_id, sub
              |    ORDER BY dd ASC, code ASC) AS rn FROM dists) WHERE rn = 1),
              |qsub AS (SELECT vec_id AS query_id, sub,
              |  list_slice(v, sub * 4 + 1, sub * 4 + 4) AS qs
              |  FROM e CROSS JOIN subsq WHERE vec_id < 8),
              |qtab AS (SELECT q.query_id, q.sub, cb.code,
              |  CAST(round(${duckL2sq("q.qs", "cb.c", 4)} * 1e9) AS BIGINT) AS dq
              |  FROM qsub q JOIN cb ON q.sub = cb.sub),
              |approx AS (SELECT t.query_id, b.vec_id AS neighbor_id,
              |  CAST(sum(t.dq) AS BIGINT) AS ds
              |  FROM best b JOIN qtab t ON b.sub = t.sub AND b.code = t.code
              |  WHERE t.query_id != b.vec_id GROUP BY 1, 2),
              |short AS (SELECT query_id, neighbor_id, (ds + 500) // 1000 / 1e6 AS pq_dist FROM (SELECT *,
              |  ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY ds ASC, neighbor_id ASC) AS ar FROM approx)
              |  WHERE ar <= 64),
              |rer AS (SELECT s.query_id, s.neighbor_id,
              |  list_cosine_similarity(qe.v, ne.v) AS cos, s.pq_dist
              |  FROM short s
              |  JOIN e ne ON ne.vec_id = s.neighbor_id
              |  JOIN e qe ON qe.vec_id = s.query_id)
              |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos,
              |  CAST(rnk AS BIGINT) AS rank, round(pq_dist, 6) + 0.0 AS pq_dist
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM rer)
              |WHERE rnk <= 5""".stripMargin),
    ),

    // IVF-PQ: the r5-verdict composition — the ADC scan of q_sim_topk_pq
    // pruned by the IVF cell assignment of q_sim_topk_ivf. A query
    // probes its 8 nearest of 16 cells (50%) and ADC-scores ONLY
    // vectors assigned there; flat ADC scores all of them. Same
    // deterministic fixtures as both parents (first-16-vector
    // centroids, md5-seeded codebook, DECIMAL-quantized lookups), so
    // the full composition hash-matches the oracle end to end.
    QueryDef(
      "q_sim_topk_ivfpq",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val assigned = Similarity.assignCells(e, centroids, "vec_id", "embedding")
        val cb = Similarity.pqCodebook(e, "vec_id", "embedding", m = 16, k = 16)
        Similarity.ivfPqTopK(assigned, centroids, cb,
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, m = 16, nProbe = 8, rerank = 128,
          // rerank fetches (id, vector) only — the raw scan avoids
          // re-running the argmax-cosine assignment just for vectors
          rerankCorpus = e)
      },
      Some(ivfPqOracle),
    ),

    // Residual-encoded IVF-PQ (full FAISS IndexIVFPQ recipe): codes
    // quantize v - centroid(cell) against a residual-trained codebook;
    // the ADC table is per-(query, probed cell). Same deterministic
    // seeded codebook scheme, so the whole search is oracle-exact.
    QueryDef(
      "q_sim_topk_ivfpq_res",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val centroids = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val assigned = Similarity.assignCells(e, centroids, "vec_id", "embedding")
        Similarity.ivfPqResidualTopK(assigned, centroids,
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, m = 16, kCodes = 16, nProbe = 8, rerank = 128,
          rerankCorpus = e)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |cent AS (SELECT vec_id AS cell, v AS centroid FROM e WHERE vec_id < 16),
              |asg AS (SELECT vec_id, cell FROM (
              |  SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
              |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
              |  FROM e, cent c) WHERE rn = 1),
              |rese AS (SELECT a.vec_id, a.cell,
              |  list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.centroid[i]) AS rv
              |  FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN cent c ON c.cell = a.cell),
              |seeds AS (SELECT CAST(vec_id AS VARCHAR) AS sid, rv,
              |  ('0x' || substr(md5('pqres:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
              |  FROM rese ORDER BY h, sid LIMIT 16),
              |coded AS (SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS code, rv
              |  FROM seeds),
              |subsq AS (SELECT unnest(range(0, 16)) AS sub),
              |cb AS (SELECT sub, code,
              |  list_slice(rv, sub * 4 + 1, sub * 4 + 4) AS c
              |  FROM coded CROSS JOIN subsq),
              |csub AS (SELECT vec_id, cell, sub,
              |  list_slice(rv, sub * 4 + 1, sub * 4 + 4) AS sv
              |  FROM rese CROSS JOIN subsq),
              |dists AS (SELECT s.vec_id, s.cell, s.sub, cb.code,
              |  ${duckL2sq("s.sv", "cb.c", 4)} AS dd
              |  FROM csub s JOIN cb ON s.sub = cb.sub),
              |best AS (SELECT vec_id, cell, sub, code FROM (
              |  SELECT vec_id, cell, sub, code,
              |  ROW_NUMBER() OVER (PARTITION BY vec_id, sub
              |    ORDER BY dd ASC, code ASC) AS rn FROM dists) WHERE rn = 1),
              |probes AS (SELECT query_id, cell FROM (
              |  SELECT q.vec_id AS query_id, c.cell,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
              |  FROM e q, cent c WHERE q.vec_id < 8) WHERE pr <= 8),
              |qres AS (SELECT p.query_id, p.cell,
              |  list_transform(range(1, len(q.v) + 1), i -> q.v[i] - c.centroid[i]) AS qr
              |  FROM probes p JOIN e q ON q.vec_id = p.query_id
              |  JOIN cent c ON c.cell = p.cell),
              |qsub AS (SELECT query_id, cell, sub,
              |  list_slice(qr, sub * 4 + 1, sub * 4 + 4) AS qs
              |  FROM qres CROSS JOIN subsq),
              |qtab AS (SELECT q.query_id, q.cell, q.sub, cb.code,
              |  CAST(round(${duckL2sq("q.qs", "cb.c", 4)} * 1e9) AS BIGINT) AS dq
              |  FROM qsub q JOIN cb ON q.sub = cb.sub),
              |approx AS (SELECT t.query_id, b.vec_id AS neighbor_id,
              |  CAST(sum(t.dq) AS BIGINT) AS ds
              |  FROM best b JOIN qtab t ON t.cell = b.cell
              |    AND b.sub = t.sub AND b.code = t.code
              |  WHERE t.query_id != b.vec_id GROUP BY 1, 2),
              |short AS (SELECT query_id, neighbor_id, (ds + 500) // 1000 / 1e6 AS pq_dist FROM (SELECT *,
              |  ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY ds ASC, neighbor_id ASC) AS ar FROM approx)
              |  WHERE ar <= 128),
              |rer AS (SELECT s.query_id, s.neighbor_id,
              |  list_cosine_similarity(qe.v, ne.v) AS cos, s.pq_dist
              |  FROM short s
              |  JOIN e ne ON ne.vec_id = s.neighbor_id
              |  JOIN e qe ON qe.vec_id = s.query_id)
              |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos,
              |  CAST(rnk AS BIGINT) AS rank, round(pq_dist, 6) + 0.0 AS pq_dist
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM rer)
              |WHERE rnk <= 5""".stripMargin),
    ),

    // The DEPLOYED IVF-PQ configuration, fully trained and fully
    // sized — residual encoding + 2 Lloyd iterations on the residual
    // codebook (the complete FAISS IndexIVFPQ recipe), with the index
    // sized by the executed scale rules instead of pinned small:
    // nCells = autoCells(N) ~ sqrt(N) (per-query candidates stay
    // ~nProbe*sqrt(N), sub-linear — IvfCellScaling measured fixed-16
    // cells at 36x more candidates AND recall loss at 200k vectors)
    // and nProbe = ceil(nCells/2), holding the 50% probe fraction the
    // seeded config ships. Everything remains oracle-exact: cell count
    // and probe depth are scalar subqueries over count(*), the Lloyd
    // rounds replay argmin + micro-unit means, ADC lookups quantize to
    // integer nano-units.
    QueryDef(
      "q_sim_topk_ivfpq_trained",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        val nCells = Similarity.autoCells(e.count())
        val nProbe = (nCells + 1) / 2
        val centroids = e.filter(col("vec_id") < nCells)
          .select(col("vec_id").as("cell"),
            col("embedding").cast("array<double>").as("centroid"))
        val assigned = Similarity.assignCells(e, centroids, "vec_id", "embedding")
        Similarity.ivfPqResidualTopK(assigned, centroids,
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, m = 16, kCodes = 16, nProbe = nProbe, rerank = 128,
          trainIters = 2, rerankCorpus = e)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |par AS (SELECT GREATEST(16, CAST(round(sqrt(count(*))) AS BIGINT)) AS ncells FROM e),
              |cent AS (SELECT vec_id AS cell, v AS centroid FROM e
              |  WHERE vec_id < (SELECT ncells FROM par)),
              |asg AS (SELECT vec_id, cell FROM (
              |  SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id
              |    ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell ASC) AS rn
              |  FROM e, cent c) WHERE rn = 1),
              |rese AS (SELECT a.vec_id, a.cell,
              |  list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.centroid[i]) AS rv
              |  FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN cent c ON c.cell = a.cell),
              |seeds AS (SELECT CAST(vec_id AS VARCHAR) AS sid, rv,
              |  ('0x' || substr(md5('pqres:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
              |  FROM rese ORDER BY h, sid LIMIT 16),
              |coded AS (SELECT ROW_NUMBER() OVER (ORDER BY h, sid) - 1 AS code, rv
              |  FROM seeds),
              |subsq AS (SELECT unnest(range(0, 16)) AS sub),
              |cb0 AS (SELECT sub, code,
              |  list_slice(rv, sub * 4 + 1, sub * 4 + 4) AS c
              |  FROM coded CROSS JOIN subsq),
              |csub AS (SELECT vec_id, cell, sub,
              |  list_slice(rv, sub * 4 + 1, sub * 4 + 4) AS sv
              |  FROM rese CROSS JOIN subsq),
              |${duckLloydIter("cb0", "cb1", 1)},
              |${duckLloydIter("cb1", "cb", 2)},
              |dists AS (SELECT s.vec_id, s.cell, s.sub, cb.code,
              |  ${duckL2sq("s.sv", "cb.c", 4)} AS dd
              |  FROM csub s JOIN cb ON s.sub = cb.sub),
              |best AS (SELECT vec_id, cell, sub, code FROM (
              |  SELECT vec_id, cell, sub, code,
              |  ROW_NUMBER() OVER (PARTITION BY vec_id, sub
              |    ORDER BY dd ASC, code ASC) AS rn FROM dists) WHERE rn = 1),
              |probes AS (SELECT query_id, cell FROM (
              |  SELECT q.vec_id AS query_id, c.cell,
              |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |      ORDER BY list_cosine_similarity(q.v, c.centroid) DESC, c.cell ASC) AS pr
              |  FROM e q, cent c WHERE q.vec_id < 8)
              |  WHERE pr <= (SELECT (ncells + 1) // 2 FROM par)),
              |qres AS (SELECT p.query_id, p.cell,
              |  list_transform(range(1, len(q.v) + 1), i -> q.v[i] - c.centroid[i]) AS qr
              |  FROM probes p JOIN e q ON q.vec_id = p.query_id
              |  JOIN cent c ON c.cell = p.cell),
              |qsub AS (SELECT query_id, cell, sub,
              |  list_slice(qr, sub * 4 + 1, sub * 4 + 4) AS qs
              |  FROM qres CROSS JOIN subsq),
              |qtab AS (SELECT q.query_id, q.cell, q.sub, cb.code,
              |  CAST(round(${duckL2sq("q.qs", "cb.c", 4)} * 1e9) AS BIGINT) AS dq
              |  FROM qsub q JOIN cb ON q.sub = cb.sub),
              |approx AS (SELECT t.query_id, b.vec_id AS neighbor_id,
              |  CAST(sum(t.dq) AS BIGINT) AS ds
              |  FROM best b JOIN qtab t ON t.cell = b.cell
              |    AND b.sub = t.sub AND b.code = t.code
              |  WHERE t.query_id != b.vec_id GROUP BY 1, 2),
              |short AS (SELECT query_id, neighbor_id, (ds + 500) // 1000 / 1e6 AS pq_dist FROM (SELECT *,
              |  ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY ds ASC, neighbor_id ASC) AS ar FROM approx)
              |  WHERE ar <= 128),
              |rer AS (SELECT s.query_id, s.neighbor_id,
              |  list_cosine_similarity(qe.v, ne.v) AS cos, s.pq_dist
              |  FROM short s
              |  JOIN e ne ON ne.vec_id = s.neighbor_id
              |  JOIN e qe ON qe.vec_id = s.query_id)
              |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos,
              |  CAST(rnk AS BIGINT) AS rank, round(pq_dist, 6) + 0.0 AS pq_dist
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, neighbor_id ASC) AS rnk FROM rer)
              |WHERE rnk <= 5""".stripMargin),
    ),

    // Salting is result-invariant: the salted join must equal the plain
    // join (the oracle IS the plain join).
    // Per-label embedding centroids (k-means update / class prototype):
    // long-form (label, dim, value), micro-unit quantization makes the
    // mean exact and order-independent.
    QueryDef(
      "q_sim_centroids",
      (s, d) => graft.operators.Similarity.centroids(
        QueryDef.load(s, d, "embeddings"), "label", "embedding"),
      Some("""WITH t AS (SELECT label,
             |  unnest(range(0, len(embedding))) AS pos,
             |  unnest(embedding::DOUBLE[]) AS v
             |  FROM embeddings),
             |q AS (SELECT label, pos,
             |  CAST(round(v * 1000000) AS BIGINT) AS micro FROM t),
             |a AS (SELECT label, pos, CAST(sum(micro) AS BIGINT) AS s,
             |  count(*) AS n FROM q GROUP BY label, pos)
             |SELECT label, pos,
             |  CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
             |       ELSE -((-2 * s + n) // (2 * n)) END / 1e6 AS centroid_val
             |FROM a""".stripMargin),
    ),

    QueryDef(
      "q_join_salted",
      (s, d) => SkewJoin.saltedJoin(
          QueryDef.load(s, d, "orders")
            .selectExpr("o_orderkey", "o_custkey AS custkey"),
          QueryDef.load(s, d, "customer")
            .selectExpr("c_custkey AS custkey", "c_mktsegment"),
          Seq("custkey"), salts = 8)
        .select(col("o_orderkey"), col("custkey"), col("c_mktsegment")),
      Some("""SELECT o.o_orderkey, o.o_custkey AS custkey, c.c_mktsegment
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"""
        .stripMargin),
    ),
  )
}
