package graft

/** Plan-shape regression guard over the ENTIRE query registry: no
  * query may plan a BroadcastNestedLoopJoin or CartesianProduct
  * unless it is on the explicit allowlist of deliberate, bounded
  * broadcast crosses. A pure range predicate accidentally losing its
  * equi key plans "correct but one-core quadratic" — it passes every
  * correctness gate and only shows up as minutes of wall-clock at
  * scale (this guard exists because exactly that shipped twice:
  * q_fuzzy_match and embeddingWindowPairs). */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose nested-loop/cross shapes are deliberate: tiny
    * broadcast sides (query vectors, centroids, single-row scalar
    * totals), each documented at the operator. */
  private val allowedNestedLoop = Set(
    "q_sim_topk_brute", // brute-force baseline: corpus x broadcast queries
    "q_sim_topk_lsh", // probe set broadcast cross
    "q_sim_topk_ivf", // query x broadcast centroids
    "q_sim_topk_ivf_incremental", // same probe cross (query x broadcast
    // centroids); the corpus side reads the COMMITTED index, no assign cross
    "q_sim_topk_ivfpq", // assign + probe: corpus/query x broadcast centroids
    "q_sim_topk_ivfpq_incremental", // same probe cross; the corpus side
    // reads the COMMITTED cell-bucketed index with STORED codes
    "q_sim_topk_ivfpq_res", // same assign/probe crosses, residual codes
    "q_sim_topk_ivfpq_trained", // same crosses; centroids ~ sqrt(N) rows, still broadcast-tiny
    "q_dedup_semantic", // reuses the brute/verify cross on candidates
    "q_text_tfidf", // single-row n_docs scalar
    "q_text_bm25", // single-row corpus-stats scalar
    "q_text_bm25_incremental", // the same single-row corpus-stats
    // scalar cross; the postings side reads the COMMITTED term-pruned
    // index, no corpus tokenization in the plan
    "q_hybrid_retrieval", // brute leg's 8-query broadcast cross + bm25 scalar
    "q_text_unigram", // single-row total-tokens scalar
    "q_lm_perplexity", // single-row vocabulary-size scalar
    "q_corpus_stats", // single-row corpus totals
    "q_corpus_drift", // single-row totals broadcast cross
    "q_sketch_overlap", // segment pair matrix: one KB sketch row per
    // segment, O(segments^2) pairs by design — data-sized sets never join
  )

  test("no accidental nested-loop or cartesian joins in any query") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sf).queryExecution.sparkPlan.toString
      val bad = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      if (bad && !allowedNestedLoop.contains(q.name)) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop/cartesian in: ${offenders.mkString(", ")} — " +
        "either give the join an equi key (explode the window offsets, " +
        "bin the range) or add it to the allowlist with a justification")
  }

  test("no unpartitioned window carries wide payloads (array/binary/" +
      "struct) unless its input is limit-bounded") {
    // An unpartitioned Window funnels ALL rows through one task's
    // sort. That is fine for narrow rows on a bounded axis (per-day
    // scalars, bare hour strings) but a serial GB-scale stage the
    // moment the payload is a sketch/vector/struct column and the
    // ordering axis grows with the data: q_sketch_rolling_distinct
    // planned exactly that and cost 1.29 GB through one thread at the
    // 100x decade before its r9 rewrite. Guard the whole registry:
    // wide-typed columns may only enter an unpartitioned window below
    // an explicit Limit (e.g. the k<=256 PQ codebook seed ranking).
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan, UnaryNode, Window => LWindow}
    import org.apache.spark.sql.types.{ArrayType, BinaryType, StructType}
    def wide(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: ArrayType | _: StructType | BinaryType => true
      case _ => false
    }
    // the limit must bound the window's OWN row count: walk the direct
    // unary input chain only — a limit buried under one side of a join
    // below the window does not bound the other side's rows
    @scala.annotation.tailrec
    def limitBounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit => true
      case u: UnaryNode => limitBounded(u.child)
      case _ => false
    }
    val offenders = SparkEntry.registry.flatMap { q =>
      q.run(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.output.exists(a => wide(a.dataType)) &&
            !limitBounded(w.child) =>
          s"${q.name}[${w.child.output.filter(a => wide(a.dataType))
            .map(_.name).mkString(",")}]"
      }
    }
    assert(offenders.isEmpty,
      s"wide payload through a single-partition window in: " +
        s"${offenders.mkString(", ")} — rank the bare keys instead and " +
        "regroup the payload by target rank (see Sketches.rollingDistinct)")
  }
}
