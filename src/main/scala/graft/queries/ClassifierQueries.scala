package graft.queries

import graft.operators.{QualityClassifier, TextAnalysis}
import org.apache.spark.sql.functions._

/** Model-based quality filtering as oracle-gated queries: fit the
  * integer-quantized hashed linear classifier (closed-form count-ratio
  * weights + class-midpoint bias) on confident weak labels over the
  * TRAIN split (doc_id % 5 != 0), score the held-out EVAL split. The
  * DuckDB oracle replays the fit exactly — every count, truncating
  * division, and clamp in BIGINT — the same discipline as the Lloyd
  * k-means replay in AnnQueries.
  */
object ClassifierQueries {

  private val D = QualityClassifier.D
  private val Sm = QualityClassifier.Smooth

  private val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")

  /** Truncate-toward-zero division for DuckDB (its `//` floors;
    * Scala/Spark integral division truncates). `b` must be positive. */
  private def sdiv(a: String, b: String): String =
    s"(CASE WHEN $a >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END)"

  /** The full fit, as CTEs ending in `wall (f, wv)` = the D+1 weight
    * rows (bias at f = D). Mirrors [[QualityClassifier.train]] with
    * refineIters = 0 step for step. `cap` mirrors the fitCap argument:
    * the default leaves mod = 1 at gate scales; the capped queries
    * force mod > 1 so the down-sampling branch executes in BOTH
    * engines (never-run parity is no parity). */
  private def fitCtes(cap: Long = QualityClassifier.FitCap): String =
    s"""lab AS (SELECT doc_id,
       |    CASE WHEN s * 12 >= n AND n >= 20 THEN 1
       |         WHEN s * 24 <= n OR n < 20 THEN 0
       |         ELSE -1 END AS y
       |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS n,
       |          len(list_filter(string_split(text, ' '),
       |            x -> x IN ($stopList))) AS s
       |        FROM documents)),
       |conf0 AS (SELECT d.doc_id, d.text, lab.y,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words
       |  FROM documents d JOIN lab USING (doc_id)
       |  WHERE d.doc_id % 5 != 0 AND lab.y >= 0),
       |modv AS (SELECT min(CAST(1 AS BIGINT) << k) AS m
       |  FROM range(0, 41) t(k)
       |  WHERE (SELECT count(*) FROM conf0) // (CAST(1 AS BIGINT) << k)
       |        <= $cap),
       |conf AS (SELECT conf0.* FROM conf0
       |  WHERE ('0x' || substr(md5('fit:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |        % (SELECT m FROM modv) = 0),
       |tok AS (SELECT doc_id, y, unnest(string_split(text, ' ')) AS w
       |  FROM conf),
       |clsraw AS (SELECT CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % $D AS INT) AS f,
       |    CAST(sum(y) AS BIGINT) AS c1r, CAST(sum(1 - y) AS BIGINT) AS c0r
       |  FROM tok GROUP BY 1),
       |cls AS (SELECT b.f, coalesce(c1r, 0) + $Sm AS c1,
       |    coalesce(c0r, 0) + $Sm AS c0
       |  FROM (SELECT CAST(unnest(range(0, $D)) AS INT) AS f) b
       |  LEFT JOIN clsraw USING (f)),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS m1,
       |    CAST(sum(c0) AS BIGINT) AS m0 FROM cls),
       |wf AS (SELECT f,
       |    CAST(${sdiv("1000000 * (r1 - r0)", "r1 + r0 + 1")} AS BIGINT) AS wv
       |  FROM (SELECT f, ${sdiv("1000000000 * c1", "m1")} AS r1,
       |          ${sdiv("1000000000 * c0", "m0")} AS r0
       |        FROM cls CROSS JOIN tot)),
       |cnt AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % $D AS INT) AS f,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |zd AS (SELECT cnt.doc_id, conf.y,
       |    ${sdiv("sum(wf.wv * cnt.c)", "any_value(conf.n_words)")} AS z
       |  FROM cnt JOIN wf USING (f) JOIN conf USING (doc_id)
       |  GROUP BY cnt.doc_id, conf.y),
       |zm AS (SELECT y, ${sdiv("CAST(sum(z) AS BIGINT)", "count(*)")} AS mz
       |  FROM zd GROUP BY y),
       |bias AS (SELECT CAST(-${sdiv("(SELECT mz FROM zm WHERE y = 1) + (SELECT mz FROM zm WHERE y = 0)", "2")} AS BIGINT) AS b),
       |wall AS (SELECT f, wv FROM wf
       |  UNION ALL SELECT $D, b FROM bias)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_quality_clf_train",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
          .where(col("doc_id") % 5 =!= 0)
        val w = QualityClassifier.train(docs)
        import s.implicits._
        w.zipWithIndex.map { case (wv, f) => (f, wv) }.toSeq
          .toDF("f", "weight_micro")
      },
      Some(s"""WITH ${fitCtes()}
              |SELECT f, wv AS weight_micro FROM wall""".stripMargin),
    ),

    // FitCap down-sampling, EXECUTED: at gate scales the confident
    // count sits far under the production cap (mod = 1, branch dead in
    // both engines), so these two force cap = 64 — mod = 4 at
    // sf0.001/sf0.01, mod = 64 at sf0.1 — and oracle-check first the
    // selected sample itself, then the weights fitted from it. A branch
    // both engines merely CLAIM to share is not parity until it runs.
    QueryDef(
      "q_quality_clf_sample",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
          .where(col("doc_id") % 5 =!= 0)
        QualityClassifier.fitSample(docs, fitCap = ClfParams.ForcedFitCap)
          .select(col("doc_id"),
            QualityClassifier.marginLabel(col("text")).cast("long").as("y"))
      },
      Some(s"""WITH ${fitCtes(ClfParams.ForcedFitCap)}
              |SELECT doc_id, CAST(y AS BIGINT) AS y FROM conf""".stripMargin),
    ),

    QueryDef(
      "q_quality_clf_train_capped",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
          .where(col("doc_id") % 5 =!= 0)
        val w = QualityClassifier.train(docs, fitCap = ClfParams.ForcedFitCap)
        import s.implicits._
        w.zipWithIndex.map { case (wv, f) => (f, wv) }.toSeq
          .toDF("f", "weight_micro")
      },
      Some(s"""WITH ${fitCtes(ClfParams.ForcedFitCap)}
              |SELECT f, wv AS weight_micro FROM wall""".stripMargin),
    ),

    QueryDef(
      "q_quality_clf_score",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val w = QualityClassifier.train(docs.where(col("doc_id") % 5 =!= 0))
        QualityClassifier.score(docs.where(col("doc_id") % 5 === 0), w)
      },
      Some(s"""WITH ${fitCtes()},
              |evd AS (SELECT doc_id, text,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
              |  FROM documents WHERE doc_id % 5 = 0),
              |evc AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % $D AS INT) AS f,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM evd)
              |  GROUP BY 1, 2),
              |zs AS (SELECT evc.doc_id,
              |    ${sdiv("sum(wf.wv * evc.c)", "any_value(evd.n_words)")} + (SELECT b FROM bias) AS z
              |  FROM evc JOIN wf USING (f) JOIN evd USING (doc_id)
              |  GROUP BY evc.doc_id),
              |ps AS (SELECT doc_id,
              |    CAST(least(1000000, greatest(0, 500000 + ${sdiv("z", "4")})) AS BIGINT) AS p_micro
              |  FROM zs)
              |SELECT ps.doc_id, ps.p_micro,
              |  CAST(CASE WHEN ps.p_micro >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS pred,
              |  CAST(lab.y AS BIGINT) AS y
              |FROM ps JOIN lab USING (doc_id)""".stripMargin),
    ),

    // Threshold sweep on the held-out confident docs: the
    // precision/recall operating table a deployment picks its filter
    // threshold from. Counts are exact integers; the ppm ratios are
    // integer divisions, so the whole table is hash-stable.
    QueryDef(
      "q_quality_clf_pr",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val w = QualityClassifier.train(docs.where(col("doc_id") % 5 =!= 0))
        val scored = QualityClassifier
          .score(docs.where(col("doc_id") % 5 === 0), w)
          .where(col("y") >= 0)
        scored
          .select(explode(typedlit(ClfParams.PrThresholds)).as("threshold"),
            col("p_micro"), col("y"))
          .groupBy("threshold").agg(
            sum(when(col("p_micro") >= col("threshold") && col("y") === 1, 1L)
              .otherwise(0L)).as("tp"),
            sum(when(col("p_micro") >= col("threshold") && col("y") === 0, 1L)
              .otherwise(0L)).as("fp"),
            sum(when(col("p_micro") < col("threshold") && col("y") === 1, 1L)
              .otherwise(0L)).as("fn"))
          .select(col("threshold"), col("tp"), col("fp"), col("fn"),
            when(col("tp") + col("fp") > 0,
              (lit(1000000L) * col("tp") - (lit(1000000L) * col("tp"))
                % (col("tp") + col("fp"))) / (col("tp") + col("fp")))
              .otherwise(lit(0L)).cast("long").as("precision_ppm"),
            when(col("tp") + col("fn") > 0,
              (lit(1000000L) * col("tp") - (lit(1000000L) * col("tp"))
                % (col("tp") + col("fn"))) / (col("tp") + col("fn")))
              .otherwise(lit(0L)).cast("long").as("recall_ppm"))
      },
      Some(s"""WITH ${fitCtes()},
              |evd AS (SELECT doc_id, text,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
              |  FROM documents WHERE doc_id % 5 = 0),
              |evc AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % $D AS INT) AS f,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM evd)
              |  GROUP BY 1, 2),
              |zs AS (SELECT evc.doc_id,
              |    ${sdiv("sum(wf.wv * evc.c)", "any_value(evd.n_words)")} + (SELECT b FROM bias) AS z
              |  FROM evc JOIN wf USING (f) JOIN evd USING (doc_id)
              |  GROUP BY evc.doc_id),
              |sc AS (SELECT ps.doc_id,
              |    CAST(least(1000000, greatest(0, 500000 + ${sdiv("z", "4")})) AS BIGINT) AS p_micro,
              |    lab.y
              |  FROM zs ps JOIN lab USING (doc_id) WHERE lab.y >= 0),
              |th AS (SELECT CAST(unnest(${ClfParams.PrThresholds.mkString("[", ", ", "]")}) AS BIGINT) AS threshold),
              |agg AS (SELECT threshold,
              |    CAST(sum(CASE WHEN p_micro >= threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              |    CAST(sum(CASE WHEN p_micro >= threshold AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              |    CAST(sum(CASE WHEN p_micro < threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
              |  FROM sc CROSS JOIN th GROUP BY threshold)
              |SELECT threshold, tp, fp, fn,
              |  CAST(CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp) ELSE 0 END AS BIGINT) AS precision_ppm,
              |  CAST(CASE WHEN tp + fn > 0 THEN (1000000 * tp) // (tp + fn) ELSE 0 END AS BIGINT) AS recall_ppm
              |FROM agg""".stripMargin),
    ),

    // Classifier-driven corpus selection — the GPT-3 recipe
    // (high-scoring docs kept outright, the rest importance-sampled
    // with probability proportional to score), determinized: the
    // "coin" is a per-doc md5 hash compared against p_micro, so the
    // same doc always draws the same fate and the oracle replays it.
    // Composes the deploy-path scoring with corpus construction; the
    // whole query stays scan-local per doc (no shuffle before the
    // final projection).
    QueryDef(
      "q_corpus_filter_clf",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val w = QualityClassifier.train(docs.where(col("doc_id") % 5 =!= 0))
        val u = pmod(graft.operators.Dedup.md5Hash32(
          concat(lit("sel:"), col("doc_id").cast("string"))), lit(1000000L))
        QualityClassifier.score(docs, w)
          .select(col("doc_id"), col("p_micro"),
            when(col("p_micro") >= ClfParams.KeepThreshold, lit("kept"))
              .when(u < col("p_micro"), lit("sampled"))
              .otherwise(lit("dropped")).as("fate"))
          .where(col("fate") =!= "dropped")
      },
      Some(s"""WITH ${fitCtes()},
              |alld AS (SELECT doc_id, text,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
              |  FROM documents),
              |alc AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % $D AS INT) AS f,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM alld)
              |  GROUP BY 1, 2),
              |zs AS (SELECT alc.doc_id,
              |    ${sdiv("sum(wf.wv * alc.c)", "any_value(alld.n_words)")} + (SELECT b FROM bias) AS z
              |  FROM alc JOIN wf USING (f) JOIN alld USING (doc_id)
              |  GROUP BY alc.doc_id),
              |sc AS (SELECT doc_id,
              |    CAST(least(1000000, greatest(0, 500000 + ${sdiv("z", "4")})) AS BIGINT) AS p_micro
              |  FROM zs),
              |sel AS (SELECT doc_id, p_micro,
              |    CASE WHEN p_micro >= ${ClfParams.KeepThreshold} THEN 'kept'
              |         WHEN ('0x' || substr(md5('sel:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 < p_micro
              |         THEN 'sampled' ELSE 'dropped' END AS fate
              |  FROM sc)
              |SELECT doc_id, p_micro, fate FROM sel WHERE fate != 'dropped'""".stripMargin),
    ),
  )
}

/** Sweep/selection constants shared by the queries and the oracle. */
object ClfParams {
  /** PR-curve operating points (micro-units). */
  val PrThresholds: Seq[Long] =
    Seq(100000L, 300000L, 500000L, 700000L, 900000L)

  /** Docs at or above this score are kept outright; below it they are
    * importance-sampled with probability p_micro / 1e6. */
  val KeepThreshold = 700000L

  /** Tiny cap for the q_quality_clf_sample/_train_capped queries: small
    * enough to force mod > 1 at every gate scale (confident-train
    * counts: 217 at sf0.001 -> mod 4, 227 at sf0.01 -> mod 4, 2414 at
    * sf0.1 -> mod 64), large enough that both classes survive sampling
    * at each (31/30, 15/34, 11/17 pos/neg — a one-class sample would
    * NULL the oracle's bias midpoint). */
  val ForcedFitCap = 64L
}
