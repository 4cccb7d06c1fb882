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
    * refineIters = 0 step for step. */
  private def fitCtes: String =
    s"""lab AS (SELECT doc_id,
       |    CASE WHEN s * 12 >= n AND n >= 20 THEN 1
       |         WHEN s * 24 <= n OR n < 20 THEN 0
       |         ELSE -1 END AS y
       |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS n,
       |          len(list_filter(string_split(text, ' '),
       |            x -> x IN ($stopList))) AS s
       |        FROM documents)),
       |conf AS (SELECT d.doc_id, d.text, lab.y,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words
       |  FROM documents d JOIN lab USING (doc_id)
       |  WHERE d.doc_id % 5 != 0 AND lab.y >= 0),
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
      Some(s"""WITH $fitCtes
              |SELECT f, wv AS weight_micro FROM wall""".stripMargin),
    ),

    QueryDef(
      "q_quality_clf_score",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val w = QualityClassifier.train(docs.where(col("doc_id") % 5 =!= 0))
        QualityClassifier.score(docs.where(col("doc_id") % 5 === 0), w)
      },
      Some(s"""WITH $fitCtes,
              |evd AS (SELECT doc_id, text,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
              |  FROM documents WHERE doc_id % 5 = 0),
              |evc AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8))::BIGINT % $D AS INT) AS f,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM evd)
              |  GROUP BY 1, 2),
              |zs AS (SELECT evc.doc_id,
              |    ${sdiv("sum(wf.wv * evc.c) + (SELECT b FROM bias)", "any_value(evd.n_words)")} AS z
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
  )
}
