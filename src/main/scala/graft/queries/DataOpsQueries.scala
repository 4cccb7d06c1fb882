package graft.queries

import graft.operators.{AsOfJoin, Dedup, Multimodal, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators (dedup, similarity, text analysis)
  * over the `documents` and `embeddings` tables, each with a DuckDB
  * oracle. Shingle hashing is md5-prefix based and substring-window
  * hashing is the polynomial rolling hash ([[duckRollHash]]) so both
  * engines compute identical integers; float cosines are rounded to 4
  * decimals after double-precision math on both sides.
  */
object DataOpsQueries {

  private val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")

  /** DuckDB shingle-set CTE fragment (3-gram, distinct, lowercased) —
    * mirrors [[Dedup.shingles]]. `src` is the source relation (a table
    * name or an aliased subquery). */
  private def duckShinglesFrom(src: String) =
    s"""w AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws FROM $src),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
       |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s FROM w)""".stripMargin

  private val duckShingles = duckShinglesFrom("documents")

  private def duckShingleHashesFrom(src: String) =
    s"""${duckShinglesFrom(src)},
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |hs AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM ex)"""
      .stripMargin

  private val duckShingleHashes = duckShingleHashesFrom("documents")

  /** DuckDB mirror of [[graft.functions.WindowHashExpr]]'s polynomial
    * window hash at character position `pos` of normalized text `t`:
    * fold `(acc*31 + codepoint) mod 2^62` over the k-codepoint window
    * (shorter at the tail only when the whole string is shorter than k;
    * the empty string hashes to 0 — list_reduce rejects empty lists, so
    * that case is guarded explicitly). Codepoints cast to HUGEINT so
    * `acc*31 + c` (< 2^67) never overflows DuckDB's checked BIGINT;
    * the mod-2^62 result is BIGINT-representable, matching the
    * kernel's non-negative long. 62 bits, not 32: the sf100d rehearsal
    * measured quadratic birthday-collision growth in the 32-bit space
    * (see RollingHash.scala). ONE generator-equivalent definition
    * substituted into every substring oracle, so the oracles check the
    * hash definition once, not three transcriptions. */
  private def duckRollHash(k: Int, t: String = "t", pos: String = "pos") =
    s"CASE WHEN len($t) = 0 THEN 0 ELSE CAST(list_reduce(" +
      s"list_transform(range($pos, least($pos + $k, len($t) + 1)), " +
      s"j -> CAST(unicode(substr($t, j, 1)) AS HUGEINT)), " +
      s"(acc, c) -> (acc * 31 + c) % 4611686018427387904) AS BIGINT) END"

  /** MinHash signature CTE for any K — the coefficient list comes from
    * the SAME generator the Spark operator uses
    * ([[Dedup.minHashCoeffs]]), so both engines hash identically at
    * k=8 and k=64 alike. */
  private def duckMinhashSigK(k: Int, src: String = "documents") = {
    val mins = Dedup.minHashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % ${Dedup.MinHashPrime}) AS m$i"
    }.mkString(", ")
    s"""${duckShingleHashesFrom(src)},
       |sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id)""".stripMargin
  }

  /** MinHash LSH candidate pairs (id1 < id2) — mirrors
    * [[Dedup.minHashCandidates]] for any (k, bands). */
  private def duckMinhashCandK(k: Int, bands: Int) = {
    val rpb = k / bands
    val bandRows = (0 until bands).map { b =>
      val key = (0 until rpb).map(r => s"CAST(m${b * rpb + r} AS STRING)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    s"""${duckMinhashSigK(k)},
       |buckets AS ($bandRows),
       |cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |  FROM buckets l JOIN buckets r
       |  ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)"""
      .stripMargin
  }

  /** Shared with [[CorpusQueries]] (the near-dup pipeline variant
    * reuses the same candidate CTE and its `hs` shingle hashes). */
  private[queries] val duckMinhashCand = duckMinhashCandK(8, 4)

  /** Events with second-truncated timestamps: sub-second precision
    * differs between the engines (Spark micros vs DuckDB nanos), so
    * as-of comparisons must happen at a shared granularity. */
  private def eventsSec(s: SparkSession, d: String) =
    QueryDef.loadEvents(s, d).withColumn("ts", date_trunc("second", col("ts")))

  val all: Seq[QueryDef] = Seq(

    // As-of join: each purchase matched to the user's most recent
    // prior-or-same-second click (sort-based composition, one shuffle).
    QueryDef(
      "q_asof_join",
      (s, d) => {
        val ev = eventsSec(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("ts")).orderBy(col("click_id").desc)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"),
            col("event_id").as("click_id"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        AsOfJoin.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
            Seq("value", "click_id"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
            col("asof_value"), col("asof_click_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts
             |  FROM events WHERE event_type = 'purchase'),
             |c0 AS (SELECT user_id, date_trunc('second', ts) AS ts, value,
             |  event_id AS click_id,
             |  ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('second', ts)
             |    ORDER BY event_id DESC) AS rn
             |  FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             | strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             | strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
             | c.value AS asof_value, c.click_id AS asof_click_id
             |FROM p ASOF LEFT JOIN
             | (SELECT user_id, ts, value, click_id FROM c0 WHERE rn = 1) c
             | ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),
    ),

    // The SAME as-of join through the native sorted-merge physical
    // node (AsOfJoinExec — custom LogicalPlan + Strategy + SparkPlan)
    // instead of the union-window composition; same DuckDB oracle.
    QueryDef(
      "q_asof_join_exec",
      (s, d) => {
        val ev = eventsSec(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("ts")).orderBy(col("click_id").desc)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"),
            col("event_id").as("click_id"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        AsOfJoin.asOfJoinMerge(purchases, clicks, Seq("user_id"), "ts", "ts",
            Seq("value", "click_id"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_ts"),
            col("asof_value"), col("asof_click_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts
             |  FROM events WHERE event_type = 'purchase'),
             |c0 AS (SELECT user_id, date_trunc('second', ts) AS ts, value,
             |  event_id AS click_id,
             |  ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('second', ts)
             |    ORDER BY event_id DESC) AS rn
             |  FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             | strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             | strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
             | c.value AS asof_value, c.click_id AS asof_click_id
             |FROM p ASOF LEFT JOIN
             | (SELECT user_id, ts, value, click_id FROM c0 WHERE rn = 1) c
             | ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin),
    ),

    // Multimodal plumbing: binary payload + typed metadata; the decode
    // runs the real partition-batched machinery (stub codec), and the
    // oracle checks its integer outputs (dims derive from byte length).
    QueryDef(
      "q_multimodal_meta",
      (s, d) => Multimodal.asMediaTable(
        QueryDef.load(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("meta.media_type").as("media_type"),
          col("meta.byte_len").as("byte_len"),
          col("meta.content_hash").as("content_hash")),
      Some("""SELECT doc_id, 'image/stub' AS media_type,
             | octet_length(encode(text)) AS byte_len, md5(text) AS content_hash
             |FROM documents""".stripMargin),
    ),

    QueryDef(
      "q_multimodal_decode",
      (s, d) => Multimodal.decode(s,
        Multimodal.asMediaTable(QueryDef.load(s, d, "documents"), "doc_id", "text"))
        .select(col("doc_id"), col("media_type"), col("byte_len"),
          col("width"), col("height")),
      Some("""SELECT doc_id, 'image/stub' AS media_type,
             | octet_length(encode(text)) AS byte_len,
             | 16 + octet_length(encode(text)) % 64 AS width,
             | 16 + (octet_length(encode(text)) // 64) % 64 AS height
             |FROM documents""".stripMargin),
    ),

    // Aspect-preserving resize planning: decode dims -> target-128
    // output dims as scan-local integer math. The oracle recomputes
    // the whole decode+resize chain from byte lengths.
    QueryDef(
      "q_multimodal_resize",
      (s, d) => Multimodal.decode(s,
        Multimodal.asMediaTable(QueryDef.load(s, d, "documents"), "doc_id", "text"))
        .select(col("doc_id"), col("width"), col("height"),
          Multimodal.resizeDims(col("width"), col("height"), 64).as("rs"))
        .select(col("doc_id"), col("width"), col("height"),
          col("rs.out_w").as("out_w"), col("rs.out_h").as("out_h")),
      Some("""WITH dims AS (SELECT doc_id,
             |  16 + octet_length(encode(text)) % 64 AS width,
             |  16 + (octet_length(encode(text)) // 64) % 64 AS height
             |  FROM documents)
             |SELECT doc_id, width, height,
             | CASE WHEN greatest(width, height) <= 64 THEN width
             |   ELSE greatest(1, CAST(floor(width * 64 / greatest(width, height))
             |     AS BIGINT)) END AS out_w,
             | CASE WHEN greatest(width, height) <= 64 THEN height
             |   ELSE greatest(1, CAST(floor(height * 64 / greatest(width, height))
             |     AS BIGINT)) END AS out_h
             |FROM dims""".stripMargin),
    ),

    // Frame-sampling plumbing for video-like payloads: every 2nd chunk
    // index, exploded to rows (one row per sampled frame) so the
    // downstream decode fans out per frame.
    QueryDef(
      "q_multimodal_frames",
      (s, d) => Multimodal.asMediaTable(
          QueryDef.load(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"),
          explode(Multimodal.frameSampleIndexes(col("meta.byte_len"),
            chunk = 256, stride = 2)).as("frame_idx")),
      Some("""WITH m AS (SELECT doc_id, octet_length(encode(text)) AS byte_len
             |  FROM documents),
             |idx AS (SELECT doc_id,
             |  unnest(range(0, greatest(byte_len // 256 - 1, 0) + 1)) AS frame_idx
             |  FROM m)
             |SELECT doc_id, frame_idx FROM idx WHERE frame_idx % 2 = 0"""
        .stripMargin),
    ),

    QueryDef(
      "q_text_tokens",
      (s, d) => QueryDef.load(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len_chars")),
      Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             | length(text) AS len_chars FROM documents""".stripMargin),
    ),

    QueryDef(
      "q_text_quality",
      (s, d) => QueryDef.load(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        TextAnalysis.stopwordHits(col("text")).as("stop_hits"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      Some(s"""WITH t AS (SELECT doc_id,
              |  len(string_split(text, ' ')) AS n_words,
              |  len(list_filter(string_split(text, ' '),
              |      x -> x IN ($stopList))) AS stop_hits
              |  FROM documents)
              |SELECT doc_id, n_words, stop_hits,
              | round(least(1.0, n_words / 50.0) *
              |   (1.0 - stop_hits / CAST(n_words AS DOUBLE)), 6) AS quality
              |FROM t""".stripMargin),
    ),

    QueryDef(
      "q_text_langid",
      // staged: tokenize ONCE as an attribute, count each language's
      // marker hits ONCE as attributes, then run the argmax fold over
      // those — the single-Column langId(text) re-splits the text per
      // language and re-evaluates each filter at every fold reference
      // (HOFs are outside codegen subexpression elimination)
      (s, d) => {
        val hits = TextAnalysis.languageHits(col("__t"))
        QueryDef.load(s, d, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__t"))
          .select(col("doc_id") +:
            hits.map { case (lang, c) => c.as(s"__h_$lang") }: _*)
          .select(col("doc_id"), TextAnalysis.langIdFromHits(
            hits.map { case (lang, _) => lang -> col(s"__h_$lang") })
            .as("lang_guess"))
      },
      Some {
        val hits = TextAnalysis.languageMarkers.toSeq.sortBy(_._1)
          .map { case (lang, markers) =>
            val list = markers.map(m => s"'$m'").mkString(", ")
            s"len(list_filter(string_split(lower(text), ' '), x -> x IN ($list))) AS ${lang}_hits"
          }.mkString(",\n  ")
        // fold order matches langId: start at 'de', strictly-greater wins.
        s"""WITH t AS (SELECT doc_id, $hits FROM documents)
           |SELECT doc_id,
           | CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
           |      WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
           |      WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
           |      WHEN es_hits >= fr_hits THEN 'es'
           |      ELSE 'fr' END AS lang_guess
           |FROM t""".stripMargin
      },
    ),

    // Repetition + punctuation density quality metrics.
    QueryDef(
      "q_text_repetition",
      (s, d) => QueryDef.load(s, d, "documents")
        .select(col("doc_id"), col("text"),
          Dedup.words(col("text")).as("__ws"))
        .select(col("doc_id"),
          TextAnalysis.repetitionRatio(col("__ws")).as("rep_ratio"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio")),
      Some(s"""WITH $duckShingles
              |SELECT w.doc_id,
              | round(1.0 - CAST(len(sh.s) AS DOUBLE) /
              |   greatest(len(w.ws) - 2, 1), 6) AS rep_ratio,
              | round(CAST(len(regexp_extract_all(d.text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) /
              |   greatest(length(d.text), 1), 6) AS punct_ratio
              |FROM documents d JOIN w ON w.doc_id = d.doc_id
              |JOIN sh ON sh.doc_id = d.doc_id""".stripMargin),
    ),

    // BPE-ish regex pre-tokenization (words | numbers | single symbols).
    QueryDef(
      "q_text_tokens_bpe",
      // REAL merge-table BPE (48 merges trained by the embedded
      // Sennrich trainer): both engines apply the identical merge list
      // as a generated replace() chain over the US/RS symbol-string
      // encoding — see TextAnalysis.bpeMerged. Token counts therefore
      // track an actual trained tokenizer, not a pre-tokenizer regex.
      (s, d) => QueryDef.load(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens")),
      Some(s"""SELECT doc_id,
              | ${TextAnalysis.bpeTokenCountSql("text")} AS n_bpe_tokens
              |FROM documents""".stripMargin),
    ),

    // Subword vocabulary building: corpus-wide frequency of the REAL
    // BPE tokens (explode -> count -> top 30, deterministic tie-break).
    // TakeOrderedAndProject on the Spark side — no global sort.
    QueryDef(
      "q_text_bpe_vocab",
      (s, d) => QueryDef.load(s, d, "documents")
        .select(explode(TextAnalysis.bpeTokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30),
      Some(s"""WITH tok AS (SELECT unnest(${TextAnalysis.bpeTokensSql("text")})
              |  AS token FROM documents)
              |SELECT token, CAST(count(*) AS BIGINT) AS n
              |FROM tok GROUP BY token
              |ORDER BY n DESC, token LIMIT 30""".stripMargin),
    ),

    QueryDef(
      "q_text_fingerprint",
      (s, d) => QueryDef.load(s, d, "documents").select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
             | md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
             |FROM documents""".stripMargin),
    ),

    QueryDef(
      "q_dedup_exact",
      (s, d) => Dedup.exactDedupGroups(
        QueryDef.load(s, d, "documents"), "text", "doc_id"),
      Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
             | min(doc_id) AS canonical_id, count(*) AS n_copies
             |FROM documents GROUP BY 1""".stripMargin),
    ),

    QueryDef(
      "q_dedup_jaccard",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val pairs = docs.select(col("doc_id").as("id1"),
          (col("doc_id") + 1).as("id2"))
        Dedup.jaccardForPairs(pairs, docs, "text", "doc_id")
      },
      Some(s"""WITH $duckShingles
              |SELECT a.doc_id AS id1, b.doc_id AS id2,
              | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
              |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin),
    ),

    // Asymmetric containment (|A∩B|/|A|, /|B|) over adjacent-id pairs:
    // the quoted/wrapped-copy detector symmetric Jaccard misses.
    QueryDef(
      "q_dedup_containment",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val pairs = docs.select(col("doc_id").as("id1"),
          (col("doc_id") + 1).as("id2"))
        Dedup.containmentForPairs(pairs, docs, "text", "doc_id")
      },
      Some(s"""WITH $duckShingles
              |SELECT a.doc_id AS id1, b.doc_id AS id2,
              | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              |   len(a.s), 6) AS contain_1_in_2,
              | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              |   len(b.s), 6) AS contain_2_in_1
              |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin),
    ),

    QueryDef(
      "q_dedup_minhash",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.jaccardForPairs(
          Dedup.minHashCandidates(docs, "text", "doc_id"), docs, "text", "doc_id")
      },
      Some(s"""WITH $duckMinhashCand
              |SELECT c.id1, c.id2,
              | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
              |FROM cand c JOIN sh a ON a.doc_id = c.id1 JOIN sh b ON b.doc_id = c.id2"""
        .stripMargin),
    ),

    // Production-scale MinHash config: 64 permutations in 16 bands of
    // 4 rows — the LSH similarity threshold curve s ≈ (1/b)^(1/r)
    // lands near 0.5 with a much sharper cutoff than k=8 can express.
    // Coefficients beyond the 8 historical constants come from the
    // seeded splitmix64 family (no silent truncation at k > 8); the
    // oracle SQL is generated from the SAME coefficient list.
    QueryDef(
      "q_dedup_minhash64",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.jaccardForPairs(
          Dedup.minHashCandidates(docs, "text", "doc_id", k = 64, bands = 16),
          docs, "text", "doc_id")
      },
      Some(s"""WITH ${duckMinhashCandK(64, 16)}
              |SELECT c.id1, c.id2,
              | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
              |FROM cand c JOIN sh a ON a.doc_id = c.id1 JOIN sh b ON b.doc_id = c.id2"""
        .stripMargin),
    ),

    // Cross-corpus NEAR-dup detection (incremental ingest): an
    // incoming batch — fresh docs plus 50 re-ingested copies under new
    // ids — LSH-banded against the EXISTING corpus's signature index,
    // then exact-Jaccard verified. The near-dup generalization of
    // q_dedup_cross (which only catches byte-identical text): the
    // incoming batch joins the precomputed banded index by (band,
    // key), never corpus x batch.
    QueryDef(
      "q_dedup_cross_minhash",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val existing = docs.filter(col("doc_id") < 250)
        val incoming = docs.filter(col("doc_id") >= 250)
          .unionByName(docs.filter(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + 10000))
        Dedup.nearDupsCross(incoming, existing, "text", "doc_id",
          threshold = 0.5)
      },
      Some {
        val src = """(SELECT doc_id, text FROM documents WHERE doc_id >= 250
                    | UNION ALL SELECT doc_id + 10000 AS doc_id, text
                    |   FROM documents WHERE doc_id < 50
                    | UNION ALL SELECT doc_id, text FROM documents
                    |   WHERE doc_id < 250) AS src""".stripMargin
        val bandRows = (0 until 4).map { b =>
          val key = (0 until 2).map(r => s"CAST(m${b * 2 + r} AS STRING)")
            .mkString(" || '-' || ")
          s"SELECT doc_id, $b AS band, $key AS key FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH ${duckMinhashSigK(8, src)},
           |buckets AS ($bandRows),
           |cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
           |  FROM buckets l JOIN buckets r
           |  ON l.band = r.band AND l.key = r.key
           |  AND l.doc_id >= 250 AND r.doc_id < 250)
           |SELECT c.id1, c.id2,
           | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
           |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
           |FROM cand c JOIN sh a ON a.doc_id = c.id1 JOIN sh b ON b.doc_id = c.id2
           |WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
           |   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.5"""
          .stripMargin
      },
    ),

    // The INCREMENTAL ingest loop against a STANDING LSH index
    // (IncrementalDedup): the existing corpus is committed as a
    // snapshot-table signature index, then the incoming batch's
    // candidates are found by joining the COMMITTED index — no
    // re-shingling of the existing side — and must equal the
    // recompute-from-text oracle. NOTE for bench readers: the two
    // index commits execute at plan construction (eager, real disk
    // writes to a temp dir); per-pass timings see the index read +
    // band join, the deployment's per-ingest cost.
    QueryDef(
      "q_dedup_incremental",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val existing = docs.filter(col("doc_id") < 250)
        val incoming = docs.filter(col("doc_id") >= 250)
          .unionByName(docs.filter(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + 10000))
        val dir = java.nio.file.Files
          .createTempDirectory("graft-incdedup-q").toString
        graft.operators.IncrementalDedup.ingest(existing, dir,
          "text", "doc_id", nBuckets = 16)
        graft.operators.IncrementalDedup.ingest(incoming, dir,
          "text", "doc_id", nBuckets = 16)
      },
      Some {
        val src = """(SELECT doc_id, text FROM documents WHERE doc_id >= 250
                    | UNION ALL SELECT doc_id + 10000 AS doc_id, text
                    |   FROM documents WHERE doc_id < 50
                    | UNION ALL SELECT doc_id, text FROM documents
                    |   WHERE doc_id < 250) AS src""".stripMargin
        val bandRows = (0 until 4).map { b =>
          val key = (0 until 2).map(r => s"CAST(m${b * 2 + r} AS STRING)")
            .mkString(" || '-' || ")
          s"SELECT doc_id, $b AS band, $key AS key FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH ${duckMinhashSigK(8, src)},
           |buckets AS ($bandRows)
           |SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
           |  FROM buckets l JOIN buckets r
           |  ON l.band = r.band AND l.key = r.key
           |  AND l.doc_id >= 250 AND r.doc_id < 250""".stripMargin
      },
    ),

    // Connected-component cluster labels over the MinHash candidate
    // pairs — pairwise matches turned into dedup groups. The oracle
    // computes reachability with a recursive CTE; the Spark side runs
    // alternating large-star/small-star (O(log n) rounds vs
    // O(diameter) for min-label propagation, which remains available
    // as Dedup.dupClusters and oracle-gated via q_dedup_semantic).
    QueryDef(
      "q_dedup_clusters",
      // NOTE for bench readers: this operator is an iterative fixpoint
      // and therefore EAGER — the star rounds execute during plan
      // construction (with localCheckpoint lineage cuts), so per-pass
      // bench timings see only the final checkpointed read (~0.03 s);
      // the real cost (~4 s at sf0.1) is in the build, recorded in
      // PERF.md.
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.dupClustersStar(
          Dedup.minHashCandidates(docs, "text", "doc_id"), docs, "doc_id")
      },
      Some(s"""WITH RECURSIVE $duckMinhashCand,
              |edges AS (SELECT id1, id2 FROM cand
              |  UNION ALL SELECT id2, id1 FROM cand),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.id2, reach.r FROM reach JOIN edges e ON e.id1 = reach.id)
              |SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id"""
        .stripMargin),
    ),

    // Cluster-canonical selection — the dedup ENDPOINT: each doc mapped
    // to its near-dup cluster's best-quality member (ties -> smallest
    // id). Keeping `is_canonical = 1` rows IS the deduplicated corpus;
    // the mapping column supports reference redirection. The window
    // shuffles (id, cluster, score) triples only — text stays in the
    // scan.
    QueryDef(
      "q_dedup_canonical",
      // NOTE for bench readers: like q_dedup_clusters, the star-CC
      // labels subtree is eager (rounds execute at plan construction
      // with localCheckpoint lineage cuts), so per-pass timings see the
      // checkpointed read + the quality/window stages; the build cost
      // is measured in PERF.md's CcRounds table.
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val labels = Dedup.dupClustersStar(
          Dedup.minHashCandidates(docs, "text", "doc_id"), docs, "doc_id")
        val scored = docs.select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        Dedup.canonicalPerCluster(labels, scored, "doc_id", "q")
      },
      Some(s"""WITH RECURSIVE $duckMinhashCand,
              |edges AS (SELECT id1, id2 FROM cand
              |  UNION ALL SELECT id2, id1 FROM cand),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.id2, reach.r FROM reach JOIN edges e ON e.id1 = reach.id),
              |lab AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
              |sc AS (SELECT doc_id, round(least(1.0, n_words / 50.0) *
              |    (1.0 - stop_hits / CAST(n_words AS DOUBLE)), 6) AS q
              |  FROM (SELECT doc_id,
              |    len(string_split(text, ' ')) AS n_words,
              |    len(list_filter(string_split(text, ' '),
              |        x -> x IN ($stopList))) AS stop_hits
              |    FROM documents)),
              |ranked AS (SELECT l.doc_id, l.cluster, s.q,
              |  first_value(l.doc_id) OVER
              |    (PARTITION BY l.cluster ORDER BY s.q DESC, l.doc_id) AS canonical_id
              |  FROM lab l JOIN sc s USING (doc_id))
              |SELECT doc_id, cluster, q, canonical_id,
              |  CASE WHEN doc_id = canonical_id THEN 1 ELSE 0 END AS is_canonical
              |FROM ranked""".stripMargin),
    ),

    // Exact-substring duplication profile: per doc, the fraction of
    // its sampled 40-char windows that occur VERBATIM in another doc —
    // the boilerplate/licence-block/quoted-copy signal document-level
    // fingerprints miss (substring-level dedup a la "Deduplicating
    // Training Data"). Window selection is CONTENT-DEFINED (winnowed:
    // hash every position, keep h % 7 == 0), so a shared span is
    // detected at any byte offset — positional double-striding can
    // report 0 for a verbatim copy whose offset differs mod stride.
    // One shuffle on the selected 32-bit window hashes.
    QueryDef(
      "q_substring_dups",
      (s, d) => Dedup.substringDupProfile(
        QueryDef.load(s, d, "documents"), "text", "doc_id",
        k = 40, stride = 7, winnowed = true),
      Some(s"""WITH t AS (SELECT doc_id,
             |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
             |  FROM documents),
             |w AS (SELECT doc_id, t,
             |  unnest(range(1, greatest(len(t) - 39, 1) + 1)) AS pos
             |  FROM t),
             |hx AS (SELECT * FROM (SELECT doc_id, pos,
             |  ${duckRollHash(40)} AS h
             |  FROM w) WHERE h % 7 = 0),
             |sh AS (SELECT h FROM (
             |  SELECT h, count(DISTINCT doc_id) AS d FROM hx GROUP BY h)
             |  WHERE d >= 2),
             |p AS (SELECT hx.doc_id, count(*) AS n_windows,
             |  count(sh.h) AS n_shared
             |  FROM hx LEFT JOIN sh ON sh.h = hx.h
             |  GROUP BY hx.doc_id)
             |SELECT d.doc_id, coalesce(p.n_windows, 0) AS n_windows,
             | coalesce(p.n_shared, 0) AS n_shared,
             | CASE WHEN coalesce(p.n_windows, 0) = 0 THEN NULL
             |   ELSE round(CAST(p.n_shared AS DOUBLE) / p.n_windows, 6)
             | END AS dup_ratio
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN p ON p.doc_id = d.doc_id""".stripMargin),
    ),

    // Substring-level dup PAIRS: which documents share >= 3 winnowed
    // 40-char windows (rarer than df=50 — the document-frequency
    // stopword cut that stops ubiquitous boilerplate from creating a
    // quadratic bucket). The actionable form of the profile above.
    QueryDef(
      "q_substring_dup_pairs",
      (s, d) => Dedup.substringDupPairs(
        QueryDef.load(s, d, "documents"), "text", "doc_id",
        k = 40, stride = 7, minShared = 3, maxDf = 50),
      Some(s"""WITH t AS (SELECT doc_id,
             |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
             |  FROM documents),
             |w AS (SELECT doc_id, t,
             |  unnest(range(1, greatest(len(t) - 39, 1) + 1)) AS pos
             |  FROM t),
             |hx AS (SELECT DISTINCT doc_id, h FROM (SELECT doc_id,
             |  ${duckRollHash(40)} AS h
             |  FROM w) WHERE h % 7 = 0),
             |ok AS (SELECT h FROM (
             |  SELECT h, count(*) AS d FROM hx GROUP BY h)
             |  WHERE d BETWEEN 2 AND 50)
             |SELECT a.doc_id AS id1, b.doc_id AS id2,
             | CAST(count(*) AS BIGINT) AS n_shared
             |FROM hx a JOIN ok USING (h) JOIN hx b ON a.h = b.h
             |  AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin),
    ),

    // Substring-level decontamination: training docs (doc_id >= 10)
    // sharing a 40-char VERBATIM window with any benchmark doc
    // (doc_id < 10) — catches quoted fragments that word-shingle
    // decontamination misses. Train side winnowed at stride 7
    // (content-defined), eval side exhaustive and broadcast.
    QueryDef(
      "q_decontaminate_substring",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.substringContaminated(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10), "text", "doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
             |  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
             |  FROM documents),
             |trh AS (SELECT DISTINCT doc_id, h FROM (
             |  SELECT doc_id,
             |    ${duckRollHash(40)} AS h
             |  FROM (SELECT doc_id, t,
             |    unnest(range(1, greatest(len(t) - 39, 1) + 1)) AS pos
             |    FROM t WHERE doc_id >= 10))
             |  WHERE h % 7 = 0),
             |evh AS (SELECT DISTINCT
             |    ${duckRollHash(40)} AS h
             |  FROM (SELECT doc_id, t,
             |    unnest(range(1, greatest(len(t) - 39, 1) + 1)) AS pos
             |    FROM t WHERE doc_id < 10))
             |SELECT trh.doc_id, CAST(count(*) AS BIGINT) AS n_hits
             |FROM trh JOIN evh USING (h) GROUP BY 1""".stripMargin),
    ),

    // Test-set decontamination: training docs (doc_id >= 10) sharing
    // any 3-gram shingle with the "benchmark" docs (doc_id < 10).
    QueryDef(
      "q_decontaminate",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.contaminatedDocs(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10), "text", "doc_id")
      },
      Some(s"""WITH $duckShingleHashes,
              |ev AS (SELECT DISTINCT h FROM hs WHERE doc_id < 10)
              |SELECT hs.doc_id, count(DISTINCT hs.h) AS n_shared
              |FROM hs JOIN ev USING (h)
              |WHERE hs.doc_id >= 10 GROUP BY hs.doc_id""".stripMargin),
    ),

    // Cross-corpus exact dedup (incremental ingest): an incoming batch
    // — fresh docs plus 50 re-ingested copies of existing ones under
    // new ids — checked against the existing corpus by fingerprint;
    // only the re-ingested copies come back. Existing side reduces to
    // a distinct fingerprint set; left-semi join, fingerprints only.
    QueryDef(
      "q_dedup_cross",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val existing = docs.filter(col("doc_id") < 250)
        val incoming = docs.filter(col("doc_id") >= 250)
          .unionByName(docs.filter(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + 10000))
        Dedup.crossCorpusDups(incoming, existing, "text", "doc_id")
      },
      Some("""WITH f AS (SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
             |  FROM documents),
             |inc AS (SELECT doc_id, fp FROM f WHERE doc_id >= 250
             |  UNION ALL SELECT doc_id + 10000, fp FROM f WHERE doc_id < 50),
             |ex AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250)
             |SELECT inc.doc_id, inc.fp AS fingerprint
             |FROM inc JOIN ex ON inc.fp = ex.fp""".stripMargin),
    ),

    // Token-distribution Shannon entropy per doc (the low-diversity /
    // spam signal): per-term -p*ln(p) contributions quantized to
    // integer micro-nats BEFORE the per-doc sum (the q_text_unigram
    // exactness recipe — float summation order can never change the
    // result), one final /1e6.
    QueryDef(
      "q_text_entropy",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        val words = docs.select(col("doc_id"),
          split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
            .as("ws"))
        val toks = words.select(col("doc_id"), size(col("ws")).as("n"),
          explode(col("ws")).as("term"))
        toks.groupBy(col("doc_id"), col("n"), col("term"))
          .agg(count(lit(1)).as("c"))
          .withColumn("p", col("c").cast("double") / col("n"))
          .withColumn("__micro",
            round(col("p") * log(col("p")) * 1e6).cast("long"))
          .groupBy(col("doc_id"))
          .agg((-sum(col("__micro")) / 1e6).as("entropy"),
            countDistinct(col("term")).as("n_terms"))
      },
      Some("""WITH w AS (SELECT doc_id,
             |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
             |  FROM documents),
             |t AS (SELECT doc_id, len(ws) AS n, unnest(ws) AS term FROM w),
             |c AS (SELECT doc_id, n, term, count(*) AS c
             |  FROM t GROUP BY 1, 2, 3),
             |m AS (SELECT doc_id, term,
             |  CAST(round((CAST(c AS DOUBLE) / n) *
             |    ln(CAST(c AS DOUBLE) / n) * 1e6) AS BIGINT) AS micro
             |  FROM c)
             |SELECT doc_id, -CAST(sum(micro) AS DOUBLE) / 1e6 AS entropy,
             | count(DISTINCT term) AS n_terms
             |FROM m GROUP BY doc_id""".stripMargin),
    ),

    // Graded contamination: per-doc FRACTION of distinct shingles
    // shared with the eval set (thresholdable score; clean docs kept
    // at 0.0). One integer division per doc after exact BIGINT counts.
    QueryDef(
      "q_contamination_ratio",
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.contaminationScores(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10), "text", "doc_id")
      },
      Some(s"""WITH $duckShingleHashes,
              |dh AS (SELECT DISTINCT doc_id, h FROM hs),
              |ev AS (SELECT DISTINCT h FROM hs WHERE doc_id < 10)
              |SELECT dh.doc_id, count(*) AS n_shingles,
              | count(ev.h) AS n_shared,
              | round(CAST(count(ev.h) AS DOUBLE) / count(*), 6) AS score
              |FROM dh LEFT JOIN ev ON dh.h = ev.h
              |WHERE dh.doc_id >= 10 GROUP BY dh.doc_id""".stripMargin),
    ),

    // Deterministic hash-bucketed train/val/test split: stable across
    // runs/partitionings, identical bucketing on both engines.
    QueryDef(
      "q_split_assign",
      (s, d) => QueryDef.load(s, d, "documents").select(col("doc_id"),
        TextAnalysis.assignSplit(col("doc_id")).as("split")),
      Some("""SELECT doc_id,
             | CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |      ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |  ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
             |  FROM documents)""".stripMargin),
    ),

    // Leakage-safe split: near-duplicate documents must NEVER straddle
    // train/test — a near-dup of a test doc in the training set is eval
    // contamination the plain per-doc hash split cannot see. Split
    // assignment hashes the near-dup CLUSTER label (the star-CC over
    // MinHash candidates), so every member of a cluster lands in the
    // same split; singleton clusters degenerate to the per-doc split.
    QueryDef(
      "q_split_leakage_safe",
      // NOTE for bench readers: the star-CC labels subtree is eager
      // (rounds execute at plan construction — see q_dedup_clusters);
      // the build cost is measured in PERF.md's CcRounds table.
      (s, d) => {
        val docs = QueryDef.load(s, d, "documents")
        Dedup.dupClustersStar(
            Dedup.minHashCandidates(docs, "text", "doc_id"), docs, "doc_id")
          .select(col("doc_id"), col("cluster"),
            TextAnalysis.assignSplit(col("cluster")).as("split"))
      },
      Some(s"""WITH RECURSIVE $duckMinhashCand,
              |edges AS (SELECT id1, id2 FROM cand
              |  UNION ALL SELECT id2, id1 FROM cand),
              |reach(id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.id2, reach.r FROM reach JOIN edges e ON e.id1 = reach.id),
              |lab AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id)
              |SELECT doc_id, cluster,
              |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              |       ELSE 'test' END AS split
              |FROM (SELECT doc_id, cluster,
              |  ('0x' || substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
              |  FROM lab)""".stripMargin),
    ),

    // TF-IDF over whitespace-normalized lowercased tokens.
    QueryDef(
      "q_text_tfidf",
      (s, d) => TextAnalysis.tfIdf(QueryDef.load(s, d, "documents"),
        "text", "doc_id"),
      Some("""WITH w AS (SELECT doc_id,
             |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
             |  FROM documents),
             |toks AS (SELECT doc_id, len(ws) AS n_toks, unnest(ws) AS term FROM w),
             |tf AS (SELECT doc_id, term, count(*) AS tf_cnt, min(n_toks) AS n_toks
             |  FROM toks GROUP BY doc_id, term),
             |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
             |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
             |SELECT tf.doc_id, tf.term,
             | round(CAST(tf_cnt AS DOUBLE) / n_toks *
             |   ln(CAST(n_docs AS DOUBLE) / doc_freq), 6) AS tfidf
             |FROM tf JOIN dfq USING (term), nd""".stripMargin),
    ),

    // Tokenizer fertility (BPE tokens per whitespace word) by
    // language — the standard tokenizer-quality metric; a language
    // the merge table underserves shows fertility drift. Exact
    // integer sums, ONE division at the end.
    QueryDef(
      "q_bpe_fertility",
      (s, d) => QueryDef.load(s, d, "documents")
        .select(col("lang"),
          TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("words"))
        .groupBy("lang")
        .agg(sum(col("bpe")).as("bpe_tokens"), sum(col("words")).as("words"))
        .select(col("lang"), col("bpe_tokens"), col("words"),
          round(col("bpe_tokens") / col("words"), 6).as("fertility")),
      Some(s"""WITH t AS (SELECT lang,
              |  ${TextAnalysis.bpeTokenCountSql("text")} AS bpe,
              |  len(string_split(text, ' ')) AS words
              |  FROM documents),
              |g AS (SELECT lang, CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
              |  CAST(sum(words) AS BIGINT) AS words FROM t GROUP BY lang)
              |SELECT lang, bpe_tokens, words,
              |  round(bpe_tokens / words, 6) AS fertility FROM g"""
        .stripMargin),
    ),

    // BM25 ranked retrieval: top-k docs per keyword query, the
    // inverted-index join shape (only docs containing a query term are
    // scored). Scores are exact order-independent integer micro-unit
    // sums — see TextAnalysis.bm25TopK — so both engines rank
    // identically.
    QueryDef(
      "q_text_bm25",
      (s, d) => {
        import s.implicits._
        val qs = Seq((0L, "spark merge join"), (1L, "vector window stream"),
          (2L, "customer slow filter")).toDF("query_id", "qtext")
        TextAnalysis.bm25TopK(QueryDef.load(s, d, "documents"), qs,
          "text", "doc_id", "query_id", "qtext", k = 10)
      },
      Some("""WITH q(query_id, qtext) AS (VALUES
             |  (CAST(0 AS BIGINT), 'spark merge join'),
             |  (1, 'vector window stream'),
             |  (2, 'customer slow filter')),
             |w AS (SELECT doc_id,
             |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
             |  FROM documents),
             |toks AS (SELECT doc_id, len(ws) AS n_toks, unnest(ws) AS term FROM w),
             |tf AS (SELECT doc_id, term, count(*) AS tf_cnt, min(n_toks) AS n_toks
             |  FROM toks GROUP BY doc_id, term),
             |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
             |st AS (SELECT count(*) AS n_docs, CAST(sum(len(ws)) AS BIGINT) AS sum_dl FROM w),
             |qt AS (SELECT query_id, unnest(list_distinct(
             |  string_split(trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')), ' '))) AS term
             |  FROM q),
             |c AS (SELECT qt.query_id, tf.doc_id,
             |  CAST(round(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             |    * (tf_cnt * 2.2 / (tf_cnt + 1.2 * (0.25 + 0.75 * tf.n_toks
             |        / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1e6) AS BIGINT) AS c_micro
             |  FROM tf JOIN qt USING (term) JOIN dfq USING (term), st),
             |sc AS (SELECT query_id, doc_id, CAST(sum(c_micro) AS BIGINT) AS s_micro
             |  FROM c GROUP BY 1, 2),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY s_micro DESC, doc_id ASC) AS rank FROM sc)
             |SELECT query_id, doc_id, round(s_micro / 1e6, 6) + 0.0 AS bm25, rank
             |FROM r WHERE rank <= 10""".stripMargin),
    ),

    // The INCREMENTAL ingest loop against a STANDING inverted index
    // (IncrementalText): the corpus is committed in two halves as a
    // term-bucketed postings table + a doclen table, then retrieval
    // reads ONLY the query terms' buckets (SnapshotUpsert.readKeys
    // prefix probe) — and must be bit-identical to q_text_bm25's fresh
    // whole-corpus ranking (same DuckDB oracle). NOTE for bench
    // readers: the two index ingests (four snapshot commits) execute
    // at plan construction (eager, real disk writes to a temp dir);
    // per-pass timings see the term-pruned fetch + scoring, the
    // deployment's per-query cost.
    QueryDef(
      "q_text_bm25_incremental",
      (s, d) => {
        import s.implicits._
        val all = QueryDef.load(s, d, "documents")
          .select(col("doc_id"), col("text"))
        val qs = Seq((0L, "spark merge join"), (1L, "vector window stream"),
          (2L, "customer slow filter")).toDF("query_id", "qtext")
        val dir = java.nio.file.Files
          .createTempDirectory("graft-inctext-q").toString
        graft.operators.IncrementalText.ingest(
          all.where(col("doc_id") % 2 === 0), dir, "text", "doc_id",
          nBuckets = 16)
        graft.operators.IncrementalText.ingest(
          all.where(col("doc_id") % 2 === 1), dir, "text", "doc_id",
          nBuckets = 16)
        graft.operators.IncrementalText.topK(s, dir, qs,
          "query_id", "qtext", k = 10)
      },
      Some("""WITH q(query_id, qtext) AS (VALUES
             |  (CAST(0 AS BIGINT), 'spark merge join'),
             |  (1, 'vector window stream'),
             |  (2, 'customer slow filter')),
             |w AS (SELECT doc_id,
             |  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
             |  FROM documents),
             |toks AS (SELECT doc_id, len(ws) AS n_toks, unnest(ws) AS term FROM w),
             |tf AS (SELECT doc_id, term, count(*) AS tf_cnt, min(n_toks) AS n_toks
             |  FROM toks GROUP BY doc_id, term),
             |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
             |st AS (SELECT count(*) AS n_docs, CAST(sum(len(ws)) AS BIGINT) AS sum_dl FROM w),
             |qt AS (SELECT query_id, unnest(list_distinct(
             |  string_split(trim(regexp_replace(lower(qtext), '\s+', ' ', 'g')), ' '))) AS term
             |  FROM q),
             |c AS (SELECT qt.query_id, tf.doc_id,
             |  CAST(round(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             |    * (tf_cnt * 2.2 / (tf_cnt + 1.2 * (0.25 + 0.75 * tf.n_toks
             |        / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1e6) AS BIGINT) AS c_micro
             |  FROM tf JOIN qt USING (term) JOIN dfq USING (term), st),
             |sc AS (SELECT query_id, doc_id, CAST(sum(c_micro) AS BIGINT) AS s_micro
             |  FROM c GROUP BY 1, 2),
             |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY s_micro DESC, doc_id ASC) AS rank FROM sc)
             |SELECT query_id, doc_id, round(s_micro / 1e6, 6) + 0.0 AS bm25, rank
             |FROM r WHERE rank <= 10""".stripMargin),
    ),

    QueryDef(
      "q_dedup_simhash",
      (s, d) => Dedup.simHash(QueryDef.load(s, d, "documents"), "text", "doc_id"),
      Some(s"""WITH $duckShingleHashes,
              |bits AS (SELECT doc_id, h, unnest(range(0, 16)) AS j FROM hs),
              |votes AS (SELECT doc_id, j, sum(((h >> CAST(j AS INT)) & 1) * 2 - 1) AS v
              |  FROM bits GROUP BY doc_id, j)
              |SELECT doc_id AS id,
              | CAST(sum(CASE WHEN v >= 0 THEN 1 << CAST(j AS INT) ELSE 0 END) AS BIGINT) AS simhash
              |FROM votes GROUP BY doc_id""".stripMargin),
    ),

    QueryDef(
      "q_sim_topk_brute",
      (s, d) => {
        val e = QueryDef.load(s, d, "embeddings")
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |pairs AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             |  list_cosine_similarity(q.v, n.v) AS cos
             |  FROM e q JOIN e n ON n.vec_id != q.vec_id
             |  WHERE q.vec_id < 8),
             |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |  ORDER BY cos DESC, neighbor_id ASC) AS rank FROM pairs)
             |SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rank
             |FROM ranked WHERE rank <= 5""".stripMargin),
    ),

    QueryDef(
      "q_sim_embedding_window",
      (s, d) => Similarity.embeddingWindowPairs(
        QueryDef.load(s, d, "embeddings"), "vec_id", "embedding", window = 5),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
             |SELECT a.vec_id AS id1, b.vec_id AS id2,
             | round(list_cosine_similarity(a.v, b.v), 4) + 0.0 AS cos
             |FROM e a JOIN e b ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 5"""
        .stripMargin),
    ),

    // Mergeable HLL distinct-count sketches (DataSketches, Spark-native
    // aggregates): per-(lang, shard) sketches unioned per lang — the
    // incremental-ingest cardinality shape, here counting distinct
    // SOURCES per language (the domain-diversity profile metric).
    // Oracle-EXACT, not approximate-by-luck: below the sketch's
    // sparse-mode threshold DataSketches HLL stores every coupon and
    // the estimate IS the exact distinct count; the source domain is
    // bounded (~20 values) at EVERY sf, so the equality holds at any
    // scale (doc_id-level cardinality crosses into dense estimation at
    // sf0.1 — 2059 en docs estimated as 1999 — which is exactly why
    // the oracle-gated query counts the bounded column). Accuracy at
    // large cardinalities, shard-order invariance, and the merge
    // monoid law are SketchesSpec's job.
    QueryDef(
      "q_sketch_distinct",
      (s, d) => Sketches.shardedDistinct(
        QueryDef.load(s, d, "documents")
          .withColumn("shard", col("doc_id") % 4),
        Seq("lang"), "source", "shard"),
      Some("""SELECT lang,
             |  CAST(count(DISTINCT doc_id % 4) AS BIGINT) AS n_shards,
             |  CAST(count(DISTINCT source) AS BIGINT) AS est_distinct
             |FROM documents GROUP BY lang""".stripMargin),
    ),

    // Mergeable KLL quantile sketches per language over doc length —
    // per-shard sketches union per group; oracle-exact because each
    // group's n sits inside the sketch's exactness window (n <= k
    // retains every value; KLL INCLUSIVE rule == nearest-rank
    // "smallest value at cumulative position >= ceil(rank * n)").
    QueryDef(
      "q_sketch_quantiles",
      (s, d) => Sketches.shardedQuantiles(
        QueryDef.load(s, d, "documents")
          .withColumn("shard", col("doc_id") % 4),
        Seq("lang"), "n_chars", "shard",
        Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75", 0.95 -> "q95")),
      Some("""WITH o AS (SELECT lang, CAST(n_chars AS DOUBLE) AS x,
             |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             |    count(*) OVER (PARTITION BY lang) AS n
             |  FROM documents)
             |SELECT lang,
             |  min(CASE WHEN rn >= ceil(0.25 * n) THEN x END) AS q25,
             |  min(CASE WHEN rn >= ceil(0.50 * n) THEN x END) AS q50,
             |  min(CASE WHEN rn >= ceil(0.75 * n) THEN x END) AS q75,
             |  min(CASE WHEN rn >= ceil(0.95 * n) THEN x END) AS q95
             |FROM o GROUP BY lang""".stripMargin),
    ),

    // Mergeable frequent-items sketches: top-5 tokens per language
    // with exact counts (distinct items fit the sketch map, so
    // getMaximumError == 0 and NO_FALSE_POSITIVES returns the true
    // counts; ties break item-ascending in both engines).
    QueryDef(
      "q_sketch_topk",
      (s, d) => Sketches.shardedTopK(
        QueryDef.load(s, d, "documents")
          .withColumn("shard", col("doc_id") % 4)
          .select(col("lang"), col("shard"),
            explode(split(col("text"), " ")).as("item")),
        Seq("lang"), "item", "shard", topK = 5),
      Some("""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS item
             |  FROM documents),
             |c AS (SELECT lang, item, CAST(count(*) AS BIGINT) AS est
             |  FROM t GROUP BY 1, 2),
             |r AS (SELECT lang, item, est,
             |    row_number() OVER (PARTITION BY lang ORDER BY est DESC, item ASC) AS rn
             |  FROM c)
             |SELECT lang, item, est FROM r WHERE rn <= 5""".stripMargin),
    ),

    // Theta-sketch set algebra: pairwise vocabulary overlap between
    // language corpora — |A ∩ B| and the asymmetric differences from
    // KB sketches, never a raw distinct-join. Exact here because every
    // per-lang vocabulary sits far under the sketch's nominal entry
    // count (the same bounded-exactness pattern as the other sketch
    // oracles).
    QueryDef(
      "q_sketch_overlap",
      (s, d) => Sketches.segmentOverlap(
        QueryDef.load(s, d, "documents")
          .withColumn("shard", col("doc_id") % 4)
          .select(col("lang"), col("shard"),
            explode(split(col("text"), " ")).as("item")),
        "lang", "item", "shard"),
      Some("""WITH t AS (SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |v AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY lang),
             |c AS (SELECT x.lang AS seg_a, y.lang AS seg_b,
             |    CAST(count(*) AS BIGINT) AS common
             |  FROM t x JOIN t y ON x.w = y.w AND x.lang < y.lang
             |  GROUP BY 1, 2)
             |SELECT c.seg_a, c.seg_b, c.common,
             |  va.n - c.common AS only_a, vb.n - c.common AS only_b
             |FROM c JOIN v va ON va.lang = c.seg_a
             |       JOIN v vb ON vb.lang = c.seg_b""".stripMargin),
    ),

    // Sketches composed with window frames: trailing-3-hour distinct
    // users per hour, from per-hour HLLs unioned over a rows frame —
    // the incremental-dashboard shape (sub-threshold cardinalities,
    // so the estimates are exact against the oracle's true distinct
    // counts; rows-frame semantics mirrored via row_number in SQL).
    QueryDef(
      "q_sketch_rolling_distinct",
      (s, d) => Sketches.rollingDistinct(
        QueryDef.loadEvents(s, d), "ts", "user_id"),
      Some("""WITH e AS (SELECT strftime(date_trunc('hour', ts),
             |    '%Y-%m-%d %H:%M:%S') AS hour, user_id FROM events),
             |h AS (SELECT hour, row_number() OVER (ORDER BY hour) AS rn
             |  FROM (SELECT DISTINCT hour FROM e)),
             |p AS (SELECT c.hour AS chour, ph.hour AS phour
             |  FROM h c JOIN h ph ON ph.rn BETWEEN c.rn - 2 AND c.rn)
             |SELECT p.chour AS hour,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS est_distinct
             |FROM p JOIN e ON e.hour = p.phour GROUP BY 1""".stripMargin),
    ),

    // The whole sketch family in ONE profile row per source — how a
    // 100 TB ingest actually profiles itself: one pass builds counts +
    // HLL(langs) + KLL(doc length) in a single aggregate, a second
    // token-grain pass builds the frequent-items sketch, and the two
    // meet in a source-count-sized join. Exact against the oracle by
    // the usual bounded windows.
    QueryDef(
      "q_profile_sketch",
      (s, d) => {
        import graft.functions.SketchAggregates
        val docs = QueryDef.load(s, d, "documents")
        val base = docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          round(hll_sketch_estimate(hll_sketch_agg(col("lang"), lit(12))))
            .cast("long").as("distinct_langs"),
          element_at(SketchAggregates.kllQuantiles(
            SketchAggregates.kllSketch(col("n_chars").cast("double"), 800),
            Seq(0.5)), 1).as("median_chars"))
        // size-guarded: a saturated sketch over a FLAT vocabulary (the
        // synthetic decade corpora rewrite tokens per replica, so no
        // item dominates) can return an EMPTY confident list — then
        // the profile carries NULLs instead of throwing. On Zipfian
        // real corpora the heavy hitters survive any epsilon*n error
        // bound, which is the frequent-items contract.
        val top = docs
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .groupBy("source")
          .agg(SketchAggregates.freqSketch(col("w"), 256).as("fsk"))
          .select(col("source"),
            SketchAggregates.freqTopK(col("fsk"), 1).as("tk"))
          .select(col("source"),
            when(size(col("tk")) > 0, element_at(col("tk"), 1)).as("t"))
          .select(col("source"), col("t.item").as("top_token"),
            col("t.est").as("top_token_count"))
        base.join(top, "source")
      },
      Some("""WITH b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(count(DISTINCT lang) AS BIGINT) AS distinct_langs
             |  FROM documents GROUP BY 1),
             |m AS (SELECT source, x AS median_chars FROM (
             |    SELECT source, CAST(n_chars AS DOUBLE) AS x,
             |      row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
             |      count(*) OVER (PARTITION BY source) AS n
             |    FROM documents) WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
             |t AS (SELECT source, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
             |  FROM t GROUP BY 1, 2),
             |tk AS (SELECT source, w AS top_token, cnt AS top_token_count
             |  FROM (SELECT *, row_number() OVER (PARTITION BY source
             |          ORDER BY cnt DESC, w ASC) AS rn FROM c)
             |  WHERE rn = 1)
             |SELECT b.source, b.n_docs, b.distinct_langs, m.median_chars,
             |  tk.top_token, tk.top_token_count
             |FROM b JOIN m USING (source) JOIN tk USING (source)""".stripMargin),
    ),
  )
}
