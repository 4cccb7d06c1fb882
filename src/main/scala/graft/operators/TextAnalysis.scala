package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All are pure Column
  * expressions (codegen'd, no UDFs) — at 100 TB these run inside the
  * scan's whole-stage-codegen loop with zero extra passes.
  */
object TextAnalysis {

  /** Whitespace tokenization. The testdata is single-space separated;
    * for real corpora use [[tokensRegex]]. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenization: words, numbers, or single non-space
    * symbols (a public-knowledge approximation of GPT-style regex
    * pre-tokenizers). */
  def tokensRegex(text: Column): Column =
    call_function("regexp_extract_all", text,
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** English-ish stopword set used by the quality heuristics. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordHits(text: Column): Column =
    size(filter(tokens(text), w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  /** Heuristic quality score in [0,1]: length-normalized word count
    * damped by stopword density — the standard cheap pre-filter shape
    * for web-scale corpus cleaning (length/punct/stopword ratios). */
  def qualityScore(text: Column): Column = {
    val nWords = tokenCount(text).cast("double")
    val stopRatio = stopwordHits(text).cast("double") / nWords
    round(least(lit(1.0), nWords / lit(50.0)) * (lit(1.0) - stopRatio), 6)
  }

  /** Marker-word language ID: score each language by marker hits, pick
    * the best scorer, "und" (undetermined) when nothing matches. An
    * n-gram-profile version would replace the marker sets; the operator
    * shape (per-language hit counts -> argmax) is the same. */
  val languageMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "des", "une"),
  )

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = languageMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> size(filter(toks, w => w.isin(markers.map(_.asInstanceOf[Any]): _*)))
    }
    // argmax via fold: strictly-greater keeps the alphabetically-first
    // language on ties (deterministic).
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed
    * text. Rolling/shingled hashing lives in [[Dedup.shingles]]. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Repetition ratio in [0,1]: the fraction of a document's 3-gram
    * shingles that are duplicates of an earlier shingle (0 = no
    * repetition). The standard cheap detector for boilerplate/spam
    * loops in web-scale corpus cleaning. `ws` must be a materialized
    * words-array attribute (see [[Dedup.shinglesFromWords]]). */
  def repetitionRatio(ws: Column, n: Int = 3): Column = {
    val total = greatest(size(ws) - (n - 1), lit(1)).cast("double")
    val distinctN = size(Dedup.shinglesFromWords(ws, n)).cast("double")
    round(lit(1.0) - distinctN / total, 6)
  }

  /** Punctuation density: non-alphanumeric-non-space chars / length. */
  def punctRatio(text: Column): Column =
    round(size(call_function("regexp_extract_all", text,
      lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)), 6)

  /** Deterministic hash-bucketed train/val/test assignment: the split
    * is a pure function of the document id (stable across runs,
    * machines, and partitionings — re-ingesting the corpus never moves
    * a document across the split boundary, which would leak training
    * data into eval). md5-derived bucket in [0, 100): [0, trainPct)
    * train, [trainPct, trainPct+valPct) val, rest test. */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket =
      Dedup.md5Hash32(concat(lit("split:"), id.cast("string"))) % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** PII patterns, restricted to the regex subset shared by Java
    * (Spark) and RE2 (DuckDB/Go scrubbers): no backrefs, no lookaround
    * — so the same pattern text is portable across the stack. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val NumberRe = "\\d+"

  /** PII redaction: emails, then IPv4s, then phone-shaped numbers (the
    * order matters — emails may contain digit runs, IPs would otherwise
    * be half-eaten by the phone pattern). Pure codegen'd
    * `regexp_replace` chain: at 100 TB this is a per-row scan-local
    * rewrite, no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Number scrubbing (aggressive variant for numeric-id leakage). */
  def redactNumbers(text: Column): Column =
    regexp_replace(text, NumberRe, "<NUM>")

  /** HTML/markup stripping for crawled corpora: drop script/style
    * blocks wholesale (their CONTENT is code, not text), comments,
    * then all remaining tags; unescape the common entities; collapse
    * whitespace. Patterns avoid backrefs/lookaround so the identical
    * semantics are expressible in RE2 engines (DuckDB oracle, Go
    * scrubbers) — same portability contract as the PII patterns.
    * Pure codegen'd regexp_replace chain: scan-local, no shuffle. */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    val unescaped = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&",
    ).foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  def matchCount(text: Column, pattern: String): Column =
    size(call_function("regexp_extract_all", text, lit(pattern), lit(0)))

  /** Unigram-LM surprise scoring: each document's average per-token
    * negative log-probability under the corpus's own unigram model —
    * the cheap stand-in for KenLM-style perplexity filtering (low =
    * boilerplate/common tokens, high = rare-token-heavy). Per-token
    * log-probs are quantized to integer MICRO-NATS before the per-doc
    * sum, so the aggregation is exact integer arithmetic: the result
    * is independent of partial-aggregation order (a raw double sum
    * would drift with partitioning) and reproducible across engines.
    * Shuffles: doc-term explode -> term-count join (vocabulary-sized
    * build side) -> per-doc sum; the corpus total is one broadcast
    * scalar. */
  def unigramSurprise(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__ws"))
      // explode_outer: plain explode infers a size>0 filter that
      // re-inlines the words() regex below the projection (see
      // Dedup.shingleHashes) — same results, double the scan work
      .select(col("doc_id"), explode_outer(col("__ws")).as("term"))
    val termCounts = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    // count(term), not count(*): explode_outer emits a null term row
    // for null-text docs, which must not inflate the corpus total
    val total = toks.agg(count(col("term")).as("n"))
    toks.join(termCounts, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(-log(col("cnt").cast("double") / col("n")) * 1e6)
          .cast("long").as("micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_toks"),
        round(col("sum_micro").cast("double") / col("n_toks") / 1000000.0, 6)
          .as("avg_surprise"))
  }

  /** TF-IDF per (doc, term) over whitespace-normalized lowercased
    * tokens: tf = termCount/docLen, idf = ln(nDocs/docFreq). Two
    * shuffles (doc-term, then term) + one broadcast scalar — the
    * vocabulary never sits on one node. */
  def tfIdf(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), Dedup.words(col(textCol)).as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("n_toks"),
        explode_outer(col("__ws")).as("term"))
    val tf = toks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf_cnt"), first(col("n_toks")).as("n_toks"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf_cnt").cast("double") / col("n_toks") *
          log(col("n_docs").cast("double") / col("doc_freq")), 6).as("tfidf"))
  }
}
