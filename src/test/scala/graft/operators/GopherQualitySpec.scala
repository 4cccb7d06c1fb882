package graft.operators

import graft.SparkSpec

/** [[TextAnalysis.gopherQuality]]: each rule individually rejects a
  * crafted violator while a compliant doc passes the whole battery. */
class GopherQualitySpec extends SparkSpec {

  private def verdicts(docs: (Long, String)*): Map[Long, Boolean] = {
    import spark.implicits._
    TextAnalysis.gopherQuality(docs.toDF("doc_id", "text"), "text", "doc_id",
        minWords = 5, maxWords = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
  }

  private val good = "the quick brown fox and the lazy dog ran off in it"

  test("compliant doc passes; each rule rejects its violator") {
    val out = verdicts(
      1L -> good,
      2L -> "the of and", // too few words
      3L -> ("the of " + Seq.fill(20)("x").mkString(" ")), // mean wlen < 3
      4L -> ("the of in it " + Seq.fill(10)("####### ##########").mkString(" ")), // symbols + mean len
      5L -> ("the of in it is " + Seq.fill(30)("123 456").mkString(" ")), // alpha < 80%
      6L -> "quick brown foxes jump over lazy dogs every single day", // 0 stopword hits... 'over'? not in list
      7L -> (good + " extra..." + "\nmore words here..."), // ellipsis lines > 30%
      // bullets 10/11 lines = 90.9% > the paper's 90% removal bar,
      // while every other rule passes (mean wlen 3.37, alpha 83.9%)
      8L -> (good + Seq.fill(10)("\n- the quick brown fox").mkString),
      // list-heavy but legitimate: 1/2 lines bulleted (50%) — the
      // Rae et al. rule KEEPS this; the pre-fix 10% cap wrongly dropped it
      9L -> (good + "\n- the quick brown fox"),
    )
    assert(out(1L), "compliant doc must keep")
    assert(!out(2L), "word-count floor")
    assert(!out(3L), "mean word length floor")
    assert(!out(4L), "symbol ratio")
    assert(!out(5L), "alphabetic-word fraction")
    assert(!out(6L), "stopword minimum")
    assert(!out(7L), "ellipsis-line ratio")
    assert(!out(8L), "bullet-line ratio (>90% bullet lines)")
    assert(out(9L), "a 50% bullet-line doc is list-heavy, not spam — keep")
  }

  test("diagnostic ratios are exact") {
    import spark.implicits._
    val row = TextAnalysis.gopherQuality(
        Seq((1L, "aa bbbb cc 12")).toDF("doc_id", "text"),
        "text", "doc_id", minWords = 1, maxWords = 10)
      .collect().head
    assert(row.getLong(1) == 4L) // n_words
    assert(row.getDouble(2) == 2.5) // (2+4+2+2)/4
    assert(row.getDouble(4) == 0.75) // 3 of 4 words alphabetic
  }

  test("distributionDrift: zero on identical mixes, signed shift, finite on absent keys") {
    import spark.implicits._
    def df(xs: (Long, String)*) = xs.toDF("id", "k")
    val same = Profile.distributionDrift(
        df((1L, "en"), (2L, "de"), (3L, "en")),
        df((4L, "en"), (5L, "de"), (6L, "en")), "k")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(same.values.forall(_ == 0L), s"identical mixes drift: $same")
    val shifted = Profile.distributionDrift(
        df((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de")),
        df((5L, "en"), (6L, "de"), (7L, "de"), (8L, "de")), "k")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(shifted("en") > 0L, "A-heavy key contributes positively to KL(A||B)")
    assert(shifted("de") < 0L, "A-light key contributes negatively")
    assert(shifted.values.sum > 0L, "total KL positive under a real shift")
    val absent = Profile.distributionDrift(
        df((1L, "en"), (2L, "zz")), df((3L, "en")), "k")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(absent.contains("zz") && absent("zz") != Long.MaxValue,
      "smoothing keeps a B-absent key finite")
  }
}
