package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WindowHashExpr]] — the rolling polynomial window-hash kernel behind
  * substring-level dedup/decontamination. The rolling update must be
  * bit-identical to the direct per-window fold (that fold is what the
  * DuckDB oracles compute via list_reduce), selection must be a pure
  * content function, and the short-string edge must mirror the
  * positional form's greatest(len-k+1, 1) window range. */
class RollingHashSpec extends SparkSpec {

  /** Direct (non-rolling) reference: fold (acc*31 + codepoint) mod 2^62
    * over each k-codepoint window — the definition the oracle mirrors. */
  private def reference(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val windows =
      if (cps.length <= k) Seq(cps.toSeq)
      else cps.sliding(k).map(_.toSeq).toSeq
    windows.map(_.foldLeft(0L)((acc, c) => (acc * 31L + c) & ((1L << 62) - 1)))
  }

  private def viaExpr(s: String, k: Int, stride: Int): Seq[Long] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(WindowHashExpr.windowHashes(col("t"), k, stride).as("hs"))
      .collect()(0).getSeq[Long](0)
  }

  test("rolling hashes equal the direct per-window fold (ascii + unicode)") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      "abcdefgh ",                      // ascii
      "aégß日本語🎉x ",                  // multi-byte + supplementary plane
      "aaaaaaab")                       // adversarial low-entropy
    for (alpha <- alphabets; len <- Seq(0, 1, 5, 39, 40, 41, 200); k <- Seq(3, 40)) {
      val cps = alpha.codePoints().toArray
      val s = new String(Array.fill(len)(cps(rnd.nextInt(cps.length))), 0, len)
      assert(viaExpr(s, k, 1) == reference(s, k),
        s"mismatch for len=$len k=$k alphabet='$alpha'")
    }
  }

  test("winnowing selection is the h % stride == 0 subset, order preserved") {
    val s = "the quick brown fox jumps over the lazy dog " * 8
    val all = reference(s, 40)
    for (stride <- Seq(2, 7, 13)) {
      assert(viaExpr(s, 40, stride) == all.filter(_ % stride == 0))
    }
  }

  test("strings shorter than k emit ONE whole-string window; empty hashes to 0") {
    assert(reference("abc", 40) == Seq("abc".foldLeft(0L)((a, c) => (a * 31 + c) & ((1L << 62) - 1))))
    assert(viaExpr("abc", 40, 1) == reference("abc", 40))
    assert(viaExpr("", 40, 1) == Seq(0L))
    // 0 % stride == 0: the empty-string window always passes selection,
    // mirroring the oracle's CASE len=0 THEN 0 guard
    assert(viaExpr("", 40, 7) == Seq(0L))
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val out = Seq[String](null).toDF("t")
      .select(WindowHashExpr.windowHashes(col("t"), 40, 7).as("hs"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val s = "shared span detection must not depend on the evaluation path"
    val df = Seq(s).toDF("t")
      .select(WindowHashExpr.windowHashes(col("t"), 20, 3).as("hs"))
    val on = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val a = df.collect()(0).getSeq[Long](0)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val b = df.collect()(0).getSeq[Long](0)
      assert(a == b && a == reference(s, 20).filter(_ % 3 == 0))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", on)
  }
}
