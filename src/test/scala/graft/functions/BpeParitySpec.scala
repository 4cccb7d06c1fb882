package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** [[BpeEncodeExpr]] (fused native kernel) vs
  * [[TextAnalysis.bpeMergedReference]] (the original regexp/replace
  * Column chain, which the DuckDB oracles also mirror): outputs must be
  * bit-identical on every input category the symbolizer distinguishes. */
class BpeParitySpec extends SparkSpec {
  import spark.implicits._

  private def both(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("t")
    val rows = df.select(
        TextAnalysis.bpeMerged($"t").as("kernel"),
        TextAnalysis.bpeMergedReference($"t").as("chain"))
      .collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel/chain divergence on input: ${in.take(80)}")
    }
  }

  test("kernel equals the Column chain on curated category edges") {
    both(Seq(
      "",
      " ",
      "hello world",
      "MIXED Case 42x7",
      "a1b2c3",                         // letter<->digit flips
      "!!...??",                        // punct runs
      "  lots \t of\n\f\r space ",
      "tab\tseparated.and,punct:heavy;text!",
      "unicode: aégß 日本語 🎉 mark̇s", // multi-byte, supplementary, combining
      "\u001ein-band\u001erecord\u001e", // RS chars in the input
      "\u001fin-band\u001funit\u001f",   // US chars in the input
      "İstanbul İ",               // lowercase expansion
      "trailing space ",
      " leading",
      "...",
      "a", "1", ".",
    ))
  }

  test("kernel equals the Column chain on seeded random soup") {
    val rnd = new scala.util.Random(7)
    val alphabet =
      "abcXYZ 0123 .,!?:; \t\néß文🎉" +
        "the quick brown fox 42"
    val inputs = (1 to 60).map { _ =>
      val len = rnd.nextInt(200)
      new String((1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).toArray)
    }
    both(inputs)
  }

  test("kernel parity holds on real corpus text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val rows = docs.select(
        TextAnalysis.bpeMerged(col("text")).as("kernel"),
        TextAnalysis.bpeMergedReference(col("text")).as("chain"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("codegen and interpreted paths agree") {
    val s = "Fused kernels must not depend on the evaluation path, 42!"
    val df = Seq(s).toDF("t").select(TextAnalysis.bpeMerged($"t").as("m"))
    val on = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val a = df.collect()(0).getString(0)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val b = df.collect()(0).getString(0)
      assert(a == b)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", on)
  }
}
