package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused kernel for the BPE apply pipeline
  * ([[graft.operators.TextAnalysis.bpeMerged]]): the US/RS symbol-string
  * encoding plus the rank-ordered merge replaces, in one expression.
  *
  * The Column-chain form it replaces pays SEVEN regexp_replace passes
  * (each a full matcher scan building a fresh 3x-blown-up string) plus
  * one chained literal replace PER MERGE, each crossing an expression
  * boundary with a fresh UTF8String — ~55 allocation passes per
  * document. This kernel emits the symbol string in ONE codepoint scan
  * (whitespace/RS collapse, punctuation isolation, letter<->digit
  * splits, and US-wrapping decided per codepoint), then applies the
  * merge table with literal `String.replace` in the same rank order.
  *
  * Semantics are bit-identical to the Column chain BY SPEC, not by
  * review: the chain survives as
  * [[graft.operators.TextAnalysis.bpeMergedReference]] and
  * BpeParitySpec fuzzes the two against each other (mixed-category,
  * unicode, and in-band US/RS inputs) — and the DuckDB oracles still
  * run the regex-chain formulation, so registry parity cross-checks
  * the kernel on every Verify run. Lowercasing delegates to
  * `UTF8String.toLowerCase` — the exact function the Column `lower()`
  * applies — so case mapping cannot drift. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  @transient private lazy val pats: Array[String] =
    merges.map { case (a, b) =>
      BpeEncodeExpr.US + a + BpeEncodeExpr.US + BpeEncodeExpr.US + b + BpeEncodeExpr.US
    }.toArray
  @transient private lazy val reps: Array[String] =
    merges.map { case (a, b) =>
      BpeEncodeExpr.US + a + b + BpeEncodeExpr.US
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeExpr.compute(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeExpr.compute($c, $p, $r);")
  }
}

object BpeEncodeExpr {
  final val RS = '\u001e' // word separator
  final val US = '\u001f' // symbol delimiter

  /** Whitespace exactly as Java-regex `\s` (the class the Column chain
    * collapses) — NOT `Character.isWhitespace`, which also matches
    * unicode spaces the regex form treats as punctuation. */
  private def isRegexSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** One-pass symbolize + rank-ordered merge apply. Static so generated
    * code calls it directly inside WholeStageCodegen. */
  def compute(t: UTF8String, pats: Array[String], reps: Array[String]): UTF8String = {
    // Spark's own lower(): case mapping identical to the Column chain
    val lowered = t.toLowerCase.toString
    val sb = new java.lang.StringBuilder(lowered.length * 3 + 8)
    var started = false  // anything emitted yet (leading RS trim)
    var needSep = false  // pending RS before the next emitted symbol
    var prevCls = -1     // 0 = letter run, 1 = digit run, -1 = neither
    var i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      if (isRegexSpace(cp) || cp == RS) {
        // space runs and in-band RS chars collapse to one separator
        if (started) needSep = true
        prevCls = -1
      } else {
        val cls =
          if (cp >= 'a' && cp <= 'z') 0
          else if (cp >= '0' && cp <= '9') 1
          else 2
        if (cls == 2) {
          // punctuation: an RS-isolated single-codepoint word
          if (started) sb.append(RS)
          sb.append(US); sb.appendCodePoint(cp); sb.append(US)
          started = true; needSep = true; prevCls = -1
        } else {
          // letter/digit: separate after space/punct or at a class flip
          if (started && (needSep || (prevCls != -1 && prevCls != cls)))
            sb.append(RS)
          sb.append(US); sb.appendCodePoint(cp); sb.append(US)
          started = true; needSep = false; prevCls = cls
        }
      }
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var j = 0
    while (j < pats.length) {
      // literal left-to-right non-overlapping replace — the same
      // contract as UTF8String.replace and DuckDB replace()
      s = s.replace(pats(j), reps(j))
      j += 1
    }
    UTF8String.fromString(s)
  }

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(text), merges))
}
