package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression emitting the polynomial rolling hashes of
  * every `k`-codepoint window of a string, keeping those selected by the
  * content-defined winnowing rule `h % stride == 0`.
  *
  * This is the hashing kernel behind substring-level dedup /
  * decontamination ("Deduplicating Training Data" span semantics). The
  * md5 formulation it replaces pays O(k) digest work PLUS a substring
  * allocation PLUS a hex parse per character position — at 100 TB that
  * is ~10^14 md5 invocations on 40-char copies. The rolling form pays
  * O(1) arithmetic per position in one pass (Rabin–Karp: h' =
  * (h - c_out·B^(k-1))·B + c_in mod 2^62), and because selection happens
  * INSIDE the expression, the downstream explode materializes only the
  * ~1/stride selected hashes instead of every position.
  *
  * Hash definition (mirrored verbatim by the DuckDB oracles via
  * `list_reduce` over HUGEINT): over Unicode CODEPOINTS of the input,
  * `h = fold(acc, c => (acc·31 + c) mod 2^62)` starting at 0, i.e.
  * `sum(c_j · 31^(k-1-j)) mod 2^62`, emitted as a non-negative long.
  * WIDTH MATTERS AT SCALE: the original 32-bit hash saturates — the
  * sf100d rehearsal (~4·10^8 selected windows) measured ~1.9·10^7
  * birthday-collision pairs (n²/2³³), growing quadratically with the
  * corpus, each one a false shared-window match that inflates the
  * pair join and, worse, the decontamination verdicts. mod 2^62 cuts
  * the collision rate by 2^30 while keeping the value a non-negative
  * signed long on the Spark side and a BIGINT-representable value on
  * the DuckDB side (intermediates there go through HUGEINT; here,
  * natural 64-bit wraparound then `& (2^62-1)` is exact modular
  * arithmetic because 2^62 divides 2^64).
  * Strings shorter than `k` contribute ONE window — the hash of the
  * whole string (the empty string hashes to 0) — matching the
  * positional-md5 form's `greatest(len-k+1, 1)` position range.
  *
  * Codegen stays inside WholeStageCodegen: the generated projection
  * calls the static [[WindowHashExpr.compute]] kernel (one JIT-friendly
  * primitive loop), so no interpreted `eval` boundary is crossed.
  */
case class WindowHashExpr(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    WindowHashExpr.compute(input.asInstanceOf[UTF8String], k, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowHashExpr.compute($c, $k, $stride)")
}

object WindowHashExpr {
  private final val Mask = (1L << 62) - 1
  private final val Base = 31L

  /** One-pass rolling-hash kernel. Static (a companion forwarder) so
    * generated Java calls it directly. Returns the selected window
    * hashes in position order, duplicates preserved. */
  def compute(t: UTF8String, k: Int, stride: Int): ArrayData = {
    val s = t.toString
    // decode to codepoints once; windows are codepoint-indexed so the
    // oracle's character-based substr/unicode() sees identical units
    val cps = new Array[Int](s.length)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n <= k) {
      var h = 0L
      var x = 0
      while (x < n) { h = (h * Base + cps(x)) & Mask; x += 1 }
      if (h % stride == 0) new GenericArrayData(Array(h))
      else new GenericArrayData(Array.emptyLongArray)
    } else {
      val m = n - k + 1
      val out = new Array[Long](m)
      var cnt = 0
      var pow = 1L // 31^(k-1) mod 2^62 — congruent under the masked roll
      var x = 0
      while (x < k - 1) { pow = (pow * Base) & Mask; x += 1 }
      var h = 0L
      x = 0
      while (x < k) { h = (h * Base + cps(x)) & Mask; x += 1 }
      if (h % stride == 0) { out(cnt) = h; cnt += 1 }
      var p = 1
      while (p < m) {
        // the multiplies overflow a long, but overflow IS mod 2^64 and
        // 2^62 | 2^64, so wraparound followed by & mask is exactly the
        // mod-2^62 roll — no widening needed
        h = ((h - cps(p - 1) * pow) * Base + cps(p + k - 1)) & Mask
        if (h % stride == 0) { out(cnt) = h; cnt += 1 }
        p += 1
      }
      new GenericArrayData(
        if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
    }
  }

  /** Column wrapper: array of selected window hashes of `text`. */
  def windowHashes(text: Column, k: Int, stride: Int = 1): Column =
    GraftSqlBridge.column(
      WindowHashExpr(GraftSqlBridge.expression(text), k, stride))
}
