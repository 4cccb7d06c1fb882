package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two double arrays.
  *
  * The higher-order-function form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) allocates an
  * intermediate array and evaluates two lambdas per element; this
  * expression generates a single fused loop (`doGenCode`), which is the
  * difference between a memory-bound and a compute-bound inner loop on
  * a 100 TB embedding scan. Falls back to an interpreted loop when
  * codegen is off.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // strict analysis-time typing (no implicit casts): dotNative casts
  // on the Column side, SQL users cast explicitly — a non-double array
  // is rejected at analysis instead of ClassCastException at execution
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // Null semantics match the HOF form this expression replaces
  // (aggregate(zip_with(a,b,*),0.0,+)): unequal lengths null-pad in
  // zip_with and a null element nullifies the sum — so length mismatch
  // or any null slot yields NULL, never a truncated/garbage sum. The
  // rewrite in [[FuseDotProduct]] relies on this equivalence.
  override def nullable: Boolean = true

  private def elementsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names: the same expression may be generated several times
      // into one method (e.g. dot(a,b) and dot(a,a) in a cosine)
      val n = ctx.freshName("dpN")
      val s = ctx.freshName("dpSum")
      val i = ctx.freshName("dpI")
      // per-element null checks only when the array type admits null
      // slots — embedding scans (containsNull=false) keep the tight
      // two-load fused loop
      val slotCheck =
        if (elementsNullable(left) || elementsNullable(right))
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $slotCheck
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: ONE loop accumulates the cross dot product
  * and both self dot products (3 multiplies per element, arrays loaded
  * once), then finishes with `dot / (sqrt(na) * sqrt(nb))` — the exact
  * float sequence of the composed form
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, so results are
  * bit-identical while touching each array once instead of three
  * times. Null semantics match [[DotProductExpr]] (NULL on length
  * mismatch or any null slot); zero norms flow through the division
  * exactly like the composed form (NaN/Infinity, never a fabricated
  * value). */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  private def elementsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sd = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      sd += xv * yv
      sa += xv * xv
      sb += yv * yv
      i += 1
    }
    sd / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("csN")
      val sd = ctx.freshName("csDot")
      val sa = ctx.freshName("csNa")
      val sb = ctx.freshName("csNb")
      val i = ctx.freshName("csI")
      val xv = ctx.freshName("csX")
      val yv = ctx.freshName("csY")
      val slotCheck =
        if (elementsNullable(left) || elementsNullable(right))
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $sd = 0.0; double $sa = 0.0; double $sb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $slotCheck
         |    double $xv = $x.getDouble($i);
         |    double $yv = $y.getDouble($i);
         |    $sd += $xv * $yv; $sa += $xv * $xv; $sb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $sd / (Math.sqrt($sa) * Math.sqrt($sb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Fused-loop dot product of two array columns (cast to double). */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Fused single-pass cosine (see [[CosineExpr]]) — bit-identical to
    * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with one array
    * traversal instead of three. */
  def cosineNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** SQL registration: `dot_product(a, b)`, `cosine_sim(a, b)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineExpr(exprs(0), exprs(1)), "built-in")
  }
}
