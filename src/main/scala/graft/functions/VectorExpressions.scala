package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** Fused squared-L2 distance: one loop accumulating `(x-y)*(x-y)`
  * left-to-right — the exact float sequence of the HOF fold
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, (acc, v) ->
  * acc + v)` it replaces (both are left-associated element-order
  * sums), so results are bit-identical while skipping the intermediate
  * array and the two interpreted lambda dispatches per element. The
  * PQ encode path evaluates this |corpus| x m x k times per build —
  * the single hottest inner loop of the ANN family. Null semantics
  * match [[DotProductExpr]] (and the HOF form): NULL on length
  * mismatch or any null slot. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"
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
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("lsN")
      val s = ctx.freshName("lsSum")
      val i = ctx.freshName("lsI")
      val d = ctx.freshName("lsD")
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
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $s += $d * $d;
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

/** Fused signed-random-projection LSH bucket id — the whole
  * `bits`-plane bucket in ONE loop over the vector.
  *
  * Replaces the HOF form in [[graft.operators.Similarity.lshBucket]]:
  * per plane j (plane index = table*bits + j),
  * `proj_j = aggregate(zip_with(v, sequence(0, size(v)-1),
  * (x, i) -> x * sign(plane, i)), 0.0, +)`; bit j = 1 iff
  * `proj_j >= 0`. That shape dispatches `bits` interpreted
  * zip_with+aggregate lambda pairs per row, each allocating an
  * intermediate array. This kernel accumulates all `bits` projections
  * in a single pass with the identical per-plane left-to-right
  * addition order and the identical Weyl-mix sign
  * (`((i*2654435761 + plane*40503) % 97) % 2 == 0 ? 1 : -1`, Java
  * long semantics = Spark's int-promoted Multiply/Remainder), so
  * bucket ids are bit-identical.
  *
  * Degenerate-input semantics reproduce the HOF composition EXACTLY
  * (they are quirky and oracle-pinned): a NULL array, an empty array
  * (sequence(0,-1) null-pads the zip), or any NULL slot all make every
  * projection NULL, and `when(proj >= 0, bit).otherwise(0)` folds
  * NULL to 0 — so the bucket is 0, never NULL (this expression is
  * therefore non-nullable). A NaN projection SETS its bit: Spark
  * comparison semantics order NaN greater than every value, so
  * `NaN >= 0` is true (probed by the degenerate-inputs parity test —
  * Java's bare `>=` would silently flip this). */
case class LshBucketExpr(child: Expression, bits: Int, table: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  override def nullable: Boolean = false

  private def planeBase: Int = table * bits

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return 0L
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return 0L
      i += 1
    }
    val sums = new Array[Double](bits)
    i = 0
    while (i < n) {
      val v = x.getDouble(i)
      var j = 0
      while (j < bits) {
        val sign =
          if ((((i.toLong * 2654435761L + (planeBase + j).toLong * 40503L)
            % 97L) % 2L) == 0L) 1.0 else -1.0
        sums(j) += v * sign
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < bits) {
      // Spark comparison semantics: NaN sorts GREATER than any value,
      // so a NaN projection satisfies `proj >= 0` and SETS its bit
      // (Java's NaN >= 0 is false — do not use it bare)
      if (sums(j) >= 0 || java.lang.Double.isNaN(sums(j))) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val x = c.value
    val n = ctx.freshName("lbN")
    val i = ctx.freshName("lbI")
    val j = ctx.freshName("lbJ")
    val v = ctx.freshName("lbV")
    val sums = ctx.freshName("lbSums")
    val bucket = ctx.freshName("lbBucket")
    val ok = ctx.freshName("lbOk")
    val body =
      s"""
         |long $bucket = 0L;
         |if (!${c.isNull}) {
         |  int $n = $x.numElements();
         |  boolean $ok = $n > 0;
         |  for (int $i = 0; $ok && $i < $n; $i++) {
         |    if ($x.isNullAt($i)) $ok = false;
         |  }
         |  if ($ok) {
         |    double[] $sums = new double[$bits];
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $v = $x.getDouble($i);
         |      for (int $j = 0; $j < $bits; $j++) {
         |        $sums[$j] += $v *
         |          ((((((long) $i) * 2654435761L +
         |            ((long) ($planeBase + $j)) * 40503L) % 97L) % 2L) == 0L
         |            ? 1.0 : -1.0);
         |      }
         |    }
         |    for (int $j = 0; $j < $bits; $j++) {
         |      // Spark semantics: NaN >= 0 is TRUE (NaN sorts greatest)
         |      if ($sums[$j] >= 0 || Double.isNaN($sums[$j])) {
         |        $bucket |= (1L << $j);
         |      }
         |    }
         |  }
         |}
         |final long ${ev.value} = $bucket;
       """.stripMargin
    ev.copy(code = c.code + code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Fused-loop dot product of two double array columns (cast to double). */
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

  /** Fused single-pass squared-L2 (see [[L2SqExpr]]) — bit-identical
    * to the left-associated HOF fold it replaces. */
  def l2sqNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2SqExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Fused all-planes LSH bucket id (see [[LshBucketExpr]]) —
    * bit-identical to the per-plane HOF composition it replaces. */
  def lshBucketNative(vec: Column, bits: Int, table: Int): Column =
    GraftSqlBridge.column(LshBucketExpr(
      GraftSqlBridge.expression(vec.cast("array<double>")), bits, table))

  /** SQL registration: `dot_product(a, b)`, `cosine_sim(a, b)`,
    * `l2_sq(a, b)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq", exprs => L2SqExpr(exprs(0), exprs(1)), "built-in")
  }
}
