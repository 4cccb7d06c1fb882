package graft

import graft.functions.{CosineExpr, DotProductExpr, FuseDotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injector for the engine's native SQL surface.
  *
  * Wire up with `spark.sql.extensions=graft.GraftExtensions` (cluster
  * config — every session gets the functions, including ones the
  * application code never touches) or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * The imperative registrars ([[graft.functions.VectorExpressions.register]],
  * [[graft.statemachine.TransitionFunctions.registerUdfs]]) remain for
  * sessions created without extension config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineExpr(exprs(0), exprs(1)),
    ))
    // the char kernels, SQL-callable: window_hashes(text, k, stride)
    // (int args must be foldable literals — they parameterize codegen)
    // and bpe_encode(text) with the engine's default 48-merge table
    ext.injectFunction((
      FunctionIdentifier("window_hashes"),
      new ExpressionInfo(
        classOf[graft.functions.WindowHashExpr].getName, "window_hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"window_hashes(text, k, stride) takes exactly 3 arguments, got ${exprs.length}")
        def intArg(i: Int, name: String): Int = {
          require(exprs(i).foldable,
            s"window_hashes: $name must be a literal integer")
          exprs(i).eval() match {
            case n: Number => n.intValue
            case other => throw new IllegalArgumentException(
              s"window_hashes: $name must be a literal integer, got $other")
          }
        }
        graft.functions.WindowHashExpr(exprs(0),
          intArg(1, "k"), intArg(2, "stride"))
      },
    ))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(
        classOf[graft.functions.BpeEncodeExpr].getName, "bpe_encode"),
      (exprs: Seq[Expression]) => graft.functions.BpeEncodeExpr(exprs(0),
        graft.operators.TextAnalysis.bpeMerges),
    ))
    // auto-accelerate the portable HOF dot-product pattern
    ext.injectOptimizerRule(_ => FuseDotProduct)
    // rewrite pure range joins (p >= s AND p < s + L, no equi key)
    // from nested-loop shape into a binned hash equi-join
    ext.injectOptimizerRule(_ => graft.plans.BinRangeJoin)
    // plan the native sorted-merge as-of join node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
