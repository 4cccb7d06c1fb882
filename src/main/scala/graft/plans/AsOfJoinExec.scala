package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan for the as-of join — rung (c) of the
  * custom-operator ladder (logical node + strategy + physical node),
  * the native counterpart of the composed
  * [[graft.operators.AsOfJoin.asOfJoin]] (rung (a)).
  *
  * Why a physical node at all: the union-window composition carries
  * every LEFT column through the union and the running-`last` window,
  * so a wide left side is shuffled AND sorted twice-width; this node
  * shuffles each side only as itself and performs one streaming merge
  * pass per partition — the classic sorted-merge as-of. Semantics are
  * identical where both are defined: for every left row, the right
  * row with the greatest `rightTs <= leftTs` within the same keys
  * (LEFT OUTER; right side assumed unique per (keys, ts)).
  *
  * Divergence by design: SQL equality semantics on keys — a NULL key
  * (or NULL ts) on the left emits unmatched, NULL-key right rows are
  * dropped — whereas the window composition groups NULLs together
  * (both engines' ASOF JOIN drop null keys; the composed form predates
  * the node and keeps its documented window behavior).
  *
  * Execution contract, enforced declaratively so EnsureRequirements
  * plans the exchanges/sorts (and elides them when inputs are already
  * bucketed or co-partitioned):
  *   - distribution: ClusteredDistribution(keys) on BOTH children (the
  *     same co-partitioning contract SortMergeJoinExec declares);
  *   - ordering: each child sorted by (keys..., ts) ascending.
  * The merge is then a single forward scan of both sorted streams —
  * O(|L| + |R|) per partition, no per-key buffering, O(1) state: one
  * lookahead right row and one carried match.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
) extends BinaryNode {
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match exactly")
  require(leftTs.dataType == rightTs.dataType,
    "as-of join timestamp types must match exactly")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. Injected via
  * [[graft.GraftExtensions]] (cluster config) or lazily through
  * `spark.experimental.extraStrategies` by the operator API. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan,
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // streaming merge: rows come out in the left child's partitioning
  // and (keys, ts) order — downstream sorts/aggregations on the same
  // keys reuse both instead of re-exchanging
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tsOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(leftTs.dataType))
      val outProj = UnsafeProjection.create(output,
        left.output ++ right.output.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      new Iterator[InternalRow] {
        // lookahead right row + its key/ts. COPIES: sorter iterators
        // reuse their row buffers and the projections reuse theirs,
        // so anything held across next() calls must be materialized.
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTs: UnsafeRow = _
        // last right row with rTs <= current left ts, and its key
        private var carry: InternalRow = _
        private var carryKey: UnsafeRow = _

        private def fetchRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            if (!k.anyNull) { // null-key right rows never match: drop
              val t = rTsProj(r)
              if (!t.isNullAt(0)) {
                rRow = r.copy(); rKey = k.copy(); rTs = t.copy()
              }
            }
          }
        }
        fetchRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          if (lk.anyNull || lt.isNullAt(0)) {
            outProj(joined(l, nullRight))
          } else {
            var advancing = rRow != null
            while (advancing) {
              val c = keyOrd.compare(rKey, lk)
              if (c < 0) {
                // right key fully passed: discard (left is ascending,
                // no later left row can need it)
                fetchRight()
                advancing = rRow != null
              } else if (c == 0 && tsOrd.compare(rTs, lt) <= 0) {
                carry = rRow // already a stable copy
                carryKey = rKey
                fetchRight()
                advancing = rRow != null
              } else {
                advancing = false
              }
            }
            if (carry != null && keyOrd.compare(carryKey, lk) == 0) {
              outProj(joined(l, carry))
            } else {
              outProj(joined(l, nullRight))
            }
          }
        }
      }
    }
  }
}
