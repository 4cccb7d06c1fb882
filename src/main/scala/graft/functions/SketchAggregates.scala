package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches => ThetaSketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable KLL-quantile and frequent-items sketch aggregates as
  * NATIVE Catalyst `TypedImperativeAggregate`s — the same architecture
  * Spark's own `hll_sketch_agg` / `approx_percentile` use (object
  * buffer held deserialized through partial aggregation, byte image
  * only at shuffle boundaries), extending the engine's mergeable
  * sketch family (graft.operators.Sketches) beyond cardinality:
  *   - kll_sketch_agg(x, k)  -> BINARY KLL(doubles) sketch per group
  *   - kll_merge_agg(sketch) -> BINARY union of shard sketches
  *   - kll_quantiles(sketch, ranks) -> ARRAY<DOUBLE> (inclusive rule)
  *   - freq_sketch_agg(s, maxMapSize) -> BINARY frequent-items sketch
  *   - freq_merge_agg(sketch) -> BINARY union
  *   - freq_topk(sketch, k) -> ARRAY<STRUCT<item, est>> (est desc,
  *     item asc — deterministic under exactness)
  *
  * Exactness windows (what the oracle gates ride on): a KLL sketch
  * retains every value while n <= k, and an ItemsSketch tracks every
  * distinct item exactly while distincts fit its map (getMaximumError
  * == 0) — beyond the window both degrade gracefully into their
  * published error bounds (spec-pinned, like the HLL estimates).
  *
  * At 100 TB: per-group sketch bytes (KB) are the ONLY thing that
  * crosses the shuffle; per-shard sketches persist and re-merge
  * without rescanning history — union is a commutative, associative
  * monoid in both families.
  */
object SketchAggregates {

  def kllSketch(x: Column, k: Int): Column =
    GraftSqlBridge.column(
      KllSketchAgg(GraftSqlBridge.expression(x), k).toAggregateExpression())

  def kllMerge(sketch: Column, k: Int): Column =
    GraftSqlBridge.column(
      KllMergeAgg(GraftSqlBridge.expression(sketch), k).toAggregateExpression())

  def kllQuantiles(sketch: Column, ranks: Seq[Double]): Column =
    GraftSqlBridge.column(
      KllQuantilesExpr(GraftSqlBridge.expression(sketch), ranks))

  def freqSketch(s: Column, maxMapSize: Int): Column =
    GraftSqlBridge.column(
      FreqSketchAgg(GraftSqlBridge.expression(s), maxMapSize)
        .toAggregateExpression())

  def freqMerge(sketch: Column, maxMapSize: Int): Column =
    GraftSqlBridge.column(
      FreqMergeAgg(GraftSqlBridge.expression(sketch), maxMapSize)
        .toAggregateExpression())

  def freqTopK(sketch: Column, k: Int): Column =
    GraftSqlBridge.column(
      FreqTopKExpr(GraftSqlBridge.expression(sketch), k))

  def thetaSketch(s: Column): Column =
    GraftSqlBridge.column(
      ThetaSketchAgg(GraftSqlBridge.expression(s)).toAggregateExpression())

  def thetaUnion(sketch: Column): Column =
    GraftSqlBridge.column(
      ThetaUnionAgg(GraftSqlBridge.expression(sketch)).toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    GraftSqlBridge.column(
      ThetaSetCountExpr(GraftSqlBridge.expression(sketch),
        GraftSqlBridge.expression(sketch), "estimate"))

  def thetaIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ThetaSetCountExpr(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b), "intersect"))

  def thetaDiffCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ThetaSetCountExpr(GraftSqlBridge.expression(a),
        GraftSqlBridge.expression(b), "a_not_b"))

  private[functions] val stringSerDe = new ArrayOfStringsSerDe
}

/** Per-group Theta sketch of string `child` — the DISTINCT-SET member
  * of the sketch family: unlike HLL (cardinality only), Theta sketches
  * support set ALGEBRA (union / intersection / difference) over the
  * retained hash samples, so cross-segment overlap questions ("how
  * much vocabulary do two language corpora share", "what fraction of
  * this crawl's doc fingerprints already exist in last month's")
  * answer from KB sketches instead of a distinct-join of the raw sets.
  * Exact while retained entries sit under the sketch's nominal 4096;
  * standard Theta error bounds beyond. */
@ExpressionDescription(usage = "theta_sketch_agg(s) - mergeable Theta set sketch")
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] with ExpectsInputTypes {

  // analysis-time typing: updates hash STRING items (a BIGINT child
  // would ClassCastException at execution otherwise)
  override def inputTypes = Seq(StringType)

  // buffer is a Union: accepts raw value updates AND sketch merges,
  // which makes update/merge/serialize uniform
  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaSketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union of serialized Theta shard sketches (monoid merge; Theta
  * unions have no capacity-matching requirement — the theta value
  * adapts). */
@ExpressionDescription(usage = "theta_union_agg(sketch) - union of Theta sketches")
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.union(ThetaSketches.wrapSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaSketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Set-algebra counts over serialized Theta sketches: rounded estimate
  * of |A| ("estimate", b ignored), |A ∩ B| ("intersect"), or |A \ B|
  * ("a_not_b") — exact whenever the operand sketches are exact. */
case class ThetaSetCountExpr(left: Expression, right: Expression, op: String)
  extends Expression with BinaryLike[Expression] with CodegenFallback
  with ExpectsInputTypes {

  require(Set("estimate", "intersect", "a_not_b").contains(op),
    s"unknown theta op: $op")

  // both operands are serialized sketches
  override def inputTypes = Seq(BinaryType, BinaryType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def wrap(v: Any): CompactSketch =
    ThetaSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      .compact()

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val est: Double = op match {
      case "estimate" => wrap(a).getEstimate
      case "intersect" =>
        val b = right.eval(input)
        if (b == null) return null
        val i: Intersection = SetOperation.builder().buildIntersection()
        i.intersect(wrap(a)); i.intersect(wrap(b))
        i.getResult.getEstimate
      case "a_not_b" =>
        val b = right.eval(input)
        if (b == null) return null
        SetOperation.builder().buildANotB()
          .aNotB(wrap(a), wrap(b)).getEstimate
    }
    math.round(est)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetCountExpr = copy(left = l, right = r)
}

/** Per-group KLL(doubles) sketch of `child`. `k` controls both the
  * exactness window (n <= k retains everything) and the error beyond
  * it (~1.65/sqrt(k) rank error at the default 200). */
@ExpressionDescription(usage = "kll_sketch_agg(x, k) - mergeable KLL quantile sketch")
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  // any numeric child; the companion NumericType AbstractDataType is
  // private[spark], exposed via the bridge — rejects strings/binaries
  // at analysis time. NumericType ALSO admits decimals, whose internal
  // value is spark's Decimal (not a java.lang.Number) — update matches
  // it explicitly so an accepted type cannot still fail at execution.
  override def inputTypes = Seq(GraftSqlBridge.numericType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null => ()
      case d: org.apache.spark.sql.types.Decimal => b.update(d.toDouble)
      case n: Number => b.update(n.doubleValue())
      case other => throw new IllegalStateException(
        s"kll_sketch_agg: unexpected input ${other.getClass.getName}")
    }
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union of serialized KLL shard sketches (the monoid merge). `k`
  * must match the build sketches': KLL union adapts DOWNWARD to the
  * smallest k involved, so a default-k (200) union target silently
  * downsamples exact k=400 inputs into estimation mode (caught by the
  * oracle: one-position quantile drift at 218 values). */
@ExpressionDescription(usage = "kll_merge_agg(sketch, k) - union of KLL sketches")
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Quantile extraction from a serialized KLL sketch at fixed ranks
  * (INCLUSIVE search rule: smallest value whose cumulative weight >=
  * rank * n — the discrete "stored value" rule, mirroring DuckDB's
  * quantile_disc when the sketch is in its exactness window). NULL for
  * an empty sketch. Scalar, few rows — CodegenFallback is fine. */
case class KllQuantilesExpr(child: Expression, ranks: Seq[Double])
  extends Expression with UnaryLike[Expression] with CodegenFallback
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    // INCLUSIVE explicitly: this datasketches build defaults to the
    // EXCLUSIVE rule, which is one position off the discrete
    // nearest-rank convention (caught by the oracle: 166 vs 165 at
    // rank 0.25 over 218 values)
    new GenericArrayData(ranks.map(r =>
      sk.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override protected def withNewChildInternal(c: Expression): KllQuantilesExpr =
    copy(child = c)
}

/** Per-group frequent-items sketch of string `child`. `maxMapSize`
  * (power of 2) bounds memory; while distinct items fit, counts are
  * EXACT (getMaximumError == 0). */
@ExpressionDescription(usage = "freq_sketch_agg(s, maxMapSize) - mergeable frequent-items sketch")
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o); b
  }

  override def eval(b: ItemsSketch[String]): Any =
    b.toByteArray(SketchAggregates.stringSerDe)
  override def serialize(b: ItemsSketch[String]): Array[Byte] =
    b.toByteArray(SketchAggregates.stringSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), SketchAggregates.stringSerDe)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** Union of serialized frequent-items shard sketches. `maxMapSize`
  * must be >= the build sketches' map size: an ItemsSketch's capacity
  * is FIXED at construction, so an undersized union target evicts
  * items and inflates error offsets even when every input is exact
  * (caught by the oracle: a capacity-8 target returned EMPTY
  * NO_FALSE_POSITIVES lists for 31-item exact inputs). */
@ExpressionDescription(usage = "freq_merge_agg(sketch, maxMapSize) - union of frequent-items sketches")
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      b.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), SketchAggregates.stringSerDe))
    b
  }

  override def merge(b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o); b
  }

  override def eval(b: ItemsSketch[String]): Any =
    b.toByteArray(SketchAggregates.stringSerDe)
  override def serialize(b: ItemsSketch[String]): Array[Byte] =
    b.toByteArray(SketchAggregates.stringSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), SketchAggregates.stringSerDe)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** Top-k extraction from a serialized frequent-items sketch:
  * ARRAY<STRUCT<item STRING, est BIGINT>>, ordered by estimate desc
  * then item asc (deterministic whenever estimates are exact).
  * NO_FALSE_POSITIVES: every returned item's true count is >= its
  * lower bound — under exactness the list is the true top-k. */
case class FreqTopKExpr(child: Expression, k: Int)
  extends Expression with UnaryLike[Expression] with CodegenFallback
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sk = ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), SketchAggregates.stringSerDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .take(k)
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): FreqTopKExpr =
    copy(child = c)
}
