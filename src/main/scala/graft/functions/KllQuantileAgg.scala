package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregates — the quantile leg of the mergeable-
  * sketch trio (HLL = distincts, Count-Min = frequencies, KLL =
  * quantiles). A KLL sketch (Karnin–Lang–Liberty 2016) summarizes any
  * number of doubles in a few KB with a PROVEN normalized rank error
  * (~1.65% at the default k=200, 99% confidence), and two sketches merge
  * losslessly w.r.t. that bound — so per-group sketches materialized once
  * answer every later percentile rollup (subsets, global) without
  * rescanning raw data, exactly like the HLL rollup does for distincts.
  * Exact percentiles cannot roll up (order statistics don't add); KLL's
  * merge is what makes the 100 TB summary table possible.
  *
  * Spark ships the DataSketches jars but (unlike HLL) exposes no KLL SQL
  * functions, so these are `TypedImperativeAggregate`s over
  * `KllDoublesSketch` — same partial-aggregation shape as Spark's own
  * `hll_sketch_agg`/`hll_union_agg`: each map task reduces its rows to
  * ONE sketch and the shuffle carries sketch bytes, never values.
  *
  * Note the sketch bytes themselves are run-dependent (KLL compaction
  * draws random offsets), but estimates honor the rank-error bound
  * regardless of merge order — `SketchRollupSpec` gates against exact
  * order statistics, not byte equality.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a double column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg =
    copy(child = c)
}

/** Union of serialized KLL sketches — rolls materialized per-group
  * sketch blobs up WITHOUT touching raw data (the KLL twin of Spark's
  * `hll_union_agg`).
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg requires a binary sketch column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(
      KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
}

/** Quantile estimate from serialized sketch bytes (INCLUSIVE search, the
  * DataSketches default). `CodegenFallback` is deliberate: this runs on
  * post-aggregation rows (one per group), never in a hot scan — heapify
  * cost is per-GROUP, not per-row.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (binary, double), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, rank: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
      .getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

object KllQuantileAgg {
  val DefaultK = 200

  def kllAgg(valueCol: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllDoublesAgg(ColumnBridge.expression(valueCol), k).toAggregateExpression())

  def kllUnion(sketchCol: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllUnionAgg(ColumnBridge.expression(sketchCol), k).toAggregateExpression())

  def kllQuantile(sketchCol: Column, rank: Column): Column =
    ColumnBridge.column(KllQuantile(
      ColumnBridge.expression(sketchCol), ColumnBridge.expression(rank)))
}
