package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregates — distinct-set ALGEBRA, the capability HLL
  * fundamentally lacks: theta sketches support intersection and
  * difference, not just union, so "how many users did A AND B" /
  * "A but not B" (audience overlap, funnel exclusivity, cohort carve-outs)
  * roll up from per-group sketch blobs without a distinct-pair join over
  * raw data. A theta sketch keeps the k smallest hashes of the set
  * (KMV; Dasgupta et al. 2016) — order-insensitive, mergeable, and EXACT
  * below k retained entries (no sampling has kicked in), with relative
  * error ~1/√k above.
  *
  * Same 100 TB shape as the HLL/KLL legs: one scan materializes
  * per-group sketches, every later set expression runs on kilobytes.
  * Below-k exactness is what lets `sketch_overlap` carry a full DuckDB
  * hash oracle at the test scale factors while degrading gracefully
  * (spec-gated) at production cardinalities.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires long/int/string, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case s: UTF8String        => buf.update(s.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  // A union's in-flight state IS a sketch: compact losslessly and
  // re-union on the other side.
  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union of serialized theta sketches — rolls materialized per-group
  * sketch blobs up without touching raw data (cohort unions feeding
  * intersections/differences downstream).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg requires a binary sketch column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Base for the pairwise set-expression estimates. `CodegenFallback` is
  * deliberate: these run on post-aggregation rows (one per group pair),
  * never in a hot scan.
  */
sealed abstract class ThetaBinaryEstimate extends BinaryExpression
  with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, binary) theta sketches, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  protected def sketch(v: Any) =
    Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
}

/** Distinct estimate of one serialized theta sketch. */
case class ThetaEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires a binary sketch, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(v: Any): Any =
    Sketches.wrapCompactSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Estimated |A ∩ B| from two serialized theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends ThetaBinaryEstimate {
  override def prettyName: String = "theta_intersect_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(sketch(a), sketch(b)).getEstimate
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Estimated Jaccard similarity |A ∩ B| / |A ∪ B| from two serialized
  * theta sketches — set-similarity monitoring (audience overlap ratio,
  * cohort drift between snapshots) straight off the summary table.
  * Exact below k retained entries like the other theta expressions;
  * empty-union pairs define J = 0.
  */
case class ThetaJaccardEstimate(left: Expression, right: Expression)
  extends ThetaBinaryEstimate {
  override def prettyName: String = "theta_jaccard_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = sketch(a); val sb = sketch(b)
    val u = SetOperation.builder().buildUnion()
    u.union(sa); u.union(sb)
    val denom = u.getResult().getEstimate
    if (denom == 0.0) 0.0
    else SetOperation.builder().buildIntersection()
      .intersect(sa, sb).getEstimate / denom
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Estimated |A \ B| from two serialized theta sketches. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
  extends ThetaBinaryEstimate {
  override def prettyName: String = "theta_a_not_b_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(sketch(a))
    op.notB(sketch(b))
    op.getResult(true).getEstimate
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object ThetaSketchAgg {

  def thetaAgg(valueCol: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(valueCol), lgK).toAggregateExpression())

  def thetaUnion(sketchCol: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketchCol), lgK).toAggregateExpression())

  def estimate(sketchCol: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketchCol)))

  def intersectEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersectEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def aNotBEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaAnotBEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def jaccardEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaJaccardEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
