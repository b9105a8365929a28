package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch aggregate — Misra–Gries as
  * shipped in DataSketches (`ItemsSketch`): finds every item with
  * frequency above a threshold in bounded memory WITHOUT knowing the
  * vocabulary, with the deterministic guarantee `estimate ∈ [true − εN,
  * true]` for ε ≈ 3.5/maxMapSize. The complement to our Count-Min
  * (`CountMinAgg` answers "how often is X", this one answers "WHICH
  * items are hot") and the last leg of the mergeable-sketch family:
  * per-shard sketches merge losslessly w.r.t. the bound, so the shuffle
  * carries maxMapSize-bounded sketches, never a vocabulary-sized
  * (token, count) exchange. Below capacity no purge ever happens and
  * counts are EXACT — the regime the `sketch_heavy_hitters` DuckDB hash
  * oracle checks; the purge regime is spec-gated on planted Zipf data.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items_agg requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(n: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** Read the heavy hitters off a serialized frequent-items sketch as a
  * map<item, estimate>, keeping items whose estimate ≥ ⌈share ·
  * streamLength⌉ — the threshold is a FRACTION of the stream the sketch
  * itself measured, so no second pass computes a total.
  * NO_FALSE_NEGATIVES: every item truly above the threshold appears (in
  * the purge regime some below-threshold items may too — exactly the
  * items a caller re-verifies or tolerates; below capacity the counts
  * are exact and the output is too). `CodegenFallback`: runs on one
  * post-aggregation row per group.
  */
case class FreqItemsAbove(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "freq_items_above"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items_above requires (binary, double share), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, share: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe())
    val minFreq = math.ceil(
      share.asInstanceOf[Double] * sk.getStreamLength).toLong
    // integer n >= real x  <=>  n >= ceil(x): matches an oracle's
    // `n >= share * total` comparison exactly
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .filter(_.getUpperBound >= minFreq)
    val keys = rows.map(r => UTF8String.fromString(r.getItem): Any)
    val vals = rows.map(r => r.getEstimate: Any)
    ArrayBasedMapData(keys, vals)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqItemsAbove =
    copy(left = l, right = r)
}

object FreqItemsAgg {

  def freqItems(itemCol: Column, maxMapSize: Int = 1024): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(itemCol), maxMapSize)
        .toAggregateExpression())

  def itemsAbove(sketchCol: Column, minFreq: Column): Column =
    ColumnBridge.column(FreqItemsAbove(
      ColumnBridge.expression(sketchCol), ColumnBridge.expression(minFreq)))
}
