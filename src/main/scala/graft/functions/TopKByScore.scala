package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-by-score aggregate — the one aggregate Spark's function
  * library lacks that a 100 TB nearest-neighbor scan needs.
  *
  * `ORDER BY score LIMIT k` per group either window-sorts every row of the
  * group or collects the whole group; this aggregate instead keeps a k-entry
  * min-heap per partial buffer, so a grouped top-k shuffles at most k rows
  * per group per map task (classic partial/final aggregation). Ties are
  * broken by ascending id so results are deterministic.
  *
  * Returns `array<struct<score double, id bigint>>` sorted by
  * (score desc, id asc); explode + posexplode to get ranked rows.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_by_score requires (double, bigint), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")

  /** Head of the queue = the WORST retained entry (lowest score, then
    * highest id), so exceeding k pops the right victim.
    */
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by((t: (Double, Long)) => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.size < k) {
      buf.enqueue((s, i))
    } else {
      val worst = buf.head
      if (worstFirst.compare((s, i), worst) < 0) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(t => add(buf, t._1, t._2))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sortBy(t => (-t._1, t._2))
      .map(t => InternalRow(t._1, t._2)))

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKByScore = copy(score = newLeft, id = newRight)
}

object TopKByScore {
  /** Column-API entry point: `topkBy(score, id, k)` usable inside agg(). */
  def topkBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}
