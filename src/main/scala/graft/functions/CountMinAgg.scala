package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch aggregate over a string column: a depth × width
  * counter matrix where row i increments cell `h_i(token) mod width`;
  * point estimate = min over rows (never an underestimate; overestimate
  * ≤ εN with ε ≈ e/width at failure probability e^−depth — Cormode &
  * Muthukrishnan 2005). THE streaming/distributed frequency primitive:
  * constant memory per task regardless of cardinality, and two sketches
  * merge by cell-wise add — so map-side partial aggregation reduces each
  * task to ONE depth·width buffer and the shuffle carries sketches, not
  * tokens. The 100 TB shape for "how often does X occur" when the
  * vocabulary doesn't fit anywhere.
  *
  * Hash rows are the four aligned 4-byte slices of the token's MD5 —
  * deliberately md5, not xxhash/murmur: the DuckDB oracle recomputes
  * every cell exactly (`('0x' || substring(md5(t), 8i+1, 8))::BIGINT %
  * width`), so the whole sketch is value-checked, not spot-checked.
  * Depth is fixed at 4 by the md5 budget (4 × 32 bits); width is free.
  *
  * Output: `array<bigint>` of length 4·width, row-major.
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Depth = 4
  private val len = Depth * width

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"count_min_agg requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < Depth) {
        // unsigned big-endian int from bytes [4i, 4i+4) — equals the
        // oracle's hex-substring parse of md5's hex form
        val h = ((digest(4 * i) & 0xFFL) << 24) | ((digest(4 * i + 1) & 0xFFL) << 16) |
          ((digest(4 * i + 2) & 0xFFL) << 8) | (digest(4 * i + 3) & 0xFFL)
        buf(i * width + (h % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(len * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(len)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

/** Point estimate from a materialized Count-Min sketch: min over the 4
  * hash rows for `token` — never an underestimate; overestimate ≤ εN
  * with ε ≈ e/width (the sketch's whole contract). The SERVING half of
  * [[CountMinAgg]]: broadcast the kilobyte sketch row and answer "how
  * often does X occur" for any probe set with a scan-free projection —
  * at 100 TB the sketch is built once and every later frequency lookup
  * costs 4 array reads. Width must match the sketch's build width (the
  * row stride; checked against the array length at eval).
  */
case class CountMinEstimate(sketch: Expression, token: Expression, width: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = sketch
  override def right: Expression = token
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (sketch.dataType, token.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate requires (array<bigint> sketch, string token), got " +
            s"(${s.catalogString}, ${t.catalogString})")
    }
  override protected def nullSafeEval(sk: Any, tok: Any): Any = {
    val arr = sk.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == CountMinAgg.Depth * width,
      s"sketch length ${arr.numElements()} != ${CountMinAgg.Depth} * $width")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.asInstanceOf[UTF8String].getBytes)
    var min = Long.MaxValue
    var i = 0
    while (i < CountMinAgg.Depth) {
      val h = ((digest(4 * i) & 0xFFL) << 24) | ((digest(4 * i + 1) & 0xFFL) << 16) |
        ((digest(4 * i + 2) & 0xFFL) << 8) | (digest(4 * i + 3) & 0xFFL)
      val c = arr.getLong(i * width + (h % width).toInt)
      if (c < min) min = c
      i += 1
    }
    min
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(sketch = l, token = r)
}

object CountMinAgg {
  val Depth = 4

  def countMin(tokenCol: Column, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(tokenCol), width).toAggregateExpression())

  /** [[CountMinEstimate]] as a Column. */
  def cmsEstimate(sketchCol: Column, tokenCol: Column, width: Int): Column =
    ColumnBridge.column(CountMinEstimate(
      ColumnBridge.expression(sketchCol), ColumnBridge.expression(tokenCol), width))

  /** Client-side point estimate from a collected sketch. */
  def estimate(sketch: Array[Long], width: Int, token: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    (0 until Depth).map { i =>
      val h = ((digest(4 * i) & 0xFFL) << 24) | ((digest(4 * i + 1) & 0xFFL) << 16) |
        ((digest(4 * i + 2) & 0xFFL) << 8) | (digest(4 * i + 3) & 0xFFL)
      sketch(i * width + (h % width).toInt)
    }.min
  }
}
