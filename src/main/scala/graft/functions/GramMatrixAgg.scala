package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Gram (X'X) matrix aggregate over a vector column: one pass producing
  * the upper triangle of Σ x·xᵀ as a single `array<double>` of length
  * d(d+1)/2, flattened row-major (index(i,j) = i·d − i(i−1)/2 + j − i).
  *
  * This is the PCA / covariance / whitening precursor every embedding
  * pipeline computes, in the shape MLlib's `computeGramianMatrix` uses
  * (treeAggregate of rank-1 updates) but as a Catalyst
  * `TypedImperativeAggregate`, so it composes with SQL GROUP BY and gets
  * map-side partial aggregation for free: each task reduces its rows to
  * ONE d(d+1)/2 buffer (~16 KB at d = 64) and the shuffle carries one
  * buffer per task — the 100 TB alternative to exploding n·d² product
  * terms. The tight i ≤ j update loop does d(d+1)/2 multiply-adds per
  * row in primitive doubles.
  *
  * Per-row accumulation order is fixed (array order), so the only
  * cross-engine nondeterminism is partial-merge order — the usual
  * last-ulp noise consumers bury with round() (see `emb_gram_matrix`).
  */
case class GramMatrixAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  private val len = d * (d + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_matrix_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_matrix_agg requires array<float|double>, got ${t.catalogString}")
    }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_matrix_agg(d=$d) got a vector of ${arr.numElements()} elements")
      // snapshot into a primitive array once: ArrayData element reads are
      // virtual calls; the inner loop then runs on plain doubles
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      var idx = 0
      i = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) { buf(idx) += xi * x(j); idx += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(len * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(len)(in.readDouble())
  }

  override def withNewMutableAggBufferOffset(n: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): GramMatrixAgg =
    copy(child = c)
}

object GramMatrixAgg {
  def gram(vecCol: Column, d: Int): Column =
    ColumnBridge.column(
      GramMatrixAgg(ColumnBridge.expression(vecCol), d).toAggregateExpression())
}
