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

/** MinHash signature aggregate: one pass over a group's element hashes
  * producing all `k` permutation minima as a single `array<bigint>`.
  *
  * The expression-only formulation (k separate `min((a_i*h+b_i) % p)`
  * aggregate columns) makes the hash-aggregate operator carry a k-wide
  * row per group and evaluate k expression trees per input row; this
  * aggregate keeps one long[] buffer and a tight update loop instead
  * (~3× on the MinHash pipeline at k=128). Coefficients derive
  * deterministically from `seed`, so signatures are reproducible.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  /** 31-bit Carter–Wegman prime; see Dedup.minhashLshPairs. */
  private val P = MinHashAgg.P

  @transient private lazy val (permA, permB) = MinHashAgg.coefficients(k, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a bigint hash column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hp = {
        val m = v.asInstanceOf[Long] % P
        if (m < 0) m + P else m
      }
      var i = 0
      while (i < k) {
        val p = (permA(i) * hp + permB(i)) % P
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(k)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): MinHashAgg =
    copy(child = c)
}

object MinHashAgg {
  /** 31-bit Carter–Wegman prime shared by the aggregate and its
    * per-row expression twin (Dedup.rowBandCols).
    */
  private[graft] val P = 2147483647L

  /** Permutation coefficient derivation, EXTRACTED so the aggregate and
    * the streaming-side per-row twin provably draw the identical
    * (a_i, b_i) sequence from one `seed`: `permA` consumes the first
    * `k` draws of `nextLong(P-1)`, `permB` the next `k` of
    * `nextLong(P)` — evaluation order is part of the contract.
    */
  private[graft] def coefficients(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(k)(1L + rnd.nextLong(P - 1)), Array.fill(k)(rnd.nextLong(P)))
  }

  def minhash(hashCol: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(hashCol), k, seed).toAggregateExpression())
}
