package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's Unicode code points:
  * `h_i = (h_{i-1} * base + codepoint_i) mod modulus`, h_0 = 0.
  *
  * Spark's function library has xxhash64/md5/crc32 but no incremental
  * polynomial hash, which document-fingerprinting pipelines want because
  * it is (a) engine-independent (defined purely on code points, so a SQL
  * oracle can replicate it) and (b) extensible to windowed/rolling
  * variants. Implemented as a native Catalyst expression with `doGenCode`
  * so it stays inside whole-stage codegen rather than dropping the
  * pipeline into UDF interpretation.
  */
case class PolyHash(child: Expression, base: Long = 31L, modulus: Long = 2147483647L)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % modulus
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val h = ctx.freshName("phAcc")
      val i = ctx.freshName("phIdx")
      val cp = ctx.freshName("phCp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * ${base}L + $cp) % ${modulus}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
