package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum MD5 over all `gramLen`-character grams of a string — the
  * MOSS-style min-selected content fingerprint, as a single native
  * expression.
  *
  * Semantics are EXACTLY `array_min(transform(sequence(1, greatest(len-g+1,
  * 1)), i -> md5(substring(s, i, g))))`: grams are CHARACTER windows, the
  * digest is of their UTF-8 bytes, the result is the lowercase-hex minimum
  * (strings shorter than `gramLen` hash their whole prefix window). The
  * composable form pays an interpreted lambda + a hex-string allocation
  * per gram (~one per character of corpus); this implementation runs one
  * tight loop per row, compares raw 16-byte digests (hex order ≡ unsigned
  * byte order), and hex-encodes only the winner.
  */
case class MinGramMd5(child: Expression, gramLen: Int) extends UnaryExpression {

  require(gramLen > 0, "gramLen must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_gram_md5 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_gram_md5"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      MinGramMd5.minGramHex(input.asInstanceOf[UTF8String].toString, gramLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.MinGramMd5.minGramHex($c.toString(), $gramLen));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}

object MinGramMd5 {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval and codegen (the loop is plain JVM code —
    * inlining it into generated Java would buy nothing further).
    */
  def minGramHex(s: String, g: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // windows are UNICODE CODE POINTS, matching Spark substring()/DuckDB
    // slicing — UTF-16 char windows would split surrogate pairs and
    // diverge from the oracles on supplementary characters
    val cps = s.codePoints().toArray
    val n = math.max(cps.length - g + 1, 1)
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      val count = math.min(g, cps.length - i)
      val dig = md.digest(new String(cps, i, count)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (best == null || unsignedLess(dig, best)) best = dig
      i += 1
    }
    val out = new Array[Char](best.length * 2)
    var j = 0
    while (j < best.length) {
      out(2 * j) = hexDigits((best(j) >> 4) & 0xF)
      out(2 * j + 1) = hexDigits(best(j) & 0xF)
      j += 1
    }
    new String(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def minGramMd5(c: Column, gramLen: Int): Column =
    ColumnBridge.column(MinGramMd5(ColumnBridge.expression(c), gramLen))
}
