package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the sanctioned
  * internal path is `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * package-private to `org.apache.spark.sql` — hence this one-file shim
  * living in that package (the same technique third-party Spark extensions
  * use). Keep ALL other code in the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session's registry
    * (`sessionState` is `private[sql]`; cluster deployments should prefer
    * the `spark.sql.extensions` path via `graft.GraftExtensions`).
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
