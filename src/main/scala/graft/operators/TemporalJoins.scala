package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of (point-in-time)
  * join and bounded range join. Both are built by composing existing
  * operators (SURVEY §7.3 preference (a)) rather than a custom SparkPlan,
  * because the compositions already have the right distributed shape.
  */
object TemporalJoins {

  /** Left as-of join: for every left row, attach the LATEST right row with
    * `rightTime <= leftTime` within the same `key` (point-in-time lookup;
    * left rows with no prior right row keep nulls).
    *
    * Implementation: tag and union both sides, then one window pass per
    * key ordered by (time, side, tiebreak) taking `last(..., ignoreNulls)`
    * of the right columns — a single shuffle on the key and a
    * per-key sort, which is exactly the minimal work a dedicated as-of
    * physical operator would do. Ties (right row at the left row's exact
    * timestamp) are included, matching ASOF `>=` semantics; multiple right
    * rows on the same (key, time) resolve to the greatest `tieBreak`.
    *
    * `rightCols` are emitted as `asof_<name>`.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, tieBreak: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(Long.MaxValue))
    val lAligned = rightCols.foldLeft(l)((d, c) =>
      d.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(tieBreak).cast("long"))
    val rAligned0 = rightCols.foldLeft(r0)((d, c) => d.withColumn(s"_r_$c", col(c)))
    // project to the union schema: left payload nulled on right rows
    val unionCols = leftCols.map(col) ++ Seq(col("_t"), col("_side"), col("_tb")) ++
      rightCols.map(c => col(s"_r_$c"))
    val rAligned = leftCols.foldLeft(rAligned0)((d, c) =>
      if (right.columns.contains(c)) d else
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select(unionCols: _*)
      .unionByName(rAligned.select(unionCols: _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned)((d, c) =>
      d.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"asof_$c")): _*)
  }

  /** Inner range join: all pairs with |leftTime − rightTime| ≤ tolerance.
    *
    * Naive formulation is a cross join with a filter (quadratic); this
    * uses time-bucket blocking — the left side replicates into its bucket
    * and both neighbors, the right side maps to one bucket, and the
    * equi-join on the bucket id is an ordinary shuffle join followed by
    * the exact predicate. Work scales with true match density instead of
    * |L|×|R|.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftTimeCol: String, rightTimeCol: String, toleranceMs: Long): DataFrame = {
    val tolUs = toleranceMs * 1000L
    val lB = left
      .withColumn("_lt", unix_micros(col(leftTimeCol)))
      .withColumn("_bucket",
        explode(array((-1 to 1).map(d => floor(col("_lt") / tolUs) + d): _*)))
    val rB = right
      .withColumn("_rt", unix_micros(col(rightTimeCol)))
      .withColumn("_bucket", floor(col("_rt") / tolUs))
    lB.join(rB, "_bucket")
      .filter(abs(col("_lt") - col("_rt")) <= tolUs)
      .drop("_bucket", "_lt", "_rt")
  }
}
