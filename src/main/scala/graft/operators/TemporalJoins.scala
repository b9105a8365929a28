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
    // The right payload travels as ONE nullable struct so the window fill
    // is atomic: filling each column independently would let a NULL field
    // in the latest right row be backfilled from an older row, emitting a
    // composite row that never existed.
    val l = left
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("_rrow",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightCols.map(c => right.schema(c)))))
    val r0 = right
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(tieBreak))
      .withColumn("_rrow", struct(rightCols.map(col): _*))
    val unionCols = leftCols.map(col) ++
      Seq(col("_t"), col("_side"), col("_tb"), col("_rrow"))
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      if (right.columns.contains(c)) d else
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.select(unionCols: _*)
      .unionByName(rAligned.select(unionCols: _*))
    // among right rows at the same (key, time) the greatest tieBreak wins;
    // left rows sort after right rows at equal time (_side 1 > 0), so the
    // left row's own _tb never influences ordering
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_rfill", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"_rfill.$c").as(s"asof_$c")): _*)
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
