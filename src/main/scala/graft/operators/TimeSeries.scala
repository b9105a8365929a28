package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization operators: resampling an irregular event
  * stream onto a fixed time grid with gap filling — the feature-
  * engineering step that turns raw event logs into the dense per-entity
  * sequences sequence models train on.
  */
object TimeSeries {

  /** Resample to a fixed bucket grid with forward fill.
    *
    * Buckets `tsCol` by `date_trunc(unit)`, aggregates `valCol` per
    * (key, bucket) (rounded mean + count), generates each key's FULL
    * bucket grid between its first and last observed bucket, and
    * forward-fills the value over gaps (bucket count `n_events` = 0 marks
    * a filled row). The first grid row per key always carries a real
    * observation, so the fill never emits NULL.
    *
    * Scale shape: the per-key aggregation is map-side combined; the grid
    * explode is bounded by span/bucket (a 30-day span at hour grain is
    * 720 rows per key, independent of event volume); the fill is ONE
    * hash-partitioned window per key over the node-sized grid, never the
    * raw history. Output: (keyCol, bucket, value_ffill, n_events).
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, unit: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = events
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(round(avg(col(valCol)), 6).as("_v"), count(lit(1)).as("_n"))
    val spans = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("_b0"), col("_b1"),
        expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("_v"), ignoreNulls = true).over(w).as("value_ffill"),
        coalesce(col("_n"), lit(0L)).as("n_events"))
      .orderBy(col(keyCol), col("bucket"))
  }
}
