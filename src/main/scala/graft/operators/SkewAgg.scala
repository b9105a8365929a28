package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase (salted) aggregation.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a heavy-hitter key
  * through one reducer; at 100 TB a single hot key stalls the stage even
  * with AQE (AQE splits skewed JOIN partitions, but a skewed aggregation
  * key still lands on one task after the partial agg — partial aggs
  * already absorb most skew, EXCEPT for high-cardinality-input aggregates
  * like collect_list/exact distinct where map-side combine can't shrink
  * the hot key). The classic fix: salt the key into `buckets` sub-keys,
  * aggregate partially per (key, salt), then combine the per-salt results.
  *
  * Provided for decomposable aggregates (sum/count/min/max): results are
  * exactly equal to the unsalted plan.
  */
object SkewAgg {

  /** Deterministic salt derived from row content (not rand(): reruns and
    * retries must agree).
    */
  private def salt(saltSource: Column, buckets: Int): Column =
    pmod(xxhash64(saltSource), lit(buckets.toLong))

  /** Salted sum/count of `valueCol` per `keyCol`. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltSource: String, buckets: Int = 16): DataFrame =
    df.groupBy(col(keyCol), salt(col(saltSource), buckets).as("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
}
