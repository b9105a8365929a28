package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern: keep a small per-group STATE table (count / sum / min / max
  * over an integer measure) and fold each new batch of raw rows into it
  * by merging states, never rescanning history. At 100 TB the difference
  * is a full-table aggregation per refresh vs an aggregation of the new
  * batch plus a groups-sized merge.
  *
  * This works because these aggregates are commutative monoids: counts
  * and sums add, mins/maxes combine — so `merge(state(a), state(b)) ==
  * state(a ∪ b)` for ANY split of the data, which `IncrementalAggSpec`
  * pins and the `q_incr_agg` DuckDB oracle (a plain one-shot GROUP BY
  * over everything) hash-checks. Averages are derived (`sum/n`) at read
  * time, never stored. The same state-merge shape is what Spark's own
  * partial aggregation does within one job; this operator persists the
  * partial as a table so it works ACROSS jobs (commits, days, backfills).
  */
object IncrementalAgg {

  /** Aggregate state of one batch: (keyCol, n, sum_m, min_m, max_m).
    * `measureCol` must be integral (exact, order-independent sums);
    * floor doubles to fixed-point first.
    */
  def state(df: DataFrame, keyCol: String, measureCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col(measureCol)).as("sum_m"),
      min(col(measureCol)).as("min_m"),
      max(col(measureCol)).as("max_m"))

  /** Merge any number of state tables into one — associative and
    * commutative, so refresh order never matters.
    */
  def merge(states: Seq[DataFrame], keyCol: String): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), sum(col("sum_m")).as("sum_m"),
        min(col("min_m")).as("min_m"), max(col("max_m")).as("max_m"))
}
