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

/** Skew-resistant salted equi-join.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, which covers most cases — but not all join shapes AQE can
  * rewrite (and a pre-partitioned/bucketed join deliberately avoids the
  * exchange AQE would need). The explicit technique: salt the SKEWED
  * probe side into `buckets` deterministic sub-keys and replicate the
  * build side once per salt, so a hot key's rows spread over `buckets`
  * tasks instead of hammering one. Build-side cost: ×`buckets` rows
  * through the exchange — use only when the build side is small relative
  * to the hot key's row count.
  *
  * Each probe row joins the single replica carrying its salt, so the
  * output is EXACTLY the plain inner join (oracle-checked by
  * `q_skew_join`).
  */
object SkewJoin {

  /** Inner equi-join of `probe` and `build` on the shared `keyCol`;
    * `saltSource` is any probe column (set) whose content spreads rows —
    * deterministic, so retries and reruns agree.
    */
  def saltedInnerJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      saltSource: String, buckets: Int = 16): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(buckets.toLong)))
    val replicated = build.withColumn("_salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }
}
