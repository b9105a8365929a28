package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over irregular event streams: resampling onto a
  * fixed grid with gap filling (the feature-engineering step that turns
  * raw event logs into the dense per-entity sequences sequence models
  * train on), and finite-window EWMA smoothing with spike flagging (the
  * monitoring primitive).
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

  // --- finite-window EWMA + anomaly flagging -------------------------------
  //
  // The classic infinite-horizon EWMA (`s_t = α·x_t + (1−α)·s_{t−1}`) is a
  // linear recurrence — inherently sequential per key, and the closed-form
  // rewrite (`Σ α(1−α)^{t−i} x_i`) needs `pow(1−α, −i)` terms that overflow
  // for long series. Both are wrong shapes for a distributed engine. The
  // operator below uses the FINITE-window EWMA (the form monitoring systems
  // actually deploy — weights below the window horizon are < 0.4% for the
  // default α=1/2, W=8): each row's smoothed value is a fixed dot product of
  // the last W observations,
  //
  //   ewma_t = Σ_{j<W} α(1−α)^j · x_{t−j}  /  Σ_{j<W, lag exists} α(1−α)^j
  //
  // i.e. W lag() window lookups and a literal-coefficient polynomial —
  // embarrassingly parallel per key after one shuffle on the key, and
  // whole-stage-codegen'd end to end.
  //
  // Numeric contract (what makes the full DuckDB hash oracle possible):
  // α = 1/2, so every coefficient α(1−α)^j = 2^{−(j+1)} is an EXACT binary
  // fraction; the numerator/denominator sums are written as the same
  // left-associated `+` chains on both engines; division is one IEEE op.
  // Result doubles are emitted UNROUNDED and still hash-match, because every
  // intermediate is bit-identical — the discipline this repo uses wherever
  // round() tie behavior would diverge between engines.

  /** Per-coefficient weights for α = 1/2: 2^-1, 2^-2, … — exact doubles. */
  private[graft] def weights(w: Int): Seq[Double] =
    (1 to w).map(j => math.pow(0.5, j))

  /** Finite-window EWMA + spike flag per `keyCol` series ordered by
    * (`tsCol`, `idCol`). Emits every input row with its smoothed level
    * and an `is_spike` 0/1 flag.
    *
    * The head of each series (fewer than W lags) uses the renormalized
    * partial weight sum — the standard `adjust=true` EWMA convention
    * (pandas' default), so early rows are unbiased rather than damped
    * toward zero.
    *
    * Anomaly rule: a point is a spike when it exceeds `threshold ×` the
    * PRIOR row's smoothed level (`lag(ewma, 1)`) — comparing against the
    * level that includes the point itself would mask the very excursion
    * being tested. Heads with no prior level are never spikes; the spike
    * itself still enters the level (monitoring convention: flag, don't
    * drop).
    *
    * 100 TB shape: one hash shuffle on the series key, then per-partition
    * sorted window evaluation with W-deep lag frames; no self-join, no
    * unbounded state, no driver participation. Skewed keys are bounded by
    * the per-key series length, not the corpus size.
    */
  def ewmaAnomaly(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, w: Int = 8,
      threshold: Double = 4.0): DataFrame = {
    require(w >= 1 && w <= 32, s"window depth $w out of range")
    val series = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val ws = weights(w)
    // numerator: Σ w_j · lag_j (null lags contribute exact 0); the chain
    // is left-associated identically in the SQL oracle
    val num = ws.zipWithIndex.map { case (c, j) =>
      coalesce(lag(col(valCol), j).over(series), lit(0.0)) * lit(c)
    }.reduce(_ + _)
    // denominator: Σ w_j over the lags that exist (head renormalization)
    val den = ws.zipWithIndex.map { case (c, j) =>
      when(lag(col(valCol), j).over(series).isNotNull, lit(c)).otherwise(lit(0.0))
    }.reduce(_ + _)
    val prior = lag(col("ewma"), 1).over(series)
    events
      .withColumn("ewma", num / den)
      .withColumn("is_spike",
        when(prior.isNotNull && col(valCol) > lit(threshold) * prior, 1)
          .otherwise(0))
      .select(col(keyCol), col(idCol), col(valCol), col("ewma"), col("is_spike"))
  }

  /** Peak concurrency of half-open intervals `[start, end)` per key —
    * the sweep-line classic (peak concurrent sessions / connections /
    * shipments): every interval contributes a +1 point at its start and
    * a −1 at its end, and the maximum of the running sum over the
    * time-ordered points is the answer.
    *
    * Determinism at instants with ties is load-bearing for the hash
    * oracle: points order by (time, delta ASC) so ends apply BEFORE
    * starts at the same microsecond (half-open semantics — back-to-back
    * intervals never overlap), and the running sum uses the DEFAULT
    * window frame (RANGE UNBOUNDED PRECEDING → CURRENT ROW in both
    * Spark and ANSI SQL), which gives every peer group one shared
    * value instead of an arbitrary within-tie ordering.
    *
    * Output: (key, peak, peak_at_us) — the maximum concurrency and the
    * first microsecond it is reached.
    *
    * 100 TB shape: 2 points per interval, ONE hash shuffle on the key,
    * two stacked window passes on the same sort, then a groups-sized
    * aggregate. The sweep is per-key sequential by nature; distribution
    * comes from the key partitioning, exactly like every other window
    * operator here.
    */
  def peakConcurrency(intervals: DataFrame, keyCol: String,
      startUs: Column, endUs: Column): DataFrame = {
    val pts = intervals.select(col(keyCol),
        explode(array(
          struct(startUs.cast("long").as("us"), lit(1).as("delta")),
          struct(endUs.cast("long").as("us"), lit(-1).as("delta")))).as("_p"))
      .select(col(keyCol), col("_p.us").as("us"), col("_p.delta").as("delta"))
    val sweep = Window.partitionBy(col(keyCol)).orderBy(col("us"), col("delta"))
    val whole = Window.partitionBy(col(keyCol))
    pts
      .withColumn("run", sum(col("delta")).over(sweep))
      .withColumn("_peak", max(col("run")).over(whole))
      .filter(col("run") === col("_peak"))
      .groupBy(col(keyCol))
      .agg(max(col("run")).as("peak"), min(col("us")).as("peak_at_us"))
  }

  /** Gaps-and-islands: group each key's sequence into maximal runs of
    * consecutive rows sharing the same `valCol` (streaks) — the classic
    * row_number-difference trick. Two row_numbers over the same sort —
    * one global per key, one per (key, value) — differ by a constant
    * within a run and only within a run, so their difference is a
    * stable island id; everything reduces to ONE key shuffle, two
    * stacked window passes on the same sort, and a map-side-combined
    * groupBy. (Time-GAP grouping is sessionization — `q_events_sessions`;
    * this is value-CHANGE grouping: "how long did the state hold".)
    *
    * Output: one row per island — (key, value, island_len BIGINT,
    * start_id, end_id) with ids from `idCol` — all exact, full hash
    * oracle.
    */
  def islands(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val wAll = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wVal = Window.partitionBy(col(keyCol), col(valCol))
      .orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_grp",
        row_number().over(wAll) - row_number().over(wVal))
      .groupBy(col(keyCol), col(valCol), col("_grp"))
      .agg(count(lit(1)).as("island_len"),
        min(col(idCol)).as("start_id"), max(col(idCol)).as("end_id"))
      .select(col(keyCol), col(valCol), col("island_len"),
        col("start_id"), col("end_id"))
  }

  /** The matching ANSI SQL for [[ewmaAnomaly]], generated from the SAME
    * coefficient list so the two engines evaluate identical literal
    * polynomials. Doubles are written in `e`-notation: DuckDB parses a
    * bare decimal literal as DECIMAL and would compute the sums in
    * fixed-point, diverging from Spark's binary doubles.
    */
  def ewmaAnomalySql(table: String, keyCol: String, tsCol: String,
      idCol: String, valCol: String, w: Int = 8,
      threshold: Double = 4.0): String = {
    val ws = weights(w)
    def lit(d: Double): String = {
      val s = d.toString
      if (s.contains("e") || s.contains("E")) s else s + "e0"
    }
    val num = ws.zipWithIndex.map { case (c, j) =>
      s"coalesce(lag($valCol, $j) over win, 0e0) * ${lit(c)}"
    }.mkString(" + ")
    val den = ws.zipWithIndex.map { case (c, j) =>
      s"case when lag($valCol, $j) over win is not null then ${lit(c)} else 0e0 end"
    }.mkString(" + ")
    s"""WITH smoothed AS (
       |  SELECT $keyCol, $tsCol, $idCol, $valCol, ($num) / ($den) AS ewma
       |  FROM $table
       |  WINDOW win AS (PARTITION BY $keyCol ORDER BY $tsCol, $idCol)
       |)
       |SELECT $keyCol, $idCol, $valCol, ewma,
       |  CASE WHEN lag(ewma, 1) OVER win2 IS NOT NULL
       |        AND $valCol > ${lit(threshold)} * lag(ewma, 1) OVER win2
       |       THEN 1 ELSE 0 END AS is_spike
       |FROM smoothed
       |WINDOW win2 AS (PARTITION BY $keyCol ORDER BY $tsCol, $idCol)""".stripMargin
  }
}
