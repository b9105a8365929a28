package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior rollups over an event log — the engagement-analytics
  * companions to sessionization/funnel: weekly cohort retention and the
  * first-order event-type transition matrix.
  *
  * Scale design: both operators reduce the event stream to counts in one
  * or two user-keyed shuffles. Retention's two aggregations and its join
  * all key on the user id, so a pipeline that pre-partitions events by
  * user (the natural layout for sessionization too) runs them
  * shuffle-free; the transition matrix's window is partitioned per user
  * (parallel, never a global sort) and its final aggregation is
  * type-pair-sized — a handful of rows regardless of input scale.
  */
object Cohorts {

  /** Weekly cohort retention: users are cohorted by the ISO week
    * (Monday-truncated) of their FIRST event; for each (cohort week,
    * whole-week offset) the count of cohort members active in that week.
    *
    * Both `groupBy`s are map-side combined; the `(user, week)` distinct
    * bounds the join input at users × active-weeks, not raw events.
    * Output: (cohort_week, week_offset, active_users) — offset 0 row is
    * the cohort size (every member is active in their own first week).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol).as("_u"))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("_cohort"))
    val activeWeeks = events
      .select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol)).cast("date").as("_w"))
      .distinct()
    activeWeeks.join(firstWeek, "_u")
      // both weeks are Monday-truncated, so the day diff is an exact
      // multiple of 7 and the double division casts back losslessly
      .groupBy(col("_cohort").as("cohort_week"),
        (datediff(col("_w"), col("_cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** First-order transition matrix over event types: per user, events are
    * ordered by (ts, tiebreak id) and each adjacent pair contributes one
    * (prev_type, next_type) count. The classic Markov-chain view of a
    * clickstream; row-normalizing the counts yields transition
    * probabilities, left to the caller so the output stays integer-exact.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol),
        lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("next_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("transitions"))
      .orderBy(col("prev_type"), col("next_type"))
  }
}
