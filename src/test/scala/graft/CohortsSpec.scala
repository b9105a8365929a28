package graft

import graft.operators.Cohorts
import org.apache.spark.sql.functions._

/** Planted-data semantics for the cohort/transition operators (the
  * registered `q_cohort_retention` / `q_event_transitions` run the same
  * plans over the events table, oracle-checked; this pins boundaries).
  */
class CohortsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("event_id", "user_id", "event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("retention: cohort by first-event week, one count per active week, offset-0 = cohort size") {
    // 2024-01-01 and 2024-01-08 are Mondays (week starts).
    val events = ev(Seq(
      // user 1: first seen week0, active week0 (twice — counted once) and week1
      (1L, 1L, "click", "2024-01-02 10:00:00"),
      (2L, 1L, "click", "2024-01-03 11:00:00"),
      (3L, 1L, "click", "2024-01-09 09:00:00"),
      // user 2: week0 only — Sunday 23:59 still lands in week0
      (4L, 2L, "view", "2024-01-07 23:59:59"),
      // user 3: first seen week1, active week1 and week3 (gap week skipped)
      (5L, 3L, "click", "2024-01-08 00:00:00"),
      (6L, 3L, "buy", "2024-01-24 12:00:00")))
    val got = Cohorts.retention(events, "user_id", "ts").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), // users 1,2 in their first week
      ("2024-01-01", 1L, 1L), // user 1 returns
      ("2024-01-08", 0L, 1L), // user 3's cohort
      ("2024-01-08", 2L, 1L))) // user 3 returns two weeks later
  }

  test("transitions: per-user adjacency ordered by (ts, tiebreak), pairs counted globally") {
    val events = ev(Seq(
      // user 1: click -> view -> click ; the two same-ts events order by event_id
      (1L, 1L, "click", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:00:00"), // ties with #1, id orders it second
      (3L, 1L, "click", "2024-01-01 11:00:00"),
      // user 2: a single event — no transition
      (4L, 2L, "view", "2024-01-01 10:00:00"),
      // user 3: click -> view (no cross-user adjacency with user 1's rows)
      (5L, 3L, "click", "2024-01-02 10:00:00"),
      (6L, 3L, "view", "2024-01-02 10:30:00")))
    val got = Cohorts.transitions(events, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("click", "view", 2L), // user 1 (tie broken by event_id) + user 3
      ("view", "click", 1L))) // user 1
  }
}
