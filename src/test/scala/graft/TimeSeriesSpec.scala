package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("resampleFfill fills gaps forward and marks them with n_events = 0") {
    val ev = Seq(
      (1L, ts(0, 10), 2.0), (1L, ts(0, 50), 4.0), // hour 0: mean 3.0
      (1L, ts(3, 5), 9.0),                        // hours 1-2 are gaps
      (2L, ts(5), 7.0))                           // single-bucket user
      .toDF("user_id", "t", "value")
    val out = TimeSeries.resampleFfill(ev, "user_id", "t", "value", "hour")
      .select(col("user_id"), hour(col("bucket")).as("h"),
        col("value_ffill"), col("n_events"))
      .as[(Long, Int, Double, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 3.0, 2L),   // real bucket, mean of 2 events
      (1L, 1, 3.0, 0L),   // gap: carries hour 0's value
      (1L, 2, 3.0, 0L),   // gap
      (1L, 3, 9.0, 1L),   // real bucket again
      (2L, 5, 7.0, 1L)),  // span is [first, last] per user — no padding
      s"got $out")
  }

  test("resampleFfill grid is bounded by span, independent of event density") {
    val dense = (0 until 500).map(i => (1L, ts(1, i % 60), i.toDouble))
    val out = TimeSeries.resampleFfill(dense.toDF("user_id", "t", "value"),
      "user_id", "t", "value", "hour").collect()
    assert(out.length == 1, "500 events in one hour -> one grid row")
    assert(out.head.getLong(3) == 500L)
  }

  // --- ewmaAnomaly ---------------------------------------------------------

  private def series(rows: (Long, String, Double)*) =
    rows.toDF("event_id", "key", "value")
      .withColumn("t", expr("timestamp_micros(event_id * 1000000)"))
      .repartition(5) // smoothing must not depend on input partitioning

  test("ewmaAnomaly equals the hand-computed finite-window EWMA, head renormalized") {
    val out = TimeSeries.ewmaAnomaly(
      series((1L, "k", 10.0), (2L, "k", 20.0), (3L, "k", 30.0)),
      "key", "t", "event_id", "value", w = 2)
      .orderBy("event_id").collect()
    // w=2, alpha=1/2 → weights (1/2, 1/4); heads renormalize by the
    // weight mass actually present:
    //   row1: (10·½)           / ½    = 10
    //   row2: (20·½ + 10·¼)    / ¾    = 12.5/0.75
    //   row3: (30·½ + 20·¼)    / ¾    = 20/0.75
    val ewma = out.map(_.getAs[Double]("ewma")).toSeq
    assert(ewma(0) == 10.0)
    assert(ewma(1) == 12.5 / 0.75)
    assert(ewma(2) == 20.0 / 0.75)
    assert(out.map(_.getAs[Int]("is_spike")).toSeq == Seq(0, 0, 0))
  }

  test("spike fires vs the PRIOR level only; the head row never flags") {
    val out = TimeSeries.ewmaAnomaly(
      series((1L, "k", 1.0), (2L, "k", 1.0), (3L, "k", 100.0), (4L, "k", 1.0)),
      "key", "t", "event_id", "value", w = 2)
      .orderBy("event_id").collect()
    // row3: prior level 1.0 → 100 > 4·1 → spike. row4 compares against
    // the level that already absorbed the spike → no flag; and row1 has
    // no prior level at all.
    assert(out.map(_.getAs[Int]("is_spike")).toSeq == Seq(0, 0, 1, 0))
    // the spike itself still enters the level (flag, don't drop)
    assert(out(3).getAs[Double]("ewma") > 10.0)
  }

  test("ewmaAnomaly series never bleed across keys") {
    val out = TimeSeries.ewmaAnomaly(
      series((1L, "a", 100.0), (2L, "b", 1.0), (3L, "a", 100.0), (4L, "b", 1.0)),
      "key", "t", "event_id", "value", w = 4)
      .orderBy("event_id").collect()
    // interleaved constant series: each key's level is exactly its own
    // constant, and nothing flags
    assert(out.map(r => (r.getAs[String]("key"), r.getAs[Double]("ewma"))).toSeq ==
      Seq(("a", 100.0), ("b", 1.0), ("a", 100.0), ("b", 1.0)))
    assert(out.forall(_.getAs[Int]("is_spike") == 0))
  }

  test("ewmaAnomaly plan: one shuffle on the series key, no join, no collect") {
    val df = TimeSeries.ewmaAnomaly(Tables.events(spark, "/root/testdata/sf0.001"),
      "event_type", "ts", "event_id", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    // every hash exchange is keyed on the series key (sort-based window
    // passes reuse the same partitioning; nothing else shuffles)
    val hashExchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(hashExchanges.nonEmpty && hashExchanges.forall(_.contains("event_type")),
      s"shuffle not keyed on series key:\n$hashExchanges")
  }

  test("peakConcurrency: sweep-line counts overlaps, half-open at the boundary") {
    def iv(key: String, s: Long, e: Long) = (key, s, e)
    val df = Seq(
      // key a: [0,10) [5,15) [20,30) -> peak 2, first at t=5
      iv("a", 0L, 10L), iv("a", 5L, 15L), iv("a", 20L, 30L),
      // key b: back-to-back [0,10) [10,20) NEVER overlap (half-open) -> peak 1 at 0
      iv("b", 0L, 10L), iv("b", 10L, 20L),
      // key c: three spanning one instant -> peak 3 at 7
      iv("c", 0L, 10L), iv("c", 5L, 10L), iv("c", 7L, 9L))
      .toDF("k", "s", "e").repartition(5)
    val out = TimeSeries.peakConcurrency(df, "k", col("s"), col("e"))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 2L, 5L), ("b", 1L, 0L), ("c", 3L, 7L)), s"got $out")
  }

  test("peakConcurrency plan: one key shuffle feeding both window passes") {
    val df = TimeSeries.peakConcurrency(
      Tables.events(spark, "/root/testdata/sf0.001"), "event_type",
      unix_micros(col("ts")), unix_micros(col("ts")) + lit(1800000000L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sweep-line must not join:\n$plan")
    val hashExchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(hashExchanges.nonEmpty && hashExchanges.forall(_.contains("event_type")),
      s"every exchange keyed on the sweep key:\n$hashExchanges")
  }

  test("islands: value-change runs split correctly, revisited values start new islands") {
    val df = Seq(
      // user a: A A B A -> islands (A,2) (B,1) (A,1) — the return to A is NEW
      (1L, "a", "A"), (2L, "a", "A"), (3L, "a", "B"), (4L, "a", "A"),
      // user b: one long streak
      (5L, "b", "C"), (6L, "b", "C"), (7L, "b", "C"))
      .toDF("event_id", "user", "state")
      .withColumn("t", expr("timestamp_micros(event_id * 1000000)"))
      .repartition(4)
    val out = TimeSeries.islands(df, "user", "t", "event_id", "state")
      .select($"user", $"state", $"island_len", $"start_id", $"end_id")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "A", 2L, 1L, 2L), ("a", "B", 1L, 3L, 3L), ("a", "A", 1L, 4L, 4L),
      ("b", "C", 3L, 5L, 7L)), s"got $out")
  }

  test("generated EWMA oracle SQL forces doubles and mirrors both window passes") {
    val sql = TimeSeries.ewmaAnomalySql("events", "event_type", "ts",
      "event_id", "value")
    // DuckDB parses bare decimals as DECIMAL; every coefficient must be
    // forced to double via e-notation
    TimeSeries.weights(8).foreach { c =>
      val s = c.toString
      val expect = if (s.contains("e") || s.contains("E")) s else s + "e0"
      assert(sql.contains(expect), s"missing coefficient $expect in:\n$sql")
    }
    assert(!sql.matches("(?s).*[^e\\d]0\\.\\d+\\s.*"), s"bare decimal in:\n$sql")
    assert(sql.contains("WINDOW win AS") && sql.contains("WINDOW win2 AS"))
  }
}
