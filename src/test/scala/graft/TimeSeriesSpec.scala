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
}
