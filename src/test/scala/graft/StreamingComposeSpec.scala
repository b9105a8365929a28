package graft

import graft.model.ElectronicOrder
import graft.streaming.StreamingReorder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Chained stateful operators in ONE streaming query: the reorder buffer
  * ([[StreamingReorder.faithfulV2Chained]], which declares its output
  * event-time column via `transformWithState`'s `eventTimeColumnName`
  * overload) feeding a tumbling-window aggregation downstream — the
  * pipeline shape a real deployment wants (reorder, then aggregate)
  * without a topic/sink hop in between. The v1 API rejects this chain
  * (no way to re-derive the downstream watermark); v2 makes it legal.
  */
class StreamingComposeSpec extends SparkTestBase {
  import spark.implicits._

  private def t(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  test("reorder chains into a tumbling aggregation in the same streaming query") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // out-of-order records over two 1-hour windows, 10-minute grace
      val graceMs = 10L * 60 * 1000
      val data = Seq(
        ElectronicOrder("1", "one", "a", 10.0, t("2021-11-04T01:05:00Z")),
        ElectronicOrder("2", "one", "b", 20.0, t("2021-11-04T01:02:00Z")), // late vs 1
        ElectronicOrder("3", "one", "c", 30.0, t("2021-11-04T01:55:00Z")),
        ElectronicOrder("4", "one", "d", 40.0, t("2021-11-04T02:10:00Z")),
        ElectronicOrder("5", "one", "e", 50.0, t("2021-11-04T02:05:00Z"))) // late vs 4
      val input = MemoryStream[ElectronicOrder]
      val counts = StreamingReorder.faithfulV2Chained(input.toDS(), graceMs)
        .groupBy(window(col("event_time"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sum(col("price")).as("sum_price"))
        .select(col("w.start").cast("long").as("w_start"), col("n"), col("sum_price"))
      val q = counts.writeStream.format("memory").queryName("compose")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(data)
        q.processAllAvailable()
        // sentinels march the watermark far enough to flush the reorder
        // buffers AND close both aggregation windows; each advance needs
        // its own micro-batch for the timers to fire and propagate
        for (h <- Seq("05", "09", "13")) {
          input.addData(Seq(
            ElectronicOrder("s", "one", "z", 0.0, t(s"2021-11-04T$h:00:00Z"))))
          q.processAllAvailable()
        }
        val got = spark.table("compose")
          .as[(Long, Long, Double)].collect().toSet
        val expected = Set(
          (t("2021-11-04T01:00:00Z") / 1000, 3L, 60.0), // records 1,2,3
          (t("2021-11-04T02:00:00Z") / 1000, 2L, 90.0)) // records 4,5
        assert(got.intersect(expected) == expected,
          s"chained reorder->window must reproduce the batch windows, got $got")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
