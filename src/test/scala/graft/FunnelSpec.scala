package graft

import org.apache.spark.sql.functions._

/** Planted edge cases for the conversion-funnel query shape (the
  * registered `q_funnel` runs the same plan over the events table; its
  * values are oracle-checked — this pins the boundary semantics).
  */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  test("funnel counts only purchases in (first_click, first_click + 30min]") {
    val ev = Seq(
      // user 1: purchase BEFORE any click — not a conversion
      (1L, 1L, "purchase", 1000L),
      (2L, 1L, "click", 2000L),
      // user 2: click then purchase inside the window
      (3L, 2L, "click", 10000L),
      (4L, 2L, "purchase", 10000L + 29 * 60 * 1000L),
      // user 3: click then purchase OUTSIDE the window (31 min)
      (5L, 3L, "click", 10000L),
      (6L, 3L, "purchase", 10000L + 31 * 60 * 1000L),
      // user 4: purchase exactly AT the 30-min boundary — inclusive
      (7L, 4L, "click", 0L),
      (8L, 4L, "purchase", 30 * 60 * 1000L),
      // user 5: purchases only, no click — absent from output
      (9L, 5L, "purchase", 500L))
      .toDF("event_id", "user_id", "event_type", "tsl")
      .withColumn("ts", expr("timestamp_micros(tsl * 1000)")).drop("tsl")

    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("_pts"))
    val out = firstClick.join(purchases, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("first_click_ts"))
      .agg(min(when(col("_pts") >= col("first_click_ts") &&
          col("_pts") <= col("first_click_ts") + expr("INTERVAL 30 MINUTES"),
        col("_pts"))).as("first_purchase_ts"))
      .withColumn("converted", col("first_purchase_ts").isNotNull)
      .select(col("user_id"), col("converted"))
      .as[(Long, Boolean)].collect().toMap

    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true),
      s"got $out")
  }
}
