package graft

import java.sql.Timestamp

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest prior right row; no prior -> nulls; exact tie included") {
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:00:05")),
      (2L, "A", t("2024-01-01 10:00:00")), // exact tie with quote 20
      (3L, "B", t("2024-01-01 09:00:00")), // before any B quote
      (4L, "B", t("2024-01-01 12:00:00")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (10L, "A", t("2024-01-01 09:59:00"), 1.0),
      (20L, "A", t("2024-01-01 10:00:00"), 2.0),
      (30L, "B", t("2024-01-01 11:00:00"), 3.0))
      .toDF("quote_id", "sym", "qts", "px")
    val out = TemporalJoins.asOfJoin(trades, quotes, "sym", "ts", "qts",
        "quote_id", Seq("quote_id", "px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_quote_id", "asof_px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(out == Seq(
      (1L, Some(20L), Some(2.0)),   // latest prior
      (2L, Some(20L), Some(2.0)),   // tie at same instant included (>= semantics)
      (3L, None, None),             // nothing prior
      (4L, Some(30L), Some(3.0))))
  }

  test("asOfJoin fills the right payload atomically — a NULL field in the latest row stays NULL") {
    val trades = Seq((1L, "A", t("2024-01-01 10:05:00"))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (10L, "A", t("2024-01-01 10:00:00"), Some(1.0)),
      (20L, "A", t("2024-01-01 10:02:00"), None)) // latest row has NULL px
      .toDF("quote_id", "sym", "qts", "px")
    val out = TemporalJoins.asOfJoin(trades, quotes, "sym", "ts", "qts",
        "quote_id", Seq("quote_id", "px")).head()
    assert(out.getAs[Long]("asof_quote_id") == 20L)
    assert(out.isNullAt(out.fieldIndex("asof_px")),
      "px must come from the SAME row as quote_id, not be backfilled from an older row")
  }

  test("rangeJoin finds exactly the pairs within tolerance, including bucket boundaries") {
    val l = Seq((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:10:00")))
      .toDF("lid", "ts")
    val r = Seq(
      (10L, t("2024-01-01 10:00:59")),  // within 60s of lid 1
      (11L, t("2024-01-01 10:01:01")),  // 61s after lid 1 -> out
      (12L, t("2024-01-01 10:09:00")))  // 60s before lid 2 (boundary, inclusive)
      .toDF("rid", "rts")
    val got = TemporalJoins.rangeJoin(l, r, "ts", "rts", 60000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 12L)))
  }
}
