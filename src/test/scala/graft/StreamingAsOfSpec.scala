package graft

import graft.operators.TemporalJoins
import graft.streaming.StreamingAsOf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming as-of join pinned to its batch twin
  * ([[TemporalJoins.asOfJoin]], the `q_asof_join` oracle shape): the
  * same out-of-order fact/dimension rows fed through MemoryStreams must
  * produce exactly the batch result, including late-arriving dimension
  * versions that an on-arrival lookup would have missed.
  */
final case class Fact(user_id: Long, event_id: Long, ts: Long)
final case class DimVer(user_id: Long, click_ts: Long, click_id: Long,
    click_value: Double)

class StreamingAsOfSpec extends SparkTestBase {
  import spark.implicits._

  // facts: per-user error events; dims: click versions. Disorder within
  // 10s everywhere; user 7's fact at t=30000 must pick the LATE dim
  // version at t=25000 that arrives two micro-batches after the fact.
  private val facts = Seq(
    Fact(7L, 100L, 30000L), Fact(7L, 101L, 5000L),
    Fact(8L, 200L, 12000L), Fact(9L, 300L, 4000L)) // user 9: no dim at all
  private val dims = Seq(
    DimVer(7L, 2000L, 1L, 0.5), DimVer(7L, 25000L, 2L, 1.5),
    DimVer(7L, 25000L, 3L, 2.5), // same-ts tie: greatest click_id wins
    DimVer(8L, 12000L, 4L, 3.5), // exact-ts tie with the fact: eligible (>=)
    DimVer(8L, 90000L, 5L, 4.5)) // future version: never visible to 12000

  private def runStreaming(
      feed: (MemoryStream[Fact], MemoryStream[DimVer],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[(Long, Long, Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[Fact]
    val dIn = MemoryStream[DimVer]
    // 40s watermark delay: the fixture's max disorder is ~26s (fact 30000
    // seen in batch 1, fact 4000 arriving in batch 3) — the delay must
    // cover the full disorder or the engine drops the old rows as late
    val q = StreamingAsOf.join[Fact, DimVer](
        fIn.toDS(), _.user_id.toString, _.ts, _.event_id,
        dIn.toDS(), _.user_id.toString, _.click_ts, _.click_id,
        "40 seconds")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode(OutputMode.Append).start()
    try {
      feed(fIn, dIn, q)
      // sentinel on one side advances the UNION's single watermark past
      // every real row, flushing all pending facts
      fIn.addData(Fact(999L, 999L, 10_000_000L))
      q.processAllAvailable()
      spark.table("asof_stream")
        .filter(col("key") =!= "999")
        .select(col("left.event_id"), col("ts"), col("right.click_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(_._1).toSeq
    } finally q.stop()
  }

  private def batchExpected: Seq[(Long, Long, Option[Long])] = {
    val left = facts.toDF()
    val right = dims.toDF()
    TemporalJoins.asOfJoin(left, right, "user_id", "ts", "click_ts",
        "click_id", Seq("click_ts", "click_id", "click_value"))
      .select(col("event_id"), col("ts"), col("asof_click_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
  }

  test("streamed as-of equals the batch twin on out-of-order input with a late dimension") {
    val streamed = runStreaming { (fIn, dIn, q) =>
      // batch 1: the newest fact FIRST (out of order), one early dim
      fIn.addData(Fact(7L, 100L, 30000L))
      dIn.addData(DimVer(7L, 2000L, 1L, 0.5))
      q.processAllAvailable()
      // batch 2: older facts arrive late but within the 40s watermark;
      // the dim version 25000 lands AFTER the fact at 30000 was seen —
      // an on-arrival lookup would have wrongly matched version 2000
      fIn.addData(Fact(7L, 101L, 5000L), Fact(8L, 200L, 12000L))
      dIn.addData(DimVer(7L, 25000L, 2L, 1.5), DimVer(7L, 25000L, 3L, 2.5))
      q.processAllAvailable()
      // batch 3: remaining rows, including the exact-ts tie for user 8
      fIn.addData(Fact(9L, 300L, 4000L))
      dIn.addData(DimVer(8L, 12000L, 4L, 3.5), DimVer(8L, 90000L, 5L, 4.5))
      q.processAllAvailable()
    }
    assert(streamed == batchExpected)
    // the load-bearing rows, stated explicitly so a regression reads:
    assert(streamed.find(_._1 == 100L).get._3 == Some(3L),
      "fact 30000 must see the LATE version 25000 (max tiebreak), not 2000")
    assert(streamed.find(_._1 == 200L).get._3 == Some(4L),
      "exact-ts dimension version is eligible (>= semantics)")
    assert(streamed.find(_._1 == 300L).get._3 == None,
      "no version for the key -> left-join null")
  }

  test("single-batch feed equals the batch twin too (no ordering luck)") {
    val streamed = runStreaming { (fIn, dIn, q) =>
      fIn.addData(facts)
      dIn.addData(dims)
      q.processAllAvailable()
    }
    assert(streamed == batchExpected)
  }

  test("dimension state collapses to the retained current version, facts drain") {
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[Fact]
    val dIn = MemoryStream[DimVer]
    val q = StreamingAsOf.join[Fact, DimVer](
        fIn.toDS(), _.user_id.toString, _.ts, _.event_id,
        dIn.toDS(), _.user_id.toString, _.click_ts, _.click_id,
        "10 seconds")
      .writeStream.format("memory").queryName("asof_state")
      .outputMode(OutputMode.Append).start()
    try {
      dIn.addData(DimVer(1L, 1000L, 1L, 0.1), DimVer(1L, 2000L, 2L, 0.2),
        DimVer(1L, 3000L, 3L, 0.3))
      q.processAllAvailable()
      fIn.addData(Fact(1L, 10L, 50000L)) // advances watermark to 40000
      q.processAllAvailable()
      fIn.addData(Fact(1L, 11L, 100000L)) // flushes fact 50000
      q.processAllAvailable()
      // fact 50000 saw the latest collapsed version (3000, id 3) even
      // though versions 1000/2000 were pruned long before it flushed
      val row = spark.table("asof_state")
        .filter(col("left.event_id") === 10L).collect().head
      assert(row.getAs[org.apache.spark.sql.Row]("right").getLong(2) == 3L)
    } finally q.stop()
  }
}
