package graft

import java.sql.Timestamp

import graft.operators.SkewAgg
import graft.streaming.EventAggregates
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class EventAggregatesSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long, tpe: String, v: Double) =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, tpe, v)

  private val batch = Seq(
    ev(0, 1, 1, "click", 1.0), ev(1, 3, 1, "view", 2.0),
    ev(2, 7, 2, "click", 3.0), ev(3, 2, 2, "click", 4.0), // out of order
    ev(4, 45, 1, "click", 5.0),                            // new session for user 1
    ev(5, 46, 2, "view", 6.0))

  /** Same operator applied to the batch DataFrame pins the streaming
    * result (unified semantics): run streaming via MemoryStream, compare
    * to the batch run.
    */
  test("streaming tumbling counts equal the batch run of the same operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.tumblingCounts(input.toDF(), "ts", "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val streaming = spark.table("tumbling")
        .orderBy("window_start", "event_type").collect().toSeq
      val batchRun = EventAggregates.tumblingCounts(batch.toDF(), "ts", "10 minutes", "30 minutes")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streaming == batchRun)
      assert(streaming.map(_.getAs[Long]("n")).sum == batch.size.toLong)
    } finally q.stop()
  }

  test("streaming sliding windows equal the batch run (4 hops per event)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.slidingCounts(input.toDF(), "ts", "20 minutes",
      "5 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val streaming = spark.table("sliding")
        .orderBy("window_start", "event_type").collect().toSeq
      val batchRun = EventAggregates.slidingCounts(batch.toDF(), "ts",
        "20 minutes", "5 minutes", "30 minutes")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streaming == batchRun)
      // every event lands in exactly window/slide = 4 hops
      assert(streaming.map(_.getAs[Long]("n")).sum == 4L * batch.size)
    } finally q.stop()
  }

  test("streaming session windows merge by gap and equal the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.sessionCounts(input.toDF(), "ts", "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val streaming = spark.table("sessions")
        .orderBy("user_id", "session_start").collect().toSeq
      val batchRun = EventAggregates.sessionCounts(batch.toDF(), "ts", "30 minutes", "1 hour")
        .orderBy("user_id", "session_start").collect().toSeq
      assert(streaming == batchRun)
      // user 1: events at 10:01/10:03 then 10:45 -> two sessions
      assert(streaming.count(_.getAs[Long]("user_id") == 1L) == 2)
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.dedupWithinWatermark(input.toDF(), "ts", "1 hour", Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val out = spark.table("dedup_stream").select("event_id").as[Long].collect().toSet
      // (1,click) first occurrence id=0; (2,click) id=2 or 3? batch arrival order: id 2 then 3
      assert(out.contains(0L) && !out.contains(4L), "later (1,click) dropped")
      assert(out.contains(1L) && out.contains(5L))
      assert(out.intersect(Set(2L, 3L)).size == 1, "exactly one (2,click) survives")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join and bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    def shape(df: org.apache.spark.sql.DataFrame, p: String) =
      df.select(col("event_id").as(s"${p}_id"), col("user_id"),
        col("ts").as(s"${p}_ts"))
    val joined = EventAggregates.intervalJoin(
      shape(clicks.toDF(), "click"), shape(purchases.toDF(), "purchase"),
      "user_id", "click_ts", "purchase_ts", "1 hour", "0 seconds", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Seq(ev(0, 1, 1, "click", 1.0), ev(1, 30, 2, "click", 2.0)))
      purchases.addData(Seq(
        ev(10, 5, 1, "purchase", 9.0),   // 4 min after click 0 -> match
        ev(11, 50, 2, "purchase", 8.0),  // 20 min after click 1 -> no match
        ev(12, 2, 2, "purchase", 7.0)))  // before user 2's click -> no match
      q.processAllAvailable()
      val got = spark.table("ssjoin").select("click_id", "purchase_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((0L, 10L)))
    } finally q.stop()
  }

  test("streaming distinct users per window via theta sketch equals the batch run and the true distincts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.tumblingDistinctUsers(input.toDF(), "ts",
      "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("tdu")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val streaming = spark.table("tdu")
        .orderBy("window_start").as[(Timestamp, Long)].collect().toSeq
      val batchRun = EventAggregates.tumblingDistinctUsers(batch.toDF(), "ts",
        "10 minutes", "30 minutes")
        .orderBy("window_start").as[(Timestamp, Long)].collect().toSeq
      assert(streaming == batchRun)
      // exact regime (users << k): estimates ARE the true distincts
      val exact = batch.groupBy(e =>
        new Timestamp(e.ts.getTime / 600000 * 600000))
        .view.mapValues(_.map(_.user_id).distinct.size.toLong)
        .toSeq.sortBy(_._1.getTime)
      assert(streaming.map { case (t, n) => (t.getTime, n) } ==
        exact.map { case (t, n) => (t.getTime, n) })
    } finally q.stop()
  }

  test("streaming heavy hitters per window equal the batch run and the true hot items") {
    implicit val sqlCtx = spark.sqlContext
    // skewed item stream: one hot event_type per window plus singletons
    val hh = Seq.tabulate(40)(i => ev(100 + i, 1 + i % 8, i % 3, "hot_a", 1.0)) ++
      Seq(ev(200, 2, 9, "rare_x", 1.0), ev(201, 4, 9, "rare_y", 1.0)) ++
      Seq.tabulate(20)(i => ev(300 + i, 41 + i % 8, i % 3, "hot_b", 1.0)) ++
      Seq(ev(400, 42, 9, "rare_z", 1.0))
    val input = MemoryStream[Ev]
    val q = EventAggregates.tumblingHeavyHitters(input.toDF(), "ts",
      "event_type", "10 minutes", "30 minutes", minShare = 0.2)
      .writeStream.format("memory").queryName("thh")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(hh)
      q.processAllAvailable()
      val streaming = spark.table("thh")
        .orderBy("window_start", "item").as[(Timestamp, String, Long)].collect().toSeq
      val batchRun = EventAggregates.tumblingHeavyHitters(hh.toDF(), "ts",
        "event_type", "10 minutes", "30 minutes", minShare = 0.2)
        .orderBy("window_start", "item").as[(Timestamp, String, Long)].collect().toSeq
      assert(streaming == batchRun)
      // exact regime (items << map capacity): the sketch reports exactly
      // the items above the share with their true counts, nothing else
      assert(streaming == Seq(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "hot_a", 40L),
        (Timestamp.valueOf("2024-01-01 10:40:00"), "hot_b", 20L)))
    } finally q.stop()
  }

  test("stream-static dim enrichment equals the batch join; dim side broadcast") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val q = EventAggregates.enrichWithDim(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val streaming = spark.table("enriched")
        .select("event_id", "tier").as[(Long, String)].collect().toSet
      val batchRun = EventAggregates.enrichWithDim(batch.toDF(), dim, "user_id")
        .select("event_id", "tier").as[(Long, String)].collect().toSet
      assert(streaming == batchRun && streaming.size == batch.size)
      assert(streaming.forall { case (_, tier) => tier == "gold" || tier == "basic" })
    } finally q.stop()
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val direct = df.groupBy(col("event_type"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .orderBy("event_type").collect().toSeq
    val salted = SkewAgg.saltedSumCount(df, "event_type", "value", "event_id", 16)
      .orderBy("event_type").collect().toSeq
    // counts identical; double sums compared with tolerance (association order differs)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0))
      assert(d.getAs[Long]("n") == s.getAs[Long]("n"))
      assert(math.abs(d.getAs[Double]("sum_value") - s.getAs[Double]("sum_value")) < 1e-6)
    }
  }

  test("salted join equals the plain join on a planted hot key") {
    import spark.implicits._
    // 900 of 1000 probe rows share key 7 — the hot-key shape
    val probe = (0 until 1000).map(i =>
      (if (i < 900) 7L else i.toLong % 50, i.toLong)).toDF("k", "row_id")
    val build = (0L until 50L).map(k => (k, s"v$k")).toDF("k", "payload")
    val plain = probe.join(build, Seq("k"))
      .select("k", "row_id", "payload").as[(Long, Long, String)].collect().toSet
    val salted = graft.operators.SkewJoin
      .saltedInnerJoin(probe, build, "k", "row_id", buckets = 8)
      .select("k", "row_id", "payload").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 1000, "every probe row must match exactly once")
  }
}
