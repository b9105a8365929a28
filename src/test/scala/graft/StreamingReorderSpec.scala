package graft

import graft.io.AvroCodec
import graft.model.ElectronicOrder
import graft.streaming.StreamingReorder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Port of the reference's golden topology test
  * (ApplicationTest.java:28-128) onto MemoryStream + memory sink, plus the
  * dedup/late-data behaviors the reference leaves untested (SURVEY §5).
  */
class StreamingReorderSpec extends SparkTestBase {
  import spark.implicits._

  private val GraceMs = 10L * 3600 * 1000 // 10 hours, Application.java:144

  private def t(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  private val fixture = Seq(
    ElectronicOrder("1", "one", "vandeley", 5.0, t("2021-11-03T23:00:00Z")),
    ElectronicOrder("2", "one", "penny-packer", 15.0, t("2021-11-04T01:05:00Z")),
    ElectronicOrder("3", "one", "romanov", 25.0, t("2021-11-04T01:10:00Z")),
    ElectronicOrder("4", "one", "david", 35.0, t("2021-11-04T01:40:00Z")),
    ElectronicOrder("5", "one", "jerry", 45.0, t("2021-11-04T02:25:00Z")),
    ElectronicOrder("6", "one", "natalie", 55.0, t("2021-11-04T01:20:00Z")),
    ElectronicOrder("7", "one", "lisa", 65.0, t("2021-11-04T02:45:00Z")),
    ElectronicOrder("8", "one", "gavin", 75.0, t("2021-11-04T02:00:00Z")),
    ElectronicOrder("9", "one", "paul", 85.0, t("2021-11-04T03:00:00Z")),
    ElectronicOrder("10", "one", "martin", 95.0, t("2021-11-04T02:40:00Z")),
    ElectronicOrder("11", "one", "rebecca", 105.0, t("2021-11-04T02:20:00Z")),
    ElectronicOrder("12", "one", "jessica", 115.0, t("2021-11-05T00:00:00Z")))

  private val goldenOrder = Seq("1", "2", "3", "6", "4", "8", "11", "5", "10", "7", "9", "12")

  /** Run the faithful operator over batches of input; returns emitted
    * order_ids in emission order.
    */
  private def runFaithful(batches: Seq[Seq[ElectronicOrder]],
      name: String): Seq[StreamingReorder.Reordered] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ElectronicOrder]
    val q = StreamingReorder.faithful(input.toDS(), GraceMs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // extra empty pass lets event-time timeouts fire on the final watermark
      q.processAllAvailable()
      spark.table(name).as[StreamingReorder.Reordered].collect().toSeq
    } finally q.stop()
  }

  test("faithful operator reproduces the reference golden output (values + order)") {
    val out = runFaithful(Seq(fixture), "golden")
    assert(out.map(_.order_id) == goldenOrder)
    // S4: output keys are the synthetic store keys
    assert(out.map(_.key) == fixture.map(_.time).sorted.map(ti => s"key-$ti"))
  }

  test("faithful operator drops an intra-epoch duplicate timestamp, first wins (S3)") {
    val dup = ElectronicOrder("13", "one", "late-dup", 999.0, t("2021-11-04T01:05:00Z"))
    val out = runFaithful(Seq(fixture.take(6) :+ dup, fixture.drop(6)), "dedup")
    assert(out.map(_.order_id) == goldenOrder, "duplicate of order 2's timestamp must be dropped")
  }

  test("multi-batch input still yields chronological output per flush epoch") {
    val out = runFaithful(Seq(fixture.take(4), fixture.slice(4, 8), fixture.drop(8)), "multibatch")
    assert(out.map(_.order_id).sorted == goldenOrder.sorted, "all records emitted")
    // within each flush epoch emission is time-ordered; verify global
    // monotonicity here because disorder in the fixture is < grace
    assert(out.map(_.time) == out.map(_.time).sorted)
  }

  test("idiomatic variant: dedup-within-watermark + sink-side sort matches golden") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ElectronicOrder]
    val collected = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingReorder.idiomatic(input.toDS(), GraceMs)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= batch.orderBy(col("time")).select("order_id").as[String](
          org.apache.spark.sql.Encoders.STRING).collect()
        ()
      }.start()
    try {
      input.addData(fixture :+
        ElectronicOrder("13", "one", "dup", 1.0, t("2021-11-04T01:05:00Z")))
      q.processAllAvailable()
    } finally q.stop()
    assert(collected.toSeq == goldenOrder)
  }

  test("reorder state survives a query stop/restart from the checkpoint") {
    // the exactly-once story at production scale: buffer records, kill
    // the query BEFORE any flush, restart from the checkpoint, then
    // advance the watermark — every record must emit exactly once, in
    // order, from the RESTORED state
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[ElectronicOrder]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[String]
    // foreachBatch, not the memory sink: only fault-tolerant sinks may
    // recover from a checkpoint
    def start() = StreamingReorder.faithful(input.toDS(), GraceMs)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamingReorder.Reordered], _: Long) =>
          emitted.synchronized {
            emitted ++= batch.orderBy(col("time")).select("order_id")
              .as[String](org.apache.spark.sql.Encoders.STRING).collect()
          }
          ()
      }.start()

    val q1 = start()
    try {
      input.addData(fixture.take(8)) // all within grace — nothing flushes
      q1.processAllAvailable()
      assert(emitted.isEmpty, "no flush before the watermark moves")
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(fixture.drop(8)) // includes order 12, a day later -> flush
      q2.processAllAvailable()
      q2.processAllAvailable() // extra pass fires the event-time timeout
      // the full golden output, exactly once, in order — identical to the
      // never-restarted run (the extra pass fires 12's epoch too)
      assert(emitted.toSeq == goldenOrder,
        s"restored buffer must flush the golden output, got ${emitted.toSeq}")
    } finally q2.stop()
  }

  test("README demo fixture (B2) reorders to the documented consumer output") {
    // README.md:45-56 input order; key HDTV-2333; expected = ascending time
    // (README.md:77-88). FIXTURES.md §B2.
    val times = Seq(
      1635980400000L, 1635987600000L, 1635984000000L, 1635998400000L,
      1635991200000L, 1636002000000L, 1635994800000L, 1636005600000L,
      1636009200000L, 1636012800000L, 1636016400000L, 1636070400000L)
    val input = times.zipWithIndex.map { case (tm, i) =>
      ElectronicOrder("instore-1", "HDTV-2333", s"u$i", 2000.0 + i, tm)
    }
    val out = runFaithful(Seq(input), "readme_golden")
    assert(out.map(_.time) == times.sorted)
    assert(out.map(_.key) == times.sorted.map(tm => s"key-$tm"))
    assert(out.forall(_.electronic_id == "HDTV-2333"))
  }

  test("faithful operator runs on the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = runFaithful(Seq(fixture), "rocksdb_golden")
      assert(out.map(_.order_id) == goldenOrder,
        "same golden output when state lives in RocksDB (the reference's store engine)")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("faithfulV2 (transformWithState) reproduces the golden output on RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[ElectronicOrder]
      val q = StreamingReorder.faithfulV2(input.toDS(), GraceMs)
        .writeStream.format("memory").queryName("v2_golden")
        .outputMode(OutputMode.Append).start()
      try {
        // split input + a duplicate timestamp: multi-batch timers + S3
        val dup = ElectronicOrder("13", "one", "late-dup", 999.0, t("2021-11-04T01:05:00Z"))
        Seq(fixture.take(6) :+ dup, fixture.drop(6)).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        q.processAllAvailable() // let the event-time timer fire
        val out = spark.table("v2_golden").as[StreamingReorder.Reordered].collect().toSeq
        assert(out.map(_.order_id) == goldenOrder, "golden values + order, dup dropped")
        assert(out.map(_.key) == fixture.map(_.time).sorted.map(ti => s"key-$ti"), "S4 keys")
        assert(out.map(_.flush_time).distinct.forall(_ > 0), "S5 stamps present")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("documented divergence (SURVEY S1/7.4): disorder beyond grace is dropped, not re-buffered") {
    // record 13 arrives in a later batch with event time > grace older than
    // the watermark; Kafka Streams would re-buffer and emit it late, Spark's
    // stateful operator drops it — encode the divergence so it stays a
    // conscious decision.
    val tooLate = ElectronicOrder("13", "one", "straggler", 1.0, t("2021-11-03T20:00:00Z"))
    val out = runFaithful(Seq(fixture, Seq(tooLate)), "latedrop")
    assert(!out.map(_.order_id).contains("13"), "beyond-grace record is dropped by design")
    assert(out.map(_.order_id) == goldenOrder)
  }

  /** Run the late-output variant over batches; returns rows in emission order. */
  private def runLate(batches: Seq[Seq[ElectronicOrder]],
      name: String): Seq[StreamingReorder.Reordered] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ElectronicOrder]
    val q = StreamingReorder.withLateOutput(input.toDS(), GraceMs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingReorder.Reordered].collect().toSeq
    } finally q.stop()
  }

  test("withLateOutput matches the golden output on the reference fixture") {
    val out = runLate(Seq(fixture), "late_golden")
    assert(out.map(_.order_id) == goldenOrder)
    assert(out.map(_.key) == fixture.map(_.time).sorted.map(ti => s"key-$ti"))
  }

  test("withLateOutput: beyond-grace straggler IS emitted — late, locally sorted (S1 fidelity)") {
    // the sibling of `latedrop`: same input, opposite (reference-faithful)
    // behavior — Kafka Streams re-buffers beyond-grace records and emits
    // them at the NEXT stream-time punctuation (Application.java:73-82).
    // Punctuation is a fixed stream-time interval, so the straggler alone
    // cannot fire it (its time is behind stream time); a successor record
    // advancing stream time past the next deadline flushes both.
    val tooLate = ElectronicOrder("13", "one", "straggler", 1.0, t("2021-11-03T20:00:00Z"))
    val advancer = ElectronicOrder("14", "one", "late-epoch", 2.0, t("2021-11-05T11:00:00Z"))
    val out = runLate(Seq(fixture, Seq(tooLate), Seq(advancer)), "late_emit")
    assert(out.map(_.order_id) == goldenOrder ++ Seq("13", "14"),
      "straggler must flush in the next punctuation epoch, after the golden prefix")
    assert(out.map(_.order_id).take(12) == goldenOrder)
    // the straggler-only batch must NOT flush (stream time did not advance
    // past the deadline): S5 stamps prove 13 and 14 share one flush epoch
    assert(out.drop(12).map(_.flush_time).distinct.size == 1)
    assert(out(12).key == s"key-${tooLate.time}")
  }

  test("withLateOutput: a buffer younger than grace stays buffered (stream-time punctuation, S6)") {
    // disorder window < grace and no successor data: the reference's
    // STREAM_TIME punctuation cannot fire, so nothing may be emitted
    val out = runLate(Seq(fixture.take(4)), "late_hold")
    assert(out.isEmpty, "no flush before stream time passes oldest + grace")
  }

  test("withLateOutput idle-key TTL drops empty state rows, keeps buffered tails, output unchanged") {
    // NOTE: with ProcessingTimeTimeout, FlatMapGroupsWithStateExec reports
    // shouldRunAnotherBatch = true on every trigger, so the engine runs
    // timeout-sweep batches continuously and processAllAvailable() never
    // sees the noNewData latch — this test must POLL sink/state metrics,
    // never call processAllAvailable (learned the hard way: it hangs).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ElectronicOrder]
    val ttlMs = 1000L
    val q = StreamingReorder.withLateOutput(input.toDS(), GraceMs, idleStateTtlMs = ttlMs)
      .writeStream.format("memory").queryName("late_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      def stateRows: Long = q.recentProgress.reverse.iterator
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        .nextOption().getOrElse(-1L)
      def waitFor(cond: => Boolean, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(cond, s"timed out waiting for: $what (stateRows=$stateRows)")
      }
      // three keys: "idle" and "one" flush fully (empty buffers) then go
      // quiet; "hold" keeps a sub-grace buffered tail and goes quiet
      // (S6: must NOT flush, and the TTL must NOT expire it)
      val idleKey = fixture.map(o => o.copy(order_id = "i" + o.order_id, electronic_id = "idle"))
      val holdKey = fixture.take(4).map(o => o.copy(order_id = "h" + o.order_id, electronic_id = "hold"))
      input.addData(fixture ++ idleKey ++ holdKey)
      waitFor(spark.table("late_ttl").count() == 24, "both flushed keys emit the golden 12")
      // TTL sweep: both empty-buffer keys expire; the buffered tail survives
      waitFor(stateRows == 1, "'one' and 'idle' expire; 'hold' (buffered tail) survives")
      // a record for the expired "one" revives it as a brand-new key: it
      // re-anchors at its own time + grace, so it buffers without flushing
      input.addData(ElectronicOrder("13", "one", "quiet", 1.0, t("2021-11-05T01:00:00Z")))
      waitFor(stateRows == 2, "revived 'one' holds fresh state next to surviving 'hold'")
      // fidelity: the TTL changed nothing observable — both flushed keys
      // emitted exactly the golden sequence, the buffered tail emitted
      // nothing (S6), the post-TTL record is still buffered
      val out = spark.table("late_ttl").as[StreamingReorder.Reordered].collect().toSeq
      val byKey = out.groupBy(_.electronic_id)
      assert(byKey("one").map(_.order_id) == goldenOrder)
      assert(byKey("idle").map(_.order_id) == goldenOrder.map("i" + _))
      assert(!byKey.contains("hold"), "sub-grace tail must stay buffered through the TTL sweep")
    } finally q.stop()
  }

  test("randomized streams: faithful output equals batch reorder+dedup per key") {
    // seeded random multi-key streams with disorder bounded by grace,
    // random batch splits — streaming must agree with the batch operator
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = t("2021-11-03T00:00:00Z")
      val events = (0 until 60).map { i =>
        val key = s"k${rnd.nextInt(2)}"
        // monotone base + bounded jitter < grace keeps disorder within grace
        val time = base + i * 3600L * 1000 + rnd.nextInt(3600 * 1000)
        ElectronicOrder(s"o$i", key, s"u$i", i.toDouble, time)
      }
      // step(1h) > jitter range ⇒ times are strictly increasing: no dedup
      // collisions, and batch splits preserve arrival order (a shuffled
      // sequence would create unbounded disorder → legitimate late drops)
      val distinct = events
      val nBatches = 1 + rnd.nextInt(4)
      val batches = distinct.grouped(math.max(distinct.size / nBatches, 1)).toSeq
      val out = runFaithful(batches, s"prop$seed")
      val gotByKey = out.groupBy(_.electronic_id)
        .map { case (k, v) => k -> v.map(_.time).toSeq }
      val expByKey = distinct.groupBy(_.electronic_id)
        .map { case (k, v) => k -> v.map(_.time).sorted }
      assert(gotByKey.keySet == expByKey.keySet, s"seed=$seed keys differ")
      gotByKey.foreach { case (k, times) =>
        assert(times.sorted == expByKey(k), s"seed=$seed key=$k lost/added records")
        // per flush epoch emission is chronological; with bounded disorder
        // the concatenation of epochs must also be per-key monotone
        assert(times == times.sorted, s"seed=$seed key=$k out of order: $times")
      }
    }
  }

  test("avro codec round-trips raw and explicitly-framed payloads") {
    val o = fixture.head
    val raw = AvroCodec.encode(o)
    assert(AvroCodec.decode(raw) == o)
    val framed = Array[Byte](0, 0, 0, 0, 42) ++ raw
    assert(AvroCodec.decode(framed, confluentFramed = true) == o)
    // the case that killed the old sniffing heuristic: a raw payload whose
    // first field is an empty string also starts with 0x00
    val empty = ElectronicOrder("", "HDTV", "u1", 9.99, 1000L)
    assert(AvroCodec.decode(AvroCodec.encode(empty)) == empty)
  }
}
