package graft.streaming

import graft.model.ElectronicOrder
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming re-expression of the reference's core operator:
  * the stateful event-time reorder buffer with first-wins timestamp dedup
  * and grace-period flush (Application.java:37-97; semantics S1–S7 in
  * SURVEY.md §2.2).
  *
  * Two variants:
  *  - [[faithful]]: `flatMapGroupsWithState` with event-time timeout — a
  *    per-key RocksDB-backed buffer (first-wins insert per S3) that, when
  *    the watermark passes its flush mark, emits the ENTIRE buffer in
  *    ascending event-time order (whole-store flush per S1/S2), optionally
  *    re-keyed `"key-<millis>"` (S4). The watermark replaces stream-time
  *    punctuation (S6): both only advance when data arrives.
  *  - [[idiomatic]]: what a Spark user would actually deploy —
  *    `withWatermark` + `dropDuplicatesWithinWatermark` (exact S3
  *    semantics) with ordering applied at the sink (`ORDER BY` per
  *    micro-batch in `foreachBatch`), letting Spark's own state store do
  *    the buffering.
  *
  * Documented divergence (SURVEY §7.4): records later than the watermark
  * (disorder > grace) are DROPPED by Spark's stateful operators, while
  * Kafka Streams re-buffers them into the next flush. Within the bounded
  * disorder the reference guarantees (README.md:5-7), outputs agree.
  *
  * Scale: state is per-key and proportional to one grace window of data;
  * the shuffle into the stateful operator is the only wide exchange, and
  * the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`) gives the same
  * spill-to-disk behavior as the reference's store.
  */
object StreamingReorder extends Serializable {

  /** Flushed output row; `key` replicates the reference's synthetic store
    * key (Application.java:145) when `emitStoreKey` is set, else the
    * original record key (`electronic_id`). `flush_time` is S5: the
    * reference overwrites every forwarded record's timestamp with the
    * punctuation's stream time (`new Record<>(kv.key, kv.value, timestamp)`,
    * Application.java:77) — here it rides as an explicit column that
    * [[graft.io.KafkaAvroIO.encodeValues]] can surface as the sink
    * `timestamp`.
    */
  final case class Reordered(key: String, order_id: String, electronic_id: String,
      user_id: String, price: Double, time: Long, flush_time: Long)

  /** Per-key reorder buffer; public because Spark's generated encoder
    * code must reach the accessor.
    */
  final case class BufferState(buffer: Map[Long, ElectronicOrder])

  /** [[withLateOutput]]'s state: the buffer, this key's stream time (max
    * event time seen — replacing the engine watermark so nothing is ever
    * dropped as late), and the next stream-time punctuation deadline
    * (Kafka Streams' `context.schedule(grace, STREAM_TIME, …)` fires on a
    * fixed stream-time interval, not relative to the oldest buffered
    * record).
    */
  final case class LateState(buffer: Map[Long, ElectronicOrder],
      streamTime: Long, nextPunctuate: Long)

  /** S1/S2 whole-buffer ordered flush, optionally re-keyed (S4), stamped
    * with the punctuation stream time (S5).
    */
  private def flushBuffer(buf: Map[Long, ElectronicOrder],
      emitStoreKey: Boolean, flushTime: Long): Iterator[Reordered] =
    buf.toSeq.sortBy(_._1).iterator.map { case (t, o) =>
      val k = if (emitStoreKey) s"key-$t" else o.electronic_id
      Reordered(k, o.order_id, o.electronic_id, o.user_id, o.price, t, flushTime)
    }

  /** The faithful operator. `orders` must be a streaming Dataset. */
  def faithful(orders: Dataset[ElectronicOrder], graceMs: Long,
      emitStoreKey: Boolean = true): Dataset[Reordered] = {
    val spark = orders.sparkSession
    import spark.implicits._

    def fn(key: String, rows: Iterator[ElectronicOrder],
        state: GroupState[BufferState]): Iterator[Reordered] = {
      if (state.hasTimedOut) {
        // punctuation analog: whole-store ordered flush (Application.java:72-83).
        // REMOVE the state rather than storing an empty buffer — otherwise
        // every key ever seen keeps store space and re-fires an empty
        // timeout each grace period forever; new data re-creates the state
        // (stream-time punctuation is only meaningful with data, S6).
        val buf = state.getOption.map(_.buffer).getOrElse(Map.empty)
        state.remove()
        // S5: stamp with the engine's stream-time clock at the flush — the
        // watermark is what fired this timeout, playing the punctuation
        // timestamp's role (Application.java:77)
        flushBuffer(buf, emitStoreKey, state.getCurrentWatermarkMs())
      } else {
        var buf = state.getOption.map(_.buffer).getOrElse(Map.empty)
        rows.foreach { o =>
          // S3: first-wins — drop if this event time is already buffered
          if (!buf.contains(o.time)) buf += o.time -> o
        }
        state.update(BufferState(buf))
        if (buf.nonEmpty) {
          // flush when the watermark passes the oldest buffered event +
          // grace (the stream-time punctuation mark for this epoch)
          val target = buf.keys.min + graceMs
          state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1))
        }
        Iterator.empty
      }
    }

    orders
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", s"$graceMs milliseconds")
      .as[ElectronicOrder]
      .groupByKey(_.electronic_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Late-data fidelity variant (SURVEY §7.4): replicates the reference's
    * S1 exactly — records arriving with disorder BEYOND the grace period
    * are re-buffered and emitted at the next flush (late, locally sorted),
    * never dropped, closing [[faithful]]'s one documented divergence from
    * Application.java:73-82.
    *
    * How: no `withWatermark` at all, so Spark's stateful operator never
    * filters late input; punctuation is re-created at Kafka Streams'
    * semantics (Application.java:64-69): a FIXED stream-time interval. The
    * state tracks this key's stream time (max event time seen) and the
    * next punctuation deadline — anchored at first-observed stream time +
    * grace (Kafka Streams defers an unknown-stream-time schedule to the
    * first record), firing when stream time crosses it, then re-armed at
    * `deadline + grace`, realigned to `streamTime + grace` after a gap
    * (`PunctuationSchedule.next`'s catch-up rule). Flushes only fire when
    * records arrive (S6): a buffered tail with no successor data stays
    * buffered, as in the reference — even a beyond-grace straggler waits
    * for stream time to advance past the next deadline.
    *
    * Cost of fidelity, stated plainly: without a watermark Spark cannot
    * expire state on its own, so each key holds its (usually empty) state
    * row forever — the same lifecycle as the reference's persistent store.
    * Use [[faithful]] when bounded-disorder drops are acceptable and
    * watermark-driven state cleanup matters more.
    *
    * `idleStateTtlMs` (0 = off, the faithful default) bounds that state
    * growth for 100 TB keyspaces: a key that receives no records for the
    * TTL (processing time) has its state row dropped — but ONLY when its
    * reorder buffer is empty, so nothing buffered is ever lost (a
    * buffered tail idles armed until data returns, per S6). What expiry
    * forgets is the key's punctuation anchor: a record arriving after
    * expiry re-anchors at first-observed stream time + grace, exactly as
    * a never-seen key — so output is unchanged for any key active within
    * the TTL, and a revived key's flushes may only shift to a later
    * punctuation epoch, never drop or reorder differently within one.
    */
  def withLateOutput(orders: Dataset[ElectronicOrder], graceMs: Long,
      emitStoreKey: Boolean = true, idleStateTtlMs: Long = 0L): Dataset[Reordered] = {
    val spark = orders.sparkSession
    import spark.implicits._
    val ttlOn = idleStateTtlMs > 0

    def fn(key: String, rows: Iterator[ElectronicOrder],
        state: GroupState[LateState]): Iterator[Reordered] = {
      if (ttlOn && state.hasTimedOut) {
        // idle past TTL: drop the state row only if nothing is buffered;
        // a buffered tail must keep waiting for successor data (S6)
        if (state.get.buffer.isEmpty) state.remove()
        else state.setTimeoutDuration(idleStateTtlMs)
        return Iterator.empty
      }
      val st = state.getOption.getOrElse(LateState(Map.empty, Long.MinValue, Long.MinValue))
      var buf = st.buffer
      var streamTime = st.streamTime
      rows.foreach { o =>
        if (!buf.contains(o.time)) buf += o.time -> o // S3: first-wins
        if (o.time > streamTime) streamTime = o.time
      }
      // arm the first punctuation at first-observed stream time + grace
      // (the batch's min event time, so the anchor does not depend on
      // row order within the micro-batch)
      val armed =
        if (st.nextPunctuate != Long.MinValue) st.nextPunctuate
        else if (buf.nonEmpty) buf.keys.min + graceMs
        else Long.MinValue
      if (armed != Long.MinValue && streamTime >= armed) {
        // stream-time punctuation: whole-store ordered flush (S1/S2),
        // stamped with the firing stream time (S5 — mayPunctuate passes
        // current stream time, Application.java:72,77); re-arm one
        // interval ahead, realigning after a multi-interval gap
        val next =
          if (armed + graceMs > streamTime) armed + graceMs
          else streamTime + graceMs
        state.update(LateState(Map.empty, streamTime, next))
        if (ttlOn) state.setTimeoutDuration(idleStateTtlMs)
        flushBuffer(buf, emitStoreKey, streamTime)
      } else {
        state.update(LateState(buf, streamTime, armed))
        if (ttlOn) state.setTimeoutDuration(idleStateTtlMs)
        Iterator.empty
      }
    }

    orders
      .groupByKey(_.electronic_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (ttlOn) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** [[faithful]] on Spark 4's `transformWithState` arbitrary-state v2
    * API — same semantics (S1–S7), different state mechanics:
    *  - the reorder buffer is a [[MapState]] keyed by event time, so a
    *    batch's inserts are per-entry RocksDB puts instead of
    *    re-serializing the whole buffer Map on every
    *    `GroupState.update` (the v1 API's per-batch serde cost is
    *    O(buffer), v2's is O(new records));
    *  - the flush is an explicit event-time TIMER (registered at
    *    `oldest + grace`, lowered when an older record arrives, cleared
    *    on flush) rather than a timeout timestamp rewritten each batch.
    * Measured honestly (`StreamBench`: shallow 100k records / 150 keys —
    * equivalent, micro-batch overhead dominates; deep mode 4 keys ×
    * 200k records on RocksDB, 200 batches — v2 is 24% faster end-to-end
    * and the whole gap is serde, see SCALE.md's deep-buffer table). The
    * O(buffer) → O(inserts) asymmetry matters when per-key buffers are
    * deep relative to per-batch inserts (a real grace window over
    * high-rate keys); v1 additionally holds each key's buffer as ONE
    * state row, which is what stalls when a single key buffers a whole
    * grace window. Requires the RocksDB state store provider (the v2
    * API's native store); [[faithful]] remains for memory-provider
    * deployments.
    */
  def faithfulV2(orders: Dataset[ElectronicOrder], graceMs: Long,
      emitStoreKey: Boolean = true): Dataset[Reordered] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", s"$graceMs milliseconds")
      .as[ElectronicOrder]
      .groupByKey(_.electronic_id)
      .transformWithState(new ReorderProcessor(graceMs, emitStoreKey, identity),
        TimeMode.EventTime(), OutputMode.Append)
  }

  /** [[Reordered]] plus a real TIMESTAMP event-time column, for chaining. */
  final case class ReorderedEt(key: String, order_id: String, electronic_id: String,
      user_id: String, price: Double, time: Long, flush_time: Long,
      event_time: java.sql.Timestamp)

  /** [[faithfulV2]] variant that DECLARES an output event-time column
    * (`transformWithState`'s `eventTimeColumnName` overload), so further
    * STATEFUL operators — windowed aggregations, stream-stream joins,
    * dedup — can run downstream of the reorder in the SAME streaming
    * query, with the engine re-deriving the downstream watermark from the
    * emitted column instead of rejecting the chain (the long-standing
    * multiple-stateful-operators restriction on the v1 API). The emitted
    * `event_time` is the record's own event time, so a downstream
    * `window(col("event_time"), ...)` groups exactly as the batch twin
    * does; `StreamingComposeSpec` pins reorder → tumbling count
    * end-to-end against the batch result.
    */
  def faithfulV2Chained(orders: Dataset[ElectronicOrder], graceMs: Long,
      emitStoreKey: Boolean = true): Dataset[ReorderedEt] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", s"$graceMs milliseconds")
      .as[ElectronicOrder]
      .groupByKey(_.electronic_id)
      .transformWithState(
        new ReorderProcessor[ReorderedEt](graceMs, emitStoreKey,
          r => ReorderedEt(r.key, r.order_id, r.electronic_id, r.user_id,
            r.price, r.time, r.flush_time,
            new java.sql.Timestamp(r.time))),
        "event_time", OutputMode.Append)
  }

  /** The stateful processor behind [[faithfulV2]]/[[faithfulV2Chained]];
    * `wrap` adapts the flush rows to the variant's output type.
    */
  private class ReorderProcessor[T](graceMs: Long, emitStoreKey: Boolean,
      wrap: Reordered => T)
    extends StatefulProcessor[String, ElectronicOrder, T] {

    @transient private var buffer: MapState[Long, ElectronicOrder] = _
    @transient private var flushAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffer = getHandle.getMapState[Long, ElectronicOrder]("buffer",
        Encoders.scalaLong, Encoders.product[ElectronicOrder], TTLConfig.NONE)
      flushAt = getHandle.getValueState[Long]("flush_at",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[ElectronicOrder],
        timers: TimerValues): Iterator[T] = {
      var minNew = Long.MaxValue
      rows.foreach { o =>
        // S3: first-wins per event time — a per-entry containsKey probe,
        // not a whole-buffer read
        if (!buffer.containsKey(o.time)) {
          buffer.updateValue(o.time, o)
          if (o.time < minNew) minNew = o.time
        }
      }
      if (minNew != Long.MaxValue) {
        // flush when the watermark passes oldest + grace; an event-time
        // timer must sit above the current watermark to fire
        val target = math.max(minNew + graceMs, timers.getCurrentWatermarkInMs() + 1)
        val pending = if (flushAt.exists()) flushAt.get() else Long.MinValue
        if (pending == Long.MinValue || target < pending) {
          if (pending != Long.MinValue) getHandle.deleteTimer(pending)
          getHandle.registerTimer(target)
          flushAt.update(target)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[T] = {
      // punctuation analog: whole-store ordered flush (S1/S2), stamped
      // with the engine's stream-time clock (S5); state fully cleared so
      // idle keys hold no store space
      val buf = buffer.iterator().map { case (t, o) => t -> o }.toMap
      buffer.clear()
      flushAt.clear()
      flushBuffer(buf, emitStoreKey, timers.getCurrentWatermarkInMs()).map(wrap)
    }
  }

  /** The idiomatic variant: watermark + first-wins dedup within the
    * watermark window; callers order each emitted micro-batch at the sink
    * (a streaming global sort is not meaningful in append mode).
    */
  def idiomatic(orders: Dataset[ElectronicOrder], graceMs: Long): DataFrame =
    orders
      .withColumn("event_time", timestamp_millis(col("time")))
      .withWatermark("event_time", s"$graceMs milliseconds")
      .dropDuplicatesWithinWatermark("time")
}
