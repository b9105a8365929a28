package graft.streaming

import graft.model.ElectronicOrder
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * original record key (`electronic_id`).
    */
  final case class Reordered(key: String, order_id: String, electronic_id: String,
      user_id: String, price: Double, time: Long)

  /** Per-key reorder buffer; public because Spark's generated encoder
    * code must reach the accessor.
    */
  final case class BufferState(buffer: Map[Long, ElectronicOrder])

  /** [[withLateOutput]]'s state: the buffer plus this key's stream time
    * (max event time seen), replacing the engine watermark so nothing is
    * ever dropped as late.
    */
  final case class LateState(buffer: Map[Long, ElectronicOrder], streamTime: Long)

  /** S1/S2 whole-buffer ordered flush, optionally re-keyed (S4). */
  private def flushBuffer(buf: Map[Long, ElectronicOrder],
      emitStoreKey: Boolean): Iterator[Reordered] =
    buf.toSeq.sortBy(_._1).iterator.map { case (t, o) =>
      val k = if (emitStoreKey) s"key-$t" else o.electronic_id
      Reordered(k, o.order_id, o.electronic_id, o.user_id, o.price, t)
    }

  /** The faithful operator. `orders` must be a streaming Dataset. */
  def faithful(orders: Dataset[ElectronicOrder], graceMs: Long,
      emitStoreKey: Boolean = true): Dataset[Reordered] = {
    val spark = orders.sparkSession
    import spark.implicits._

    def flush(buf: Map[Long, ElectronicOrder]): Iterator[Reordered] =
      flushBuffer(buf, emitStoreKey) // S2 ascending event time; S4 store key

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
        flush(buf)
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
    * filters late input; the grace trigger compares against this key's own
    * stream time (max event time seen), tracked in state. The flush is
    * purely data-driven — exactly Kafka Streams' STREAM_TIME punctuation
    * (Application.java:64-69), which also only fires when records arrive
    * (S6); a buffered tail with no successor data stays buffered, as in
    * the reference.
    *
    * Cost of fidelity, stated plainly: without a watermark Spark cannot
    * expire state on its own, so each key holds its (usually empty) state
    * row forever — the same lifecycle as the reference's persistent store.
    * Use [[faithful]] when bounded-disorder drops are acceptable and
    * watermark-driven state cleanup matters more.
    */
  def withLateOutput(orders: Dataset[ElectronicOrder], graceMs: Long,
      emitStoreKey: Boolean = true): Dataset[Reordered] = {
    val spark = orders.sparkSession
    import spark.implicits._

    def fn(key: String, rows: Iterator[ElectronicOrder],
        state: GroupState[LateState]): Iterator[Reordered] = {
      val st = state.getOption.getOrElse(LateState(Map.empty, Long.MinValue))
      var buf = st.buffer
      var streamTime = st.streamTime
      rows.foreach { o =>
        if (!buf.contains(o.time)) buf += o.time -> o // S3: first-wins
        if (o.time > streamTime) streamTime = o.time
      }
      if (buf.nonEmpty && streamTime >= buf.keys.min + graceMs) {
        // stream-time punctuation: whole-store ordered flush (S1/S2)
        state.update(LateState(Map.empty, streamTime))
        flushBuffer(buf, emitStoreKey)
      } else {
        state.update(LateState(buf, streamTime))
        Iterator.empty
      }
    }

    orders
      .groupByKey(_.electronic_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
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
