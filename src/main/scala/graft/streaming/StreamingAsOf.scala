package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream AS-OF (point-in-time / temporal) join — the streaming
  * twin of [[graft.operators.TemporalJoins.asOfJoin]]: every left (fact)
  * row is enriched with the LATEST right (dimension-version) row whose
  * event time is `<=` the fact's event time within the same key, with
  * late-arriving dimension updates handled by event-time buffering.
  * This is the "versioned dimension" join every streaming enrichment
  * pipeline needs (Flink calls it an event-time temporal join; Spark has
  * no built-in operator for it — its stream-stream joins are interval
  * joins, which match a bounded band, not latest-version-before).
  *
  * Implementation: the two sides are wrapped into one ENVELOPE stream
  * and unioned BEFORE the stateful operator, so a single watermark
  * governs both sides (the engine takes the min across the union's
  * partitions — exactly the two-sided watermark a dedicated operator
  * would maintain, with none of the multi-watermark bookkeeping).
  * One `flatMapGroupsWithState` over the union then keys state by the
  * join key:
  *
  *  - fact rows buffer until the watermark passes their event time —
  *    only then can no older dimension version still arrive, making the
  *    lookup FINAL (this is what "handles late dimension updates"
  *    means: an on-arrival lookup would enrich against a version that a
  *    late update later supersedes);
  *  - dimension versions buffer as (ts, tiebreak, payload); once the
  *    watermark passes, all versions at-or-below the emit frontier
  *    collapse to the single LATEST one (the only one any future fact
  *    row can see), which is retained indefinitely — Flink's temporal
  *    join keeps exactly the same "current version per key" state.
  *
  * State bound: per key, one retained dimension version + the
  * watermark-lag window of pending rows on both sides — NOT the stream
  * history. At 100 TB/day the state is (keys × latest version) plus a
  * few minutes of in-flight rows, the same bound Spark's own
  * stream-stream interval join maintains, and it lives in the RocksDB
  * state store like any stateful operator.
  *
  * Ordering contract (matches the batch twin): right rows with
  * `ts <= fact.ts` are eligible (`>=`-inclusive ASOF); among versions at
  * the same timestamp the greatest `tb` (tiebreak) wins; emitted rows
  * for one key are in (ts, tb) order. Fact rows later than the
  * watermark are dropped by the engine — the same documented divergence
  * as [[StreamingReorder.faithful]] (SURVEY §7.4).
  */
object StreamingAsOf {

  /** The union protocol row: exactly one of `l`/`r` is set. `ts` is
    * event-time epoch millis, `tb` the within-timestamp tiebreak.
    */
  final case class Envelope[L, R](key: String, ts: Long, tb: Long,
      l: Option[L], r: Option[R])

  /** Per-key state: pending fact rows and buffered dimension versions,
    * both as (ts, tb, payload).
    */
  final case class JoinState[L, R](lefts: List[(Long, Long, L)],
      versions: List[(Long, Long, R)])

  /** One enriched fact row; `right` is None when no dimension version
    * exists at-or-before the fact's event time (left-join semantics).
    */
  final case class Enriched[L, R](key: String, ts: Long, left: L,
      right: Option[R])

  /** Join `left` (facts) to `right` (dimension versions) as-of event
    * time. `delay` is the watermark delay for the unioned stream (how
    * much disorder both sides tolerate). Works identically on batch
    * inputs, which is how the spec pins streamed = batch.
    */
  def join[L <: Product : TypeTag, R <: Product : TypeTag](
      left: Dataset[L], leftKey: L => String, leftTs: L => Long,
      leftTb: L => Long,
      right: Dataset[R], rightKey: R => String, rightTs: R => Long,
      rightTb: R => Long,
      delay: String): Dataset[Enriched[L, R]] = {
    implicit val envEnc: Encoder[Envelope[L, R]] = ExpressionEncoder()
    implicit val stEnc: Encoder[JoinState[L, R]] = ExpressionEncoder()
    implicit val outEnc: Encoder[Enriched[L, R]] = ExpressionEncoder()
    implicit val keyEnc: Encoder[String] = org.apache.spark.sql.Encoders.STRING

    val lEnv = left.map(x =>
      Envelope[L, R](leftKey(x), leftTs(x), leftTb(x), Some(x), None))
    val rEnv = right.map(x =>
      Envelope[L, R](rightKey(x), rightTs(x), rightTb(x), None, Some(x)))

    lEnv.unionByName(rEnv)
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", delay)
      .as[Envelope[L, R]]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn[L, R] _)
  }

  /** The per-key transition: absorb this batch's rows, emit every fact
    * row the watermark has finalized, prune completed dimension
    * versions to the latest retained one, and arm an event-time timer
    * for the oldest still-pending fact row (so a key with no further
    * input still flushes when the watermark advances).
    */
  private def fn[L, R](key: String, rows: Iterator[Envelope[L, R]],
      state: GroupState[JoinState[L, R]]): Iterator[Enriched[L, R]] = {
    val st = state.getOption.getOrElse(JoinState[L, R](Nil, Nil))
    var lefts = st.lefts
    var versions = st.versions
    if (!state.hasTimedOut) rows.foreach { e =>
      e.l.foreach(x => lefts ::= ((e.ts, e.tb, x)))
      e.r.foreach(x => versions ::= ((e.ts, e.tb, x)))
    }
    val w = state.getCurrentWatermarkMs()
    // facts at-or-below the watermark are FINAL: no dimension version
    // older than them can still arrive (it would be later than the
    // watermark and dropped), so the latest-version lookup is exact
    val (ready, pending) = lefts.partition(_._1 <= w)
    val sortedV = versions.sortBy(v => (v._1, v._2))
    val out = ready.sortBy(l => (l._1, l._2)).map { case (ts, tb, l) =>
      val m = sortedV.filter(_._1 <= ts).lastOption // latest <= ts, max tb
      Enriched(key, ts, l, m.map(_._3))
    }
    // versions at-or-below the watermark collapse to the single latest:
    // it is the only one any future fact (necessarily > w) can select
    val below = sortedV.filter(_._1 <= w)
    val keep = below.lastOption.toList ++ sortedV.filter(_._1 > w)
    if (pending.isEmpty && keep.isEmpty) state.remove()
    else {
      state.update(JoinState(pending, keep))
      // the retained current-version row carries no timer — it is the
      // dimension's live state, kept until the key sees traffic again
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(pending.map(_._1).min, w + 1))
    }
    out.iterator
  }
}
