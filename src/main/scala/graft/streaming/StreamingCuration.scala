package graft.streaming

import graft.streaming.StreamingNearDedup.NearDupDoc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPOSED streaming ingest pipeline — the ingest-time twin of the
  * batch curation prefix (round-12 verdict #1): one streaming query that
  * chains the two ingest-time curation stages over a single out-of-order
  * document stream,
  *
  *  1. [[StreamingQuality.gate]] — the batch-trained classifier applied
  *     at the stream boundary (stateless codegen projection + filter;
  *     documents the batch gate would drop never reach the stateful
  *     stage, so at 100 TB/day roughly half the volume never costs
  *     state, shuffle, or storage), then
  *  2. [[StreamingNearDedup.nearDedup]] — SimHash-banded first-wins
  *     near-dup dedup (Hamming ≤ `maxDist`) with a reorder grace buffer
  *     and a retained event-time horizon; exact duplicates are the
  *     distance-0 case, so the batch prefix's exact-dedup stage is
  *     subsumed by construction.
  *
  * Output: one verdict row per GATED document — (doc_id, ts, keep,
  * dup_of). `keep` docs are the stream's curated set; the composition is
  * spec-pinned EQUAL to the registered batch twin
  * (`pipeline_curate_ingest`: trained gate → SimHash first-wins keep) on
  * the same corpus with event time = doc_id, so the ingest-time and
  * batch curation paths provably take identical decisions
  * (`StreamingCurationSpec`). Per-stage semantics, state layout, and
  * production sizing live on the two component operators; this object
  * owns only the composition contract.
  *
  * Scale shape: the gate is shuffle-free and runs BEFORE banding, so the
  * only wide exchanges (the 4×16-bit bucket shuffle and the doc-keyed
  * verdict combine) carry gated fingerprints, never raw rejected text.
  * The whole chain is ONE streaming query — no topic/sink hop between
  * stages — which the v2 `transformWithState` event-time declaration
  * makes legal (the [[StreamingReorder.faithfulV2Chained]] mechanism).
  */
object StreamingCuration {

  /** Gate + near-dedup over a streaming (or batch) frame with LONG
    * epoch-millis event time. Required columns: `doc_id` (long), `text`
    * (string), `ts` (long, event-time millis); extra columns are dropped
    * after the gate (the dedup stage reduces each doc to a fingerprint —
    * callers re-join payloads on `doc_id` downstream, the
    * [[StreamingNearDedup]] discipline of never shuffling raw text).
    *
    * `w` is the trained gate model — [[graft.operators.LogReg]] weights,
    * typically loaded via `LogReg.loadModel` from the registry the batch
    * training run populated. `graceMs` bounds disorder, `retainMs` the
    * dedup history horizon (both event-time).
    */
  def curate(docs: DataFrame, w: Array[Double], graceMs: Long,
      retainMs: Long, maxDist: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gated = StreamingQuality.gate(docs, "text", w)
      .select(col("doc_id").cast("long"), col("text"), col("ts").cast("long"))
      .as[NearDupDoc]
    StreamingNearDedup.nearDedup(gated, graceMs, retainMs, maxDist)
  }
}
