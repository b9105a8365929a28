package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application (MERGE INTO / upsert-with-delete semantics) —
  * the operator that turns a CDC stream into a table: given a base
  * snapshot of keyed state and a changelog of (key, op ∈ upsert|delete,
  * ordering, payload) rows, produce the post-image. What lakehouse
  * merge-on-read compaction does on every commit.
  *
  * Shape for 100 TB: ONE hash aggregation with map-side-combined
  * `max_by` over an (ordering, op, payload) struct — each map task
  * reduces its slice of the log to one candidate row per key BEFORE the
  * shuffle, so the exchange carries ≤ |keys| rows per task no matter how
  * long the history is. Deliberately not a row_number window (that sorts
  * every key's full history) and not an iterative driver loop. Deletes
  * ride the same aggregation as a flag on the winning struct and are
  * filtered after — a delete only wins if it is genuinely the last op.
  *
  * Chunked application is associative: `apply(apply(base, log1), log2)`
  * equals `apply(base, log1 ∪ log2)` whenever log2's ordering keys are
  * ≥ log1's per key (the CDC commit-order guarantee). `CdcSpec` pins
  * this, plus delete-removes-key and untouched-base-rows-survive.
  */
object Cdc {

  /** Apply `changelog` to `base`.
    *
    * `base`: one row per key — columns (keyCol, ordCols..., payloadCols...)
    * — i.e. a previous output of this function (or empty).
    * `changelog`: many rows per key — same columns plus `opCol` with
    * values "U" (upsert) or "D" (delete).
    * `ordCols` break ties in log order (e.g. ts, event_id) — the LAST
    * struct-wise-max op per key wins.
    */
  def apply(base: DataFrame, changelog: DataFrame, keyCol: String,
      ordCols: Seq[String], opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    // base rows re-enter as upserts with epoch 0; changelog rows carry
    // epoch 1. The max_by ordering is (ordCols..., epoch, op), so ties
    // are broken DETERMINISTICALLY: at equal ordering keys a changelog
    // row always beats the re-entered base row (it is the later epoch —
    // without this, a delete at the same ord as the base row won in
    // partition order, silently sometimes), and between two changelog
    // rows at a full ordering tie the upsert wins ("U" > "D"
    // lexically) — the documented "a delete only wins if it is
    // genuinely the last op" contract, now total, which is also what
    // keeps chunked application associative at equal keys.
    val logCols = Seq(col(keyCol), col(opCol)) ++
      (ordCols ++ payloadCols).map(col)
    val asLog = base.withColumn(opCol, lit("U"))
      .select(logCols: _*).withColumn("_epoch", lit(0))
    val log = changelog.select(logCols: _*).withColumn("_epoch", lit(1))
      .unionByName(asLog)
    val winner = struct((ordCols :+ opCol) ++ payloadCols map col: _*)
    val ord = struct(ordCols.map(col) ++ Seq(col("_epoch"), col(opCol)): _*)
    log.groupBy(col(keyCol))
      .agg(max_by(winner, ord).as("_w"))
      .filter(col(s"_w.$opCol") =!= "D")
      .select(col(keyCol) +: (ordCols ++ payloadCols)
        .map(c => col(s"_w.$c").as(c)): _*)
  }
}
