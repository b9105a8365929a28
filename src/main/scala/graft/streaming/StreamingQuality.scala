package graft.streaming

import graft.functions.Text
import graft.operators.{LogReg, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time quality gate: the batch-trained classifier
  * ([[graft.operators.LogReg]], weights typically read back via
  * `LogReg.loadModel`) applied at the stream boundary — documents that
  * would fail the batch curation gate never enter the lake.
  *
  * Entirely STATELESS: feature extraction is a codegen'd projection
  * (token array materialized in a lower projection, the
  * [[TextAnalysis.stats]] discipline) and the score a broadcast-literal
  * fold, so the gate runs identically on a batch frame or a
  * `readStream` frame in append mode — no watermark, no state store, no
  * shuffle, no join. The cheapest possible placement for a filter that
  * at 100 TB/day removes ~half the volume before it costs storage or
  * downstream compute. `LogRegSpec` pins the streamed kept-set EQUAL to
  * the batch pipeline's stage-1 kept-set.
  *
  * Features come from [[TextAnalysis.qualityFeatures]] — the exact
  * layout `text_quality_model` trains against, built from the same
  * sub-expressions, so train and gate cannot drift apart.
  */
object StreamingQuality {

  /** An internal-column name guaranteed not to collide with the caller's
    * schema: the reserved `__graft_` prefix plus a numeric suffix bumped
    * until fresh (round-9 advice — a caller column literally named `x`
    * or `_toks` must survive the gate untouched, not be silently
    * overwritten and dropped).
    */
  private def fresh(base: String, taken: Seq[String]): String = {
    val t = taken.toSet
    if (!t(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(n => !t(n)).get
  }

  /** All original columns plus the feature vector `x`. The token array is
    * materialized in a lower projection under a collision-proof internal
    * name (the [[TextAnalysis.stats]] discipline); `x` itself is this
    * method's OUTPUT contract, so a pre-existing `x` column is a caller
    * error surfaced loudly rather than silently shadowed.
    */
  def withFeatures(docs: DataFrame, textCol: String): DataFrame = {
    require(!docs.columns.contains("x"),
      "withFeatures emits a feature column named 'x' but the input " +
        "already has one — rename it or project it away first")
    val toks = fresh("__graft_toks", docs.columns)
    docs.withColumn(toks, Text.tokens(col(textCol)))
      .withColumn("x", TextAnalysis.qualityFeatures(col(textCol), col(toks)))
      .drop(toks)
  }

  /** Keep rows the model scores ≥ 0.5 — output schema equals input
    * schema, for ANY input schema: both internal columns (token array,
    * feature vector) use collision-proof reserved names and are dropped,
    * so even a caller frame that already has `x` or `_toks` passes
    * through byte-identical.
    */
  def gate(docs: DataFrame, textCol: String, w: Array[Double]): DataFrame = {
    val toks = fresh("__graft_toks", docs.columns)
    val x = fresh("__graft_x", docs.columns :+ toks)
    docs.withColumn(toks, Text.tokens(col(textCol)))
      .withColumn(x, TextAnalysis.qualityFeatures(col(textCol), col(toks)))
      .filter(LogReg.probability(col(x), w) >= 0.5)
      .drop(toks, x)
  }
}
