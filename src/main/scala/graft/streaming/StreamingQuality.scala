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

  /** All original columns plus the feature vector `x`. */
  def withFeatures(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("_toks", Text.tokens(col(textCol)))
      .withColumn("x", TextAnalysis.qualityFeatures(col(textCol), col("_toks")))
      .drop("_toks")

  /** Keep rows the model scores ≥ 0.5; the feature column is dropped —
    * output schema equals input schema.
    */
  def gate(docs: DataFrame, textCol: String, w: Array[Double]): DataFrame =
    withFeatures(docs, textCol)
      .filter(LogReg.probability(col("x"), w) >= 0.5)
      .drop("x")
}
