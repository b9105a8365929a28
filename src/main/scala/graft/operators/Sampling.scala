package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * `Dataset.sample`/`sampleBy` are seeded per PARTITION INDEX, so the
  * selected rows change with partitioning (cluster size, AQE coalescing) —
  * unacceptable for reproducible train/val splits. These operators derive
  * the decision from a content hash instead: stable across partitioning,
  * reruns, engines (md5 is universal), and appends (a document keeps its
  * split forever, the property dataset versioning needs).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id's MD5 (first 8 hex chars). */
  private def hashBucket(idCol: Column, buckets: Int): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Adds a `split` column: "train" for trainPct% of rows, else "val". */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < trainPct, "train").otherwise("val"))

  /** Deterministic pct% sample (keep-if-bucket-below). */
  def sampled(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Deterministic global training shuffle, sharded: every row gets a
    * `shard` in [0, nShards) (content-hash bucket of its id) and a `pos` —
    * its rank within the shard under (md5(id), id) order. This is the
    * layout training jobs actually consume — N output files, each
    * internally in a fixed pseudo-random order — and the scalable way to
    * "shuffle 100 TB": there is NO global sort / single-partition
    * row_number; the ranking is a hash-partitioned window, so the work is
    * nShards independent sorts (raise nShards to O(cluster cores) and
    * per-shard cost stays flat — the TeraSort shape). Same md5 contract as
    * [[withSplit]]/[[sampled]]: stable across partitioning, reruns, and
    * engines, and a doc keeps its (shard, pos-order) forever under
    * appends-with-new-ids.
    */
  def shardedShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_mdkey"), col(idCol))
    df.withColumn("_mdkey", md5(col(idCol).cast("string")))
      .withColumn("shard", hashBucket(col(idCol), nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_mdkey")
  }

  /** Per-stratum QUOTA cap: keep at most `cap` rows per stratum, chosen
    * by (md5(id), id) order — the "max N documents per domain/host" rule
    * every crawl-derived corpus applies (a quota, not a rate: a 10M-page
    * host and a 100-page host both land at ≤ cap). Hash order makes the
    * kept set stable across partitioning/reruns and unbiased by id
    * assignment order; ranking is a hash-partitioned window, so the work
    * is one sort per stratum. Strata with pathological row counts at
    * 100 TB (one host = billions of rows) should pre-thin with
    * [[sampled]] before ranking — noted rather than built in, because
    * pre-thinning changes the kept SET and the quota contract is exact.
    */
  def cappedPerStratum(df: DataFrame, idCol: String, strataCol: String,
      cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("_mdkey"), col(idCol))
    df.withColumn("_mdkey", md5(col(idCol).cast("string")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_mdkey", "_rn")
  }

  /** Deterministic STRATIFIED sample: a per-stratum keep percentage
    * (downsample over-represented strata, keep the tail intact — the
    * standard rebalancing move for training corpora), decided by the same
    * content-hash bucket as [[sampled]], so membership is stable across
    * partitioning, reruns, and appends, unlike `Dataset.sampleBy`'s
    * partition-seeded draw. Pure narrow filter — no shuffle at any scale.
    */
  def stratifiedSampled(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (stratum, p)) =>
      when(col(strataCol) === stratum, p).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 100) < pct)
  }
}
