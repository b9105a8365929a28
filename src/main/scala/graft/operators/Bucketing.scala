package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the storage-level answer
  * to "this join shuffles 100 TB every night": write both fact tables
  * bucketed (and sorted) by the join key ONCE, and every subsequent
  * equi-join on that key reads co-located buckets with ZERO exchanges on
  * either side (SortMergeJoin over pre-sorted bucket files). The shuffle
  * cost is paid exactly once, at write time, and amortized over every
  * downstream join — the standard warehouse pattern for fact-to-fact
  * joins too big to broadcast.
  *
  * `BucketedJoinSpec` pins the contract: joining two tables bucketed by
  * the same key with the same bucket count produces an executed plan
  * with NO ShuffleExchange (broadcast disabled), while the same join on
  * plain tables shuffles both sides.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * `buckets` should divide evenly into the cluster's parallelism and
    * match the OTHER side of the intended join — bucket counts must be
    * equal (or integer multiples, with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`)
    * for the exchange to be elided.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
