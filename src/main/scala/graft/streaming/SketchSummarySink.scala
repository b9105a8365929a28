package graft.streaming

import java.net.URI

import graft.operators.SketchRollup
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of a persisted sketch summary table — the sink
  * side of the [[graft.operators.SketchRollup]] pattern: a stream keeps a
  * per-group distinct-count summary CONTINUOUSLY fresh, and dashboards
  * read estimates from kilobytes of sketch blobs instead of rescanning
  * history.
  *
  * Write protocol is APPEND-ONLY: each micro-batch sketches its own rows
  * per group (one aggregation over batch-sized data) and blindly appends
  * the partial sketches tagged with the batch id. No read-modify-write
  * of the summary sits in the hot streaming path — RMW per micro-batch
  * would rewrite the whole groups-sized table every trigger, race with
  * readers, and break exactly-once on retry (foreachBatch may re-deliver
  * a batch id; a deduplicating reader can drop duplicate batch ids,
  * and APPEND of the same deterministic partial is idempotent after
  * [[compact]]). Merging happens on READ (HLL unions are associative
  * and commutative, so any grouping of partials yields the same
  * summary) and in a periodic [[compact]] that squashes accumulated
  * partials into one generation to bound file count — the same
  * LSM-shaped write/merge split every streaming summary store uses.
  *
  * 100 TB shape: the per-batch aggregation is map-side combined and
  * batch-sized; the summary table is (groups × generations) kilobyte
  * rows regardless of event volume; compaction is a groups-sized
  * shuffle, never a history rescan.
  */
object SketchSummarySink {

  /** The `foreachBatch` hook: sketch this micro-batch per group and
    * append the partials. Usage:
    * {{{
    * stream.writeStream
    *   .foreachBatch(SketchSummarySink.appendPartials("event_type", "user_id", path))
    *   .start()
    * }}}
    */
  def appendPartials(groupCol: String, keyCol: String, path: String,
      lgK: Int = 12): (DataFrame, Long) => Unit = (batch, batchId) =>
    if (!batch.isEmpty) {
      SketchRollup.sketchBy(batch, groupCol, keyCol, lgK)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(path)
    }

  /** Merge-on-read: all partial generations unioned down to one sketch
    * row per group (duplicate batch ids from foreachBatch re-delivery
    * are dropped first — partials are deterministic per batch, so the
    * first copy wins losslessly).
    */
  def mergedSketches(spark: SparkSession, path: String,
      groupCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col(groupCol), col("batch_id"))
      .agg(first(col("sketch")).as("sketch"))
      .groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** Per-group distinct estimates of everything streamed so far. */
  def summary(spark: SparkSession, path: String, groupCol: String): DataFrame =
    SketchRollup.estimates(mergedSketches(spark, path, groupCol), groupCol)

  /** Squash the partial generations into a single one so the file count
    * stays bounded no matter how long the stream runs.
    *
    * Safe to run CONCURRENTLY with an appending stream — no
    * coordination needed, because the protocol never swaps the
    * directory out:
    *  1. snapshot the current data-file list;
    *  2. merge exactly those files into one generation (batch_id
    *     strictly below every existing one — −1 on first compaction,
    *     decreasing after — so [[mergedSketches]]' per-batch dedup
    *     never collides across compactions) and APPEND it via a
    *     staging dir + per-file rename into `path`;
    *  3. delete only the snapshotted files.
    * A partial appended by a concurrent trigger between (1) and (3) is
    * not in the snapshot, so it survives untouched; readers always see
    * a live directory, and during the (2)-(3) overlap they see the
    * snapshot files AND their merged generation together — harmless,
    * because HLL union is idempotent (max-of-registers), so unioning
    * the same data twice yields the identical summary.
    */
  def compact(spark: SparkSession, path: String, groupCol: String): Unit = {
    val fs = FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    if (!fs.exists(dir)) return
    val snapshot = fs.listStatus(dir)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(_.getPath)
    if (snapshot.isEmpty) return
    val parts = spark.read.parquet(snapshot.map(_.toString): _*)
    val minId = parts.agg(min(col("batch_id"))).head().getLong(0)
    val gen = math.min(minId, 0L) - 1L
    val merged = parts
      .groupBy(col(groupCol), col("batch_id"))
      .agg(first(col("sketch")).as("sketch"))
      .groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
      .withColumn("batch_id", lit(gen))
    val staged = path + "_compacting"
    merged.write.mode("overwrite").parquet(staged)
    // append the merged generation file-by-file (part names carry a
    // fresh UUID, so no collision with live files), then retire the
    // snapshot; the directory itself is never deleted or renamed
    fs.listStatus(new Path(staged))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .foreach(f => fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
    snapshot.foreach(p => fs.delete(p, false))
    fs.delete(new Path(staged), true)
    ()
  }
}
