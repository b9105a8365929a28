package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot (dataset-version) diffing by content hash — the primitive
  * under data versioning, incremental re-processing, and audit: given two
  * versions of a keyed table, classify every key as added / removed /
  * modified. Two 100 TB snapshots diff as two manifest-sized scans (id +
  * md5 only — content never shuffles) and ONE co-partitioned full outer
  * join on the id; unchanged rows (the overwhelming majority between
  * adjacent versions) are dropped before anything else touches them.
  */
object Snapshot {

  /** (idCol, change ∈ added|removed|modified), unchanged ids absent.
    * `contentCol` must be non-null — a null hashes to null and would
    * misread as an add/remove pair.
    */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    def manifest(df: DataFrame, h: String) =
      df.select(col(idCol).as("_id"),
        md5(col(contentCol).cast("string")).as(h))
    manifest(v1, "_h1").join(manifest(v2, "_h2"), Seq("_id"), "full_outer")
      .withColumn("change",
        when(col("_h1").isNull, lit("added"))
          .when(col("_h2").isNull, lit("removed"))
          .when(col("_h1") =!= col("_h2"), lit("modified")))
      .filter(col("change").isNotNull)
      .select(col("_id").as(idCol), col("change"))
      .orderBy(col(idCol))
  }
}
