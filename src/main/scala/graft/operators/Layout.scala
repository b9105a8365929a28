package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization operators: multi-dimensional clustering keys
  * for scan pruning. At 100 TB the dominant cost of selective queries is
  * how many files a predicate can SKIP; sorting by a Z-order (Morton)
  * interleave of two filter columns gives both columns locality in the
  * file order, so min/max file statistics prune on either dimension —
  * the technique behind Delta/Iceberg Z-ORDER clustering.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative long columns: bit i of `x` lands at position 2i, bit i
    * of `y` at 2i+1. Fully unrolled into shift/and/or expressions —
    * codegen'd, zero shuffles, linear in rows.
    */
  def zOrderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Layout effectiveness summary for Z-ordering `rel` on (xCol, yCol):
    * rows bucketed by the top bits of their z-value (a stand-in for "which
    * file would this row land in after a z-sort"), with per-bucket row
    * counts and min/max of BOTH source columns — the exact statistics a
    * reader's pruning consults. Narrow per-bucket ranges on both columns
    * = both predicates skip. One map-side-combined aggregation.
    * Output: (bucket, n_rows, x_min, x_max, y_min, y_max).
    */
  def zOrderStats(rel: DataFrame, xCol: String, yCol: String,
      bits: Int, bucketShift: Int): DataFrame = {
    val z = zOrderKey(col(xCol).cast("long"), col(yCol).cast("long"), bits)
    rel.select(shiftright(z, bucketShift).as("bucket"),
        col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("_x")).as("x_min"), max(col("_x")).as("x_max"),
        min(col("_y")).as("y_min"), max(col("_y")).as("y_max"))
      .orderBy(col("bucket"))
  }
}
