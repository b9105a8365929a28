package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the scan-side shuffle reducer for selective
  * semi joins, built on Spark's OWN runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair Catalyst's
  * `InjectRuntimeFilter` rule wires up for shuffle joins) rather than a
  * per-row Scala UDF, so the probe stays inside whole-stage codegen.
  *
  * Shape: one aggregation job over the (small, selective) key side builds
  * a fixed-size bloom sketch (~1.2 MB per million keys at 3% fpp — driver-
  * and plan-safe as a binary literal); the big side is filtered by
  * `might_contain(xxhash64(key))` BEFORE its shuffle, then an exact
  * `left_semi` join removes the false positives. The result is therefore
  * bit-identical to the plain semi join while the shuffle reads only
  * `sel + fpp` of the fact table — at 100 TB that is the difference
  * between shuffling terabytes and shuffling the selectivity.
  *
  * The reference engine has no analog (its topology is a single keyed
  * stream); this is the standard warehouse-side pattern the driver's
  * curation pipeline needs when a dedup losers-list or a quality gate
  * prunes a fact scan.
  */
object BloomPrune {

  /** Build a bloom sketch of `keys(keyCol)` (hashed with xxhash64, the
    * same hash `mightContain` probes with). One job, sketch-sized result.
    */
  def bloomOf(keys: DataFrame, keyCol: String, expectedItems: Long,
      numBits: Long = 0L): Array[Byte] = {
    val hashed = new XxHash64(Seq(ColumnBridge.expression(keys(keyCol))))
    val agg =
      if (numBits > 0)
        new BloomFilterAggregate(hashed,
          Literal(expectedItems), Literal(numBits)).toAggregateExpression()
      else new BloomFilterAggregate(hashed, expectedItems).toAggregateExpression()
    val bytes = keys.select(ColumnBridge.column(agg)).head().getAs[Array[Byte]](0)
    require(bytes != null, "bloomOf over an empty key set: prune everything upstream")
    bytes
  }

  /** Codegen-friendly membership probe: `might_contain(sketch, xxhash64(key))`. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Composite-key variants: xxhash64 natively hashes a COLUMN TUPLE, so
    * multi-column join keys (e.g. an edge's two endpoints) get one sketch
    * probe with no packing/concat row — build and probe must pass the
    * same column order.
    */
  def bloomOfCols(keys: DataFrame, cols: Seq[Column], expectedItems: Long): Array[Byte] = {
    val hashed = new XxHash64(cols.map(ColumnBridge.expression))
    val agg = new BloomFilterAggregate(hashed, expectedItems).toAggregateExpression()
    val bytes = keys.select(ColumnBridge.column(agg)).head().getAs[Array[Byte]](0)
    require(bytes != null, "bloomOfCols over an empty key set")
    bytes
  }

  def mightContainCols(sketch: Array[Byte], cols: Seq[Column]): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(cols.map(ColumnBridge.expression))))

  /** `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)`, with the
    * big side pre-pruned by a bloom sketch of the small side's keys so the
    * semi join's shuffle/broadcast probe reads only matching-ish rows.
    * Exact: the trailing semi join kills the sketch's false positives.
    *
    * `expectedItems <= 0` (the default) sizes the sketch from the actual
    * distinct key count — one extra count job on the SMALL side, cheap
    * even at 100 TB, and it protects both directions: an under-sized
    * sketch saturates (fpp → 1, the prune stops pruning) and an
    * over-sized one ships megabytes of literal to every task for nothing.
    */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 0L): DataFrame = {
    val keys = small.select(small(smallKey)).distinct()
    val cnt = keys.count()
    // empty key side: the plain semi join this is bit-identical to
    // returns zero rows — short-circuit instead of requiring a non-null
    // sketch (BloomFilterAggregate yields null over zero rows, and an
    // empty dimension filter must not crash the query)
    if (cnt == 0) return big.limit(0)
    val est = if (expectedItems > 0) expectedItems else math.max(cnt, 64L)
    val sketch = bloomOf(keys, smallKey, est)
    big.filter(mightContain(sketch, big(bigKey)))
      .join(keys, big(bigKey) === keys(smallKey), "left_semi")
  }
}
