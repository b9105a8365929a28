package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Kept as plain `spark.read.parquet` so Catalyst's parquet source handles
  * predicate pushdown / column pruning — at 100 TB the same call reads a
  * partitioned table and partition pruning comes for free.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is driver-owned and its physical parquet encoding has
    * drifted across testdata regenerations: TIMESTAMP(NANOS) in rounds
    * 1–6 (Spark reads it as BIGINT under the nanosAsLong legacy conf),
    * plain `timestamp[us]` (TIMESTAMP_NTZ to Spark) since round 7. A
    * 100 TB engine cannot hard-code one upstream logical type — producers
    * re-encode ns/µs and NTZ/LTZ freely — so dispatch on the type the
    * scan actually yields and normalize every encoding to one session-TZ
    * TimestampType column (session TZ is UTC, matching what DuckDB sees;
    * its TIMESTAMP is also µs):
    *  - BIGINT (nanos via the legacy conf): ns → µs with integer division
    *    (double division would lose precision at ~1.7e18).
    *  - TIMESTAMP_NTZ: reinterpret the wall-clock micros as UTC instants.
    *  - TIMESTAMP: already the target type; pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  /** `embeddings.embedding` is float32[] today, but the same upstream
    * drift that re-encoded `events.ts` (see [[events]]) could ship it as
    * double[] — and every consumer (`getSeq[Float]` collects, codegen
    * DotProduct, quantizers) assumes float elements. Normalize any
    * numeric element type to array<float> at the scan boundary so drift
    * costs one cast projection, not 20 broken operators.
    *
    * When the cast branch fires it LOGS LOUDLY (round-8 advice): the
    * DuckDB oracles read the raw parquet at full precision, so a
    * double[] shipment makes Spark compute on float-truncated values
    * while every oracle computes on doubles — the gate would then fail
    * confusingly unless the oracles gain a matching CAST-to-FLOAT. The
    * warning makes that mismatch attributable in one grep.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val raw = load(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case other =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"embeddings.embedding arrived as $other, normalizing to " +
            "array<float> — DuckDB oracles read the RAW parquet at full " +
            "precision, so float-vs-double gate mismatches are now " +
            "attributable to this upstream re-encoding (add a matching " +
            "CAST to FLOAT in the embedding oracles if this persists)")
        raw.withColumn("embedding",
          col("embedding").cast(ArrayType(FloatType)))
    }
  }
}
