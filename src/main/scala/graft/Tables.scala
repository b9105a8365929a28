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
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
