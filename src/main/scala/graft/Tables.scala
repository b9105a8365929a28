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
    val raw = normalizeStrings(load(s, d, "events"), "events",
      Set("event_type", "props"))
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  /** String columns of driver-owned tables can drift the same way
    * `events.ts` did (see [[events]]): parquet has no string type, only
    * BYTE_ARRAY + a UTF8 annotation, and a producer that drops the
    * annotation (plain arrow binary, some Java writers) ships bytes that
    * Spark reads as `BinaryType` — every string function downstream then
    * dies at ANALYSIS time across the whole text family. Cast such
    * columns back to string at the scan boundary (Spark's binary→string
    * cast decodes UTF-8, exactly the annotation's meaning) and log
    * loudly so an upstream re-encoding is attributable in one grep.
    * Encodings Spark CANNOT distinguish need no pin: arrow
    * string-vs-large_string, dictionary/DELTA_BYTE_ARRAY page encodings
    * all land as the same UTF8 BYTE_ARRAY logical type.
    */
  private def normalizeStrings(raw: DataFrame, table: String,
      cols: Set[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{BinaryType, StringType}
    raw.schema.fields
      .filter(f => cols(f.name) && f.dataType == BinaryType)
      .foldLeft(raw) { (df, f) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$table.${f.name} arrived as BINARY (BYTE_ARRAY without the " +
            "UTF8 annotation), normalizing to string — if this persists " +
            "the upstream writer dropped the parquet logical type")
        df.withColumn(f.name, col(f.name).cast(StringType))
      }
  }

  def documents(s: SparkSession, d: String): DataFrame =
    normalizeStrings(load(s, d, "documents"), "documents",
      Set("text", "lang", "source"))
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
