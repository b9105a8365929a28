package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events` against upstream parquet logical-type drift.
  *
  * The driver regenerated `/root/testdata` mid-round-7 and `events.ts`
  * changed from TIMESTAMP(NANOS) to plain `timestamp[us]` (TIMESTAMP_NTZ
  * to Spark); the loader hard-coded the nanos decoding and 25 queries
  * died at analysis time. This spec writes the SAME logical rows in every
  * encoding an upstream producer has shipped (or could ship) and asserts
  * the loader yields identical, TimestampType-normalized rows for all of
  * them:
  *   - int64 nanoseconds (what TIMESTAMP(NANOS) parquet looks like to
  *     Spark under `spark.sql.legacy.parquet.nanosAsLong` — rounds 1–6)
  *   - TIMESTAMP_NTZ micros (pandas/pyarrow default — round 7+)
  *   - TIMESTAMP (LTZ) micros (Spark's own default timestamp writes)
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  // micros since epoch, deliberately including a non-millisecond tail so
  // ns→µs and µs→µs paths must agree at full precision
  private val micros = Seq(
    1704067200000001L, 1704067200123456L, 1704153599999999L, 1704240000500000L)

  private def base: DataFrame =
    micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, s"type_$i", i * 1.5, s"""{"k":$i}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")

  private def writeEncoding(encode: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft-events-enc").toString
    encode(base).select(
      $"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def canon(df: DataFrame): Seq[Row] = {
    assert(df.schema("ts").dataType === TimestampType,
      "loader must normalize every encoding to TimestampType")
    df.select($"event_id", unix_micros($"ts").as("us"))
      .collect().toSeq.sortBy(_.getLong(0))
  }

  test("events loader normalizes int64-nanos, NTZ-micros, and LTZ-micros encodings identically") {
    val asNanosLong = writeEncoding(_.withColumn("ts", $"us" * 1000L))
    val asNtz = writeEncoding(
      _.withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType)))
    val asLtz = writeEncoding(_.withColumn("ts", timestamp_micros($"us")))

    val fromNanos = canon(Tables.events(spark, asNanosLong))
    val fromNtz = canon(Tables.events(spark, asNtz))
    val fromLtz = canon(Tables.events(spark, asLtz))

    assert(fromNanos === fromNtz)
    assert(fromNtz === fromLtz)
    val expected = micros.sorted
    assert(fromLtz.map(_.getLong(1)) === expected)
  }

  test("embeddings loader normalizes float and double element encodings identically") {
    val vals = Seq((0L, Array(0.5f, -1.25f, 3.75f)), (1L, Array(2.5f, 0.125f, -0.625f)))
    def writeEnc(asDouble: Boolean): String = {
      val dir = Files.createTempDirectory("graft-emb-enc").toString
      val base = vals.toDF("vec_id", "embedding")
      val df = if (asDouble)
        base.withColumn("embedding", $"embedding".cast(ArrayType(DoubleType)))
      else base
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    def canonEmb(dir: String): Seq[(Long, Seq[Float])] = {
      val df = Tables.embeddings(spark, dir)
      assert(df.schema("embedding").dataType === ArrayType(FloatType),
        "loader must normalize to array<float>")
      df.collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    }
    // exactly-representable values -> the double round trip is lossless
    assert(canonEmb(writeEnc(asDouble = false)) === canonEmb(writeEnc(asDouble = true)))
  }

  test("events loader against the driver's current testdata analyzes and preserves micros") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    // must survive analysis + execution, not just schema inspection
    assert(ev.count() > 0)
  }
}
