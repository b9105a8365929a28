package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support.
  *
  * Design: media payloads are opaque `binary` columns travelling next to
  * typed metadata; decode / feature-extraction runs as batched
  * per-partition functions (`mapPartitions` over a typed Dataset — the
  * Scala analog of batched `mapInPandas`: one iterator per partition, so
  * per-batch setup like decoder init is amortized and batch shape is
  * controlled by partitioning, not per-row calls).
  *
  * The actual codec calls are STUBBED (this environment ships no
  * image/audio libraries): `FakeCodec` below is a deterministic,
  * clearly-marked stand-in that derives plausible dimensions/samples from
  * the bytes. The Spark-side plumbing — schema, encoders, partitioning,
  * batch iteration, explode shape — is real and tested; swapping
  * `FakeCodec` for a real decoder is a one-object change.
  *
  * Scale: rows carry payloads of MBs, so the operators repartition by id
  * before heavy decode stages to balance executor work, and all outputs
  * drop the raw bytes as early as possible (project-away-payload), which
  * is what keeps a 100 TB media scan from shuffling blobs.
  */
object Multimodal {

  /** One media row: payload + open metadata. */
  final case class MediaRecord(media_id: Long, kind: String,
      content: Array[Byte], meta: Map[String, String])

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, n_pixels: Long)

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
      n_samples: Long, rms: Double)

  final case class VideoFrame(media_id: Long, frame_idx: Int, pts_ms: Long,
      frame_fp: Long)

  /** STUB CODEC — deterministic fake in place of real image/audio/video
    * libraries. Every derived value is a pure function of the payload
    * bytes so tests and reruns are stable.
    */
  private object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val w = 1 + (byteAt(bytes, 0) % 64)
      val h = 1 + (byteAt(bytes, 1) % 64)
      (w, h, 3)
    }
    def audio(bytes: Array[Byte]): (Int, Long, Double) = {
      val sr = 8000 + (byteAt(bytes, 0) % 5) * 8000
      val n = bytes.length.toLong * 4
      val rms = (byteAt(bytes, 2) % 100) / 100.0
      (sr, n, rms)
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + (byteAt(bytes, 3) % 8)
    def frameFingerprint(bytes: Array[Byte], idx: Int): Long = {
      var h = 1125899906842597L
      var i = idx % math.max(bytes.length, 1)
      val end = math.min(i + 64, bytes.length)
      while (i < end) { h = h * 31 + bytes(i); i += 1 }
      h
    }
    private def byteAt(b: Array[Byte], i: Int): Int =
      if (b.isEmpty) 0 else b(i % b.length) & 0xFF
  }

  /** Wrap a string column as a media payload table (test-data stand-in for
    * real blob ingestion; production would `spark.read.format("binaryFile")`).
    */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
      kind: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("content"),
        map(lit("source"), lit("documents.text")).as("meta"))
      .as[MediaRecord]
  }

  /** Batched image decode (stub): payloads → dimensions, bytes dropped. */
  def decodeImages(media: Dataset[MediaRecord], partitions: Int = 0): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    balanced.mapPartitions { batch =>
      // per-partition (per-batch) decoder init would go here
      batch.map { m =>
        val (w, h, c) = FakeCodec.imageDims(m.content)
        DecodedImage(m.media_id, w, h, c, w.toLong * h * c)
      }
    }
  }

  /** Batched audio feature extraction (stub). */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (sr, n, rms) = FakeCodec.audio(m.content)
      AudioFeatures(m.media_id, sr, n, rms)
    })
  }

  /** Frame sampling (stub): one row per sampled frame, payload dropped —
    * the flatMap shape (1 → N small rows) is the real contract.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 1000L): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val n = FakeCodec.frameCount(m.content)
      (0 until n).map(i =>
        VideoFrame(m.media_id, i, i * everyMs, FakeCodec.frameFingerprint(m.content, i)))
    }
  }

  /** Oracle-able binary-column statistics (no stubs involved). */
  def binaryStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        col(idCol),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"),
        md5(encode(col(textCol), "UTF-8")).as("fp"),
        upper(hex(encode(substring(col(textCol), 1, 8), "UTF-8"))).as("head_hex"))
      .orderBy(col(idCol))
}
