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
  * Codecs: IMAGE decode/encode/resize are REAL — `javax.imageio` ships
  * with the JDK, so PNG/JPEG/GIF/BMP payloads decode to true dimensions
  * and resize re-encodes actual pixels. Audio/video calls remain STUBBED
  * (`FakeCodec` below — no sound/video libraries in this environment): a
  * deterministic, clearly-marked stand-in deriving plausible
  * samples/frames from the bytes, with the Spark-side plumbing — schema,
  * encoders, partitioning, batch iteration, explode shape — real and
  * tested; swapping `FakeCodec` for a real decoder is a one-object change.
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
      channels: Int, n_pixels: Long, decoded: Boolean)

  final case class AudioFeatures(media_id: Long, sample_rate: Int,
      n_samples: Long, rms: Double)

  final case class VideoFrame(media_id: Long, frame_idx: Int, pts_ms: Long,
      frame_fp: Long)

  /** STUB CODEC — deterministic fake in place of real AUDIO/VIDEO
    * libraries only (images use real javax.imageio). Every derived value
    * is a pure function of the payload bytes so tests and reruns are
    * stable.
    */
  private object FakeCodec {
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

  /** Batched REAL image decode: `javax.imageio` reads each payload
    * (PNG/JPEG/GIF/BMP — anything the JDK's registered readers handle)
    * and reports true dimensions/bands; bytes are dropped on output.
    * Undecodable payloads yield a `decoded = false` row with zeroed
    * dimensions rather than failing the batch — at 100 TB some blobs ARE
    * corrupt, and a poison row must not kill the stage.
    */
  def decodeImages(media: Dataset[MediaRecord], partitions: Int = 0): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    balanced.mapPartitions { batch =>
      batch.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case _: java.io.IOException => null }
        if (img == null) DecodedImage(m.media_id, 0, 0, 0, 0L, decoded = false)
        else {
          val c = img.getRaster.getNumBands
          DecodedImage(m.media_id, img.getWidth, img.getHeight, c,
            img.getWidth.toLong * img.getHeight * c, decoded = true)
        }
      }
    }
  }

  /** Deterministic PNG synthesis — the test-data stand-in for real blob
    * ingestion (production reads `format("binaryFile")`): renders a w×h
    * RGB image whose dimensions and fill color derive from the payload's
    * MD5 (w = 1 + byte0 % 64, h = 1 + byte1 % 64 — a SQL oracle can
    * recompute both), PNG-encoded with javax.imageio. Real bytes out, so
    * [[decodeImages]] downstream exercises a genuine decode.
    */
  def renderImages(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        md.reset()
        val d = md.digest(m.content)
        def b(i: Int): Int = d(i) & 0xFF
        val (w, h) = (1 + b(0) % 64, 1 + b(1) % 64)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val rgb = (b(2) << 16) | (b(3) << 8) | b(4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream(256)
        javax.imageio.ImageIO.write(img, "png", out)
        MediaRecord(m.media_id, "image/png", out.toByteArray, m.meta)
      }
    }
  }

  /** REAL image resize: decode → scale to (w, h) with bilinear Graphics2D
    * draw → re-encode PNG. Undecodable payloads pass through unchanged
    * (kind untouched) so the poison-row policy matches [[decodeImages]].
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case _: java.io.IOException => null }
        if (img == null) m
        else {
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream(256)
          javax.imageio.ImageIO.write(dst, "png", out)
          MediaRecord(m.media_id, "image/png", out.toByteArray, m.meta)
        }
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
