package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Multimodal (image/audio/video) column support.
  *
  * Design: media payloads are opaque `binary` columns travelling next to
  * typed metadata; decode / feature-extraction runs as batched
  * per-partition functions (`mapPartitions` over a typed Dataset — the
  * Scala analog of batched `mapInPandas`: one iterator per partition, so
  * per-batch setup like decoder init is amortized and batch shape is
  * controlled by partitioning, not per-row calls).
  *
  * Codecs: IMAGE decode/encode/resize are REAL (`javax.imageio` ships
  * with the JDK: PNG/JPEG/GIF/BMP decode to true dimensions, resize
  * re-encodes actual pixels) and AUDIO decode/encode are REAL
  * (`javax.sound.sampled.AudioSystem`: WAV/AIFF/AU payloads decode to
  * true sample rate / frame count, and RMS is computed over the actual
  * PCM samples). VIDEO is real too, over a self-describing container the
  * JDK can actually decode (it ships no mp4/webm codec and this
  * environment has no external libraries): `GVID` = magic + frame count
  * + length-prefixed PNG frames at a fixed 25 fps, every frame decoded
  * with the same genuine `javax.imageio` path as still images. Swapping
  * in an mp4 demuxer changes only [[Multimodal.decodeVideos]]'s
  * container-parsing loop; the per-frame schema, poison policy, and
  * explode shape are codec-independent.
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

  final case class DecodedAudio(media_id: Long, sample_rate: Int,
      n_samples: Long, rms: Double, decoded: Boolean)

  final case class VideoFrame(media_id: Long, frame_idx: Int, pts_ms: Long,
      frame_fp: Long)

  final case class DecodedVideoFrame(media_id: Long, frame_idx: Int,
      pts_ms: Long, width: Int, height: Int, n_pixels: Long, decoded: Boolean)

  final case class ProbedImage(media_id: Long, width: Int, height: Int,
      r: Int, g: Int, b: Int, decoded: Boolean)

  /** The `GVID` toy container: `"GVID"` magic, int32-BE frame count, then
    * per frame an int32-BE byte length followed by a REAL PNG payload.
    * Fixed 25 fps (40 ms per frame). The JDK ships still-image codecs but
    * no video demuxer, so this self-describing concatenation is the
    * simplest container whose every frame exercises a genuine
    * `javax.imageio` decode — the shape (demux loop → per-frame decode →
    * small typed rows) is exactly what an mp4-backed implementation does.
    */
  private[graft] object Gvid {
    val Magic: Array[Byte] = "GVID".getBytes("US-ASCII")
    val FrameMs = 40L // 25 fps

    def write(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        8 + frames.map(_.length + 4).sum)
      val d = new java.io.DataOutputStream(out)
      d.write(Magic); d.writeInt(frames.length)
      frames.foreach { f => d.writeInt(f.length); d.write(f) }
      d.flush()
      out.toByteArray
    }

    /** Demux to raw PNG payloads; None on a corrupt container (bad magic,
      * truncated frame table) — the poison-row contract.
      */
    def read(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
      if (bytes.length < 8 || !bytes.startsWith(Magic)) return None
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes, 4, bytes.length - 4))
      try {
        val n = in.readInt()
        if (n < 0 || n > 100000) return None
        Some((0 until n).map { _ =>
          val len = in.readInt()
          if (len < 0 || len > bytes.length) throw new java.io.IOException("bad frame length")
          val buf = in.readNBytes(len)
          // readNBytes returns short on EOF instead of throwing — a
          // truncated frame must reject the container, not pass through
          if (buf.length != len) throw new java.io.IOException("truncated frame")
          buf
        })
      } catch { case _: java.io.IOException => None }
    }
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
          // NonFatal, not just IOException: codec internals throw
          // IllegalArgumentException / CMMException on malformed payloads,
          // and the poison-row contract must hold for those too
          catch { case NonFatal(_) => null }
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
    * recompute both), PNG-encoded directly ([[FastPng]]). Real bytes
    * out, so [[decodeImages]] downstream exercises a genuine decode.
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
        val rgb = (b(2) << 16) | (b(3) << 8) | b(4)
        // direct PNG assembly ([[FastPng]]): same bytes-semantics as the
        // former ImageIO.write path (spec round-trips them through
        // ImageIO), without the per-call writer-SPI overhead
        MediaRecord(m.media_id, "image/png", FastPng.encodeSolid(w, h, rgb), m.meta)
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
          // NonFatal, not just IOException: codec internals throw
          // IllegalArgumentException / CMMException on malformed payloads,
          // and the poison-row contract must hold for those too
          catch { case NonFatal(_) => null }
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
          MediaRecord(m.media_id, "image/png", FastPng.encodeImage(dst), m.meta)
        }
      }
    }
  }

  /** Pixel-level probe: decode and report true dimensions plus the
    * top-left pixel's RGB — the cheap feature-extraction shape that
    * validates a transform's pixel fidelity without shipping pixels
    * anywhere (one small typed row out per image, payload dropped).
    * After [[resizeImages]] of a solid-color image the probed color must
    * equal the source color exactly: bilinear interpolation of identical
    * samples is the identity, so this is the end-to-end check that the
    * resize really decoded, rescaled, and re-encoded actual pixels.
    * Poison policy matches [[decodeImages]]: undecodable → zeroed row
    * with `decoded = false`.
    */
  def probePixels(media: Dataset[MediaRecord]): Dataset[ProbedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val img =
          // NonFatal, not just IOException: codec internals throw
          // IllegalArgumentException / CMMException on malformed payloads
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case NonFatal(_) => null }
        if (img == null) ProbedImage(m.media_id, 0, 0, 0, 0, 0, decoded = false)
        else {
          val rgb = img.getRGB(0, 0)
          ProbedImage(m.media_id, img.getWidth, img.getHeight,
            (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF, decoded = true)
        }
      }
    }
  }

  /** Planted-variant media ids: `base_id + ImageVariantStride` — far
    * above any sf's doc-id range, so variants never collide with bases.
    */
  private[graft] val ImageVariantStride = 100000000L

  /** Deterministic PATTERN image synthesis + planted RESIZE near-dups —
    * the fixture for perceptual near-duplicate detection
    * (`mm_image_neardup`), where [[renderImages]]' solid fills cannot
    * serve (every solid image block-averages to one flat grid, so all
    * solids share one aHash). Per document:
    *
    *  - an 8×8 luma grid derives from chained digests — cell `i`
    *    (row-major) = byte `i % 16` of `md5(text ++ "g" ++ (i / 16))` —
    *    64 independent bytes, SQL-recomputable;
    *  - the rendered image is that grid upscaled to (8·sx) × (8·sy)
    *    gray pixels, sx = 1 + md5₀ % 4, sy = 1 + md5₁ % 4 — a REAL PNG
    *    encode of up to 32×32 pixels;
    *  - every `variantEvery`-th doc additionally emits a RESIZED
    *    near-duplicate (media_id + [[ImageVariantStride]]) — the same
    *    grid at the cyclically-shifted scale (sx % 4 + 1, sy % 4 + 1),
    *    guaranteed ≠ the base size: different bytes, different
    *    dimensions, IDENTICAL 8×8 block means — exactly the
    *    resize-invariance property aHash exists to catch.
    */
  def renderPatternImages(media: Dataset[MediaRecord],
      variantEvery: Int = 0): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def digest(bytes: Array[Byte]): Array[Byte] = {
        md.reset(); md.digest(bytes)
      }
      batch.flatMap { m =>
        val d0 = digest(m.content)
        val cells = Array.tabulate(64) { i =>
          val dk = digest(m.content ++ s"g${i / 16}".getBytes("UTF-8"))
          dk(i % 16) & 0xFF
        }
        def render(sx: Int, sy: Int): Array[Byte] = {
          val (w, h) = (8 * sx, 8 * sy)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = cells((y / sy) * 8 + (x / sx))
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          FastPng.encodeImage(img)
        }
        val sx = 1 + (d0(0) & 0xFF) % 4
        val sy = 1 + (d0(1) & 0xFF) % 4
        val base = MediaRecord(m.media_id, "image/png", render(sx, sy), m.meta)
        if (variantEvery > 0 && m.media_id % variantEvery == 0)
          Seq(base, MediaRecord(m.media_id + ImageVariantStride, "image/png",
            render(sx % 4 + 1, sy % 4 + 1), m.meta))
        else Seq(base)
      }
    }
  }

  /** One aHash row per image. */
  final case class HashedImage(media_id: Long, ahash: Long, width: Int,
      height: Int, decoded: Boolean)

  /** REAL perceptual hash extraction: `javax.imageio` decode → 8×8
    * block-MEAN luma grid (integer block sums over the true pixels, the
    * classic average-hash downsample) → 64-bit aHash with bit `i` set
    * iff `64·cell_i > Σcells` (the mean threshold in overflow-free
    * integer form, strict so boundary membership is bit-stable). aHash
    * is invariant under integer upscaling by construction — block means
    * of a scaled grid equal the grid — which is what makes it the
    * resize/recompress near-dup fingerprint; Hamming distance between
    * hashes then measures perceptual distance, banded downstream by the
    * [[Dedup.hammingPairs]] machinery. Poison policy matches
    * [[decodeImages]]: undecodable or sub-8×8 payloads emit
    * `decoded = false` rather than failing the stage.
    */
  def imageAHash(media: Dataset[MediaRecord]): Dataset[HashedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case NonFatal(_) => null }
        if (img == null || img.getWidth < 8 || img.getHeight < 8)
          HashedImage(m.media_id, 0L, 0, 0, decoded = false)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
              val i = cy * 8 + x * 8 / w
              sums(i) += lum
              cnts(i) += 1
              x += 1
            }
            y += 1
          }
          val cells = Array.tabulate(64)(i => sums(i) / cnts(i))
          val total = cells.sum
          var fp = 0L
          var i = 0
          while (i < 64) {
            if (64L * cells(i) > total) fp |= (1L << i)
            i += 1
          }
          HashedImage(m.media_id, fp, w, h, decoded = true)
        }
      }
    }
  }

  /** Deterministic WAV synthesis — the audio twin of [[renderImages]]
    * (production reads `format("binaryFile")`): renders a mono 16-bit PCM
    * square wave whose parameters derive from the payload's MD5 so a SQL
    * oracle can recompute every decoded feature:
    *   - sample rate  = 8000 · (1 + byte0 % 5)            (8–40 kHz)
    *   - n samples    = 500 + u16(bytes 2,3) % 7500
    *   - amplitude    = 1001 + 2 · (u16(bytes 4,5) % 15000)  (odd, so
    *     amp/32768 never lands on a round-half tie at 6 decimals)
    * A full-scale alternating ±amp square wave has RMS exactly amp (each
    * |sample| = amp), so the decoded normalized RMS is exactly
    * amp / 32768.0 — bit-exact in doubles since 32768 = 2^15 and
    * n·amp² < 2^53. Real bytes out (RIFF/WAVE container via
    * `AudioSystem.write`), so [[decodeAudio]] downstream exercises a
    * genuine container parse + PCM read.
    */
  def renderWavs(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        md.reset()
        val d = md.digest(m.content)
        def b(i: Int): Int = d(i) & 0xFF
        val sr = 8000 * (1 + b(0) % 5)
        val n = 500 + ((b(2) << 8 | b(3)) % 7500)
        val amp = 1001 + 2 * ((b(4) << 8 | b(5)) % 15000)
        val pcm = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val s = if ((i & 1) == 0) amp else -amp
          pcm(2 * i) = (s & 0xFF).toByte        // 16-bit little-endian
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sr.toFloat, 16, 1, true, false) // mono, signed, little-endian
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream(pcm.length + 64)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        MediaRecord(m.media_id, "audio/wav", out.toByteArray, m.meta)
      }
    }
  }

  /** Parsed RIFF/WAVE PCM header: everything [[decodeAudio]]'s fast path
    * needs to read samples without touching the `AudioSystem` SPI.
    */
  private[graft] final case class WavPcm(sampleRate: Int, bits: Int,
      channels: Int, blockAlign: Int, dataOff: Int, dataLen: Int)

  /** Direct little-endian RIFF/WAVE chunk walk for uncompressed PCM
    * (format code 1, 8- or 16-bit). Returns None for anything else —
    * non-WAV magic, float/compressed WAV, exotic bit depths — so the
    * caller can fall back to the `AudioSystem` SPI.
    *
    * Why this exists: `AudioSystem.getAudioInputStream` resolves its
    * reader through the `javax.sound.sampled.spi` provider registry,
    * whose lookup synchronizes globally — under 32 concurrent decode
    * tasks that lock serializes the whole stage (round-6 bench:
    * `mm_audio_decode` raw reps [1.2, 30.2, 14.1] s on payloads a
    * header parse handles in microseconds). WAV is a 44-byte header
    * away from the PCM; parsing it inline keeps the hot path
    * lock-free and allocation-free.
    */
  private[graft] def parseWavPcm(b: Array[Byte]): Option[WavPcm] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long =
      (u16(i).toLong | (u16(i + 2).toLong << 16)) & 0xFFFFFFFFL
    if (b.length < 44) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var pos = 12
    var fmt: WavPcm = null
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (fmt == null || dataOff < 0)) {
      val size = u32(pos + 4)
      if (size > Int.MaxValue - 8 || pos + 8 + size > b.length.toLong) return None
      val sz = size.toInt
      if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' && b(pos + 3) == ' ') {
        if (sz < 16) return None
        val code = u16(pos + 8)
        if (code != 1) return None // not uncompressed PCM → SPI fallback
        val channels = u16(pos + 10)
        val rate = u32(pos + 12)
        val blockAlign = u16(pos + 20)
        val bits = u16(pos + 22)
        if ((bits != 8 && bits != 16) || channels < 1 || blockAlign < 1) return None
        fmt = WavPcm(rate.toInt, bits, channels, blockAlign, -1, -1)
      } else if (b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' && b(pos + 3) == 'a') {
        dataOff = pos + 8
        dataLen = sz
      }
      pos += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (fmt == null || dataOff < 0) None
    else Some(fmt.copy(dataOff = dataOff, dataLen = dataLen))
  }

  /** Batched REAL audio decode. WAV PCM payloads (the overwhelmingly
    * common container at corpus scale, and everything [[renderWavs]]
    * emits) take a direct header-parse fast path ([[parseWavPcm]]) that
    * reads the RIFF chunks and PCM samples in place — no `AudioSystem`
    * SPI-registry lookup, whose global lock serialized 32 concurrent
    * tasks in round 6. Everything else (AIFF/AU, compressed WAV) falls
    * back to `javax.sound.sampled.AudioSystem`, preserving the full
    * JDK container coverage. Both paths report true sample rate and
    * frame count, and RMS over the actual PCM samples (normalized to
    * [-1, 1] by /32768; multi-channel RMS runs over every channel's
    * samples). Undecodable payloads yield a `decoded = false` row with
    * zeroed features rather than failing the batch — the same
    * poison-row policy as [[decodeImages]].
    */
  def decodeAudio(media: Dataset[MediaRecord], partitions: Int = 0): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    balanced.mapPartitions { batch =>
      batch.map { m =>
        val wav = try parseWavPcm(m.content) catch { case NonFatal(_) => None }
        wav match {
          case Some(w) =>
            val b = m.content
            val end = math.min(b.length, w.dataOff + w.dataLen)
            var sumSq = 0.0
            var count = 0L
            if (w.bits == 16) {
              var i = w.dataOff
              while (i + 1 < end) {
                val s = ((b(i + 1) << 8) | (b(i) & 0xFF)).toShort
                sumSq += s.toDouble * s.toDouble
                count += 1
                i += 2
              }
            } else { // 8-bit WAV PCM is unsigned, centered at 128
              var i = w.dataOff
              while (i < end) {
                val s = ((b(i) & 0xFF) - 128) * 256.0
                sumSq += s * s
                count += 1
                i += 1
              }
            }
            val n = w.dataLen.toLong / w.blockAlign
            val rms =
              if (count == 0) 0.0 else math.sqrt(sumSq / count) / 32768.0
            DecodedAudio(m.media_id, w.sampleRate, n, rms, decoded = true)
          case None => decodeAudioViaSpi(m)
        }
      }
    }
  }

  /** SPI fallback for non-PCM-WAV containers (AIFF/AU, compressed WAV):
    * the original `AudioSystem` path, byte-for-byte the same feature
    * math as the fast path.
    */
  private def decodeAudioViaSpi(m: MediaRecord): DecodedAudio = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      try {
        val fmt = ais.getFormat
        val n = ais.getFrameLength
        val bytes = ais.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        var sumSq = 0.0
        var count = 0L
        if (bits == 16) {
          val le = !fmt.isBigEndian
          var i = 0
          while (i + 1 < bytes.length) {
            val s =
              if (le) ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
              else ((bytes(i) << 8) | (bytes(i + 1) & 0xFF)).toShort
            sumSq += s.toDouble * s.toDouble
            count += 1
            i += 2
          }
        } else if (bits == 8) {
          // 8-bit WAV PCM is unsigned, centered at 128
          var i = 0
          while (i < bytes.length) {
            val s = ((bytes(i) & 0xFF) - 128) * 256.0
            sumSq += s * s
            count += 1
            i += 1
          }
        }
        val rms =
          if (count == 0) 0.0 else math.sqrt(sumSq / count) / 32768.0
        DecodedAudio(m.media_id, fmt.getSampleRate.toInt, n, rms, decoded = true)
      } finally ais.close()
    } catch {
      // NonFatal (not just UnsupportedAudioFileException/IOException):
      // codec internals can throw RuntimeExceptions on malformed
      // payloads, and those must also become poison rows
      case NonFatal(_) =>
        DecodedAudio(m.media_id, 0, 0L, 0.0, decoded = false)
    }
  }

  /** Deterministic GVID synthesis — the video twin of [[renderImages]]
    * (production reads `format("binaryFile")`): renders
    * `1 + byte0 % 6` frames, frame i a `(1 + byte(2i+2) % 64) ×
    * (1 + byte(2i+3) % 64)` solid-color REAL PNG (bytes from the
    * payload's MD5, so a SQL oracle recomputes frame count and every
    * frame's dimensions), wrapped in the length-prefixed [[Gvid]]
    * container. Real bytes out: [[decodeVideos]] downstream does a
    * genuine demux + per-frame `javax.imageio` decode.
    */
  def renderVideos(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        md.reset()
        val d = md.digest(m.content)
        def b(i: Int): Int = d(i) & 0xFF
        val frames = (0 until 1 + b(0) % 6).map { i =>
          val (w, h) = (1 + b(2 * i + 2) % 64, 1 + b(2 * i + 3) % 64)
          val rgb = (b(2 * i + 2) << 16) | (b(2 * i + 3) << 8) | b(i)
          // direct PNG assembly ([[FastPng]]) — see [[renderImages]]
          FastPng.encodeSolid(w, h, rgb)
        }
        MediaRecord(m.media_id, "video/gvid", Gvid.write(frames), m.meta)
      }
    }
  }

  /** Batched REAL video decode: demux the [[Gvid]] container and decode
    * every frame with `javax.imageio`, emitting one small typed row per
    * frame (payload dropped — a 100 TB video scan must never shuffle
    * blobs). `pts_ms` is the container's fixed 25 fps clock. Poison
    * policy: a corrupt container or frame yields a single
    * `decoded = false` row with `frame_idx = -1` rather than failing the
    * batch.
    */
  def decodeVideos(media: Dataset[MediaRecord], partitions: Int = 0): Dataset[DecodedVideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    balanced.mapPartitions { batch =>
      batch.flatMap { m =>
        Gvid.read(m.content) match {
          case None =>
            Seq(DecodedVideoFrame(m.media_id, -1, 0L, 0, 0, 0L, decoded = false))
          case Some(frames) =>
            frames.zipWithIndex.map { case (png, i) =>
              val img =
                // NonFatal, not just IOException: codec internals throw
                // IllegalArgumentException / CMMException on malformed
                // payloads, and the poison-row contract must hold for those
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
                catch { case NonFatal(_) => null }
              if (img == null)
                DecodedVideoFrame(m.media_id, i, i * Gvid.FrameMs, 0, 0, 0L, decoded = false)
              else {
                val c = img.getRaster.getNumBands
                DecodedVideoFrame(m.media_id, i, i * Gvid.FrameMs,
                  img.getWidth, img.getHeight,
                  img.getWidth.toLong * img.getHeight * c, decoded = true)
              }
            }
        }
      }
    }
  }

  /** Frame sampling: demux the [[Gvid]] container, keep every `stride`-th
    * frame, decode it for real, and fingerprint the DECODED pixels
    * (dims + top-left RGB — stable across any lossless re-encode of the
    * same pixels, unlike hashing container bytes). One small row per
    * sampled frame, payload dropped. Corrupt containers/frames are
    * skipped (poison policy: flatMap emits nothing for them).
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      Gvid.read(m.content).toSeq.flatMap { frames =>
        frames.zipWithIndex.collect { case (png, i) if i % stride == 0 =>
          val img =
            // NonFatal, not just IOException: codec internals throw
            // IllegalArgumentException / CMMException on malformed
            // payloads, and the poison-row contract must hold for those
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
            catch { case NonFatal(_) => null }
          Option(img).map { im =>
            val fp = (im.getWidth.toLong << 48) | (im.getHeight.toLong << 32) |
              (im.getRGB(0, 0) & 0xFFFFFFL)
            VideoFrame(m.media_id, i, i * Gvid.FrameMs, fp)
          }
        }.flatten
      }
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
