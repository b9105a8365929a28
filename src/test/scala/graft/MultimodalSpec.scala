package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a tiny document"),
    (2L, "another slightly longer payload with more bytes"),
    (3L, "third"))
    .toDF("doc_id", "text")

  test("fromText produces the media schema with real binary payloads") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "image")
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") == "binary")
    assert(schema("meta") == "map<string,string>")
    val first = media.filter($"media_id" === 1L).head()
    assert(new String(first.content, "UTF-8") == "a tiny document")
  }

  /** A real in-memory PNG: w×h RGB, solid color. */
  private def png(w: Int, h: Int, rgb: Int = 0x336699): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImages reads a real PNG's true dimensions via javax.imageio") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", png(17, 9), Map.empty),
      Multimodal.MediaRecord(2L, "image/png", png(64, 1), Map.empty),
      // poison row: not an image — must yield decoded=false, not a crash
      Multimodal.MediaRecord(3L, "image/png", "not a png".getBytes, Map.empty)).toDS()
    val out = Multimodal.decodeImages(media, partitions = 2)
      .collect().sortBy(_.media_id)
    assert(out(0) == Multimodal.DecodedImage(1L, 17, 9, 3, 17L * 9 * 3, decoded = true))
    assert(out(1) == Multimodal.DecodedImage(2L, 64, 1, 3, 64L * 3, decoded = true))
    assert(out(2) == Multimodal.DecodedImage(3L, 0, 0, 0, 0L, decoded = false))
  }

  test("renderImages -> decodeImages round trip: md5-derived dims, deterministic") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "image")
    val out1 = Multimodal.decodeImages(Multimodal.renderImages(media), partitions = 3)
      .collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeImages(Multimodal.renderImages(media))
      .collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq, "decode must not depend on partitioning")
    assert(out1.forall(_.decoded), "synthesized PNGs must actually decode")
    // dims must equal the documented md5 derivation (the SQL oracle's formula)
    docs.collect().foreach { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8"))
      val expected = (1 + (d(0) & 0xFF) % 64, 1 + (d(1) & 0xFF) % 64)
      val got = out1.find(_.media_id == r.getLong(0)).get
      assert((got.width, got.height) == expected && got.channels == 3)
    }
  }

  test("resizeImages rescales real pixels and re-encodes") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", png(40, 20, 0xAA5500), Map("k" -> "v")),
      Multimodal.MediaRecord(2L, "image/png", "junk".getBytes, Map.empty)).toDS()
    val resized = Multimodal.resizeImages(media, 8, 8).collect().sortBy(_.media_id)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).content))
    assert(img.getWidth == 8 && img.getHeight == 8)
    // bilinear resize of a solid color stays that color
    assert((img.getRGB(4, 4) & 0xFFFFFF) == 0xAA5500)
    assert(resized(0).meta == Map("k" -> "v"))
    assert(new String(resized(1).content) == "junk", "undecodable rows pass through")
  }

  test("sampleFrames explodes 1 row per sampled frame with monotone pts") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(media, everyMs = 40L).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet == Set(1L, 2L, 3L))
    byId.values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.pts_ms).toSeq == sorted.indices.map(_ * 40L))
    }
  }

  test("renderWavs -> decodeAudio round trip: md5-derived features, real WAV parse") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "audio")
    val out1 = Multimodal.decodeAudio(Multimodal.renderWavs(media), partitions = 2)
      .collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeAudio(Multimodal.renderWavs(media))
      .collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq, "decode must not depend on partitioning")
    assert(out1.forall(_.decoded), "synthesized WAVs must actually decode")
    // features must equal the documented md5 derivation (the SQL oracle)
    docs.collect().foreach { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8"))
      def b(i: Int): Int = d(i) & 0xFF
      val sr = 8000 * (1 + b(0) % 5)
      val n = 500 + ((b(2) << 8 | b(3)) % 7500)
      val amp = 1001 + 2 * ((b(4) << 8 | b(5)) % 15000)
      val got = out1.find(_.media_id == r.getLong(0)).get
      assert(got.sample_rate == sr && got.n_samples == n.toLong)
      // square-wave RMS is exactly amp/32768 — bit-exact, no tolerance
      assert(got.rms == amp / 32768.0, s"rms ${got.rms} != ${amp / 32768.0}")
    }
  }

  test("decodeAudio survives poison rows and decodes a hand-built WAV") {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](2 * 100) // silence: 100 zero samples
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", out.toByteArray, Map.empty),
      Multimodal.MediaRecord(2L, "audio/wav", "not audio".getBytes, Map.empty)).toDS()
    val a = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    assert(a(0) == Multimodal.DecodedAudio(1L, 16000, 100L, 0.0, decoded = true))
    assert(a(1) == Multimodal.DecodedAudio(2L, 0, 0L, 0.0, decoded = false))
  }
}
