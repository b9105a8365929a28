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

  test("image content-dedup collapses byte-identical payloads into one kept group") {
    // the registered mm_image_dedup sheet is all-singletons on the test
    // corpus (no byte-identical texts exist there), so the collapse
    // semantics are pinned here on planted duplicates: same text -> same
    // PNG -> same decoded fingerprint -> ONE group keeping the lowest id
    val planted = Seq(
      (10L, "identical payload"), (11L, "identical payload"),
      (12L, "identical payload"), (20L, "a different one"))
      .toDF("doc_id", "text")
    val probed = Multimodal.probePixels(Multimodal.renderImages(
      Multimodal.fromText(planted, "doc_id", "text", "image"))).toDF()
    val groups = probed.filter(col("decoded"))
      .groupBy(col("width"), col("height"), col("r"), col("g"), col("b"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("kept_id"))
      .collect()
    assert(groups.length == 2)
    val byN = groups.map(r => r.getAs[Long]("n_images") -> r.getAs[Long]("kept_id")).toMap
    assert(byN(3L) == 10L, "duplicate family keeps the lowest id")
    assert(byN(1L) == 20L)
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

  test("probePixels after resize reports md5-derived color exactly (mm_image_resize contract)") {
    val media = Multimodal.renderImages(
      Multimodal.fromText(docs, "doc_id", "text", "image"))
    val probed = Multimodal.probePixels(Multimodal.resizeImages(media, 17, 11))
      .collect().sortBy(_.media_id)
    assert(probed.forall(p => p.decoded && p.width == 17 && p.height == 11))
    // the probed pixel must equal renderImages' md5-derived solid color:
    // bilinear interpolation of identical samples is the identity — the
    // exact formula the mm_image_resize DuckDB oracle recomputes
    docs.collect().foreach { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8"))
      def b(i: Int): Int = d(i) & 0xFF
      val p = probed.find(_.media_id == r.getLong(0)).get
      assert((p.r, p.g, p.b) == (b(2), b(3), b(4)), s"media ${p.media_id}")
    }
    // poison policy: undecodable payload -> zeroed row, decoded = false
    val junk = Seq(Multimodal.MediaRecord(9L, "image/png",
      "junk".getBytes, Map.empty)).toDS()
    assert(Multimodal.probePixels(junk).head() ==
      Multimodal.ProbedImage(9L, 0, 0, 0, 0, 0, decoded = false))
  }

  test("sampleFrames fingerprint low bits carry the md5-derived frame color (mm_frame_sample contract)") {
    val frames = Multimodal.sampleFrames(Multimodal.renderVideos(
      Multimodal.fromText(docs, "doc_id", "text", "video")), stride = 2).collect()
    docs.collect().foreach { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8"))
      def b(i: Int): Int = d(i) & 0xFF
      frames.filter(_.media_id == r.getLong(0)).foreach { f =>
        val i = f.frame_idx
        val rgb = (b(2 * i + 2) << 16) | (b(2 * i + 3) << 8) | b(i)
        assert((f.frame_fp & 0xFFFFFFL) == rgb.toLong, s"frame $i of ${f.media_id}")
      }
    }
  }

  test("renderVideos -> decodeVideos round trip: md5-derived frames, real PNG decode") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "video")
    val out1 = Multimodal.decodeVideos(Multimodal.renderVideos(media), partitions = 3)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    val out2 = Multimodal.decodeVideos(Multimodal.renderVideos(media))
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(out1.toSeq == out2.toSeq, "decode must not depend on partitioning")
    assert(out1.forall(_.decoded), "synthesized GVID frames must actually decode")
    // frame count + dims must equal the documented md5 derivation (the
    // SQL oracle's formula)
    docs.collect().foreach { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8"))
      def b(i: Int): Int = d(i) & 0xFF
      val frames = out1.filter(_.media_id == r.getLong(0))
      assert(frames.length == 1 + b(0) % 6)
      frames.foreach { f =>
        val i = f.frame_idx
        assert(f.width == 1 + b(2 * i + 2) % 64)
        assert(f.height == 1 + b(2 * i + 3) % 64)
        assert(f.pts_ms == 40L * i && f.n_pixels == f.width.toLong * f.height * 3)
      }
    }
  }

  test("decodeVideos survives a corrupt container as a poison row") {
    val ok = Multimodal.Gvid.write(Seq(png(5, 4)))
    val media = Seq(
      Multimodal.MediaRecord(1L, "video/gvid", ok, Map.empty),
      Multimodal.MediaRecord(2L, "video/gvid", "not a video".getBytes, Map.empty),
      // valid magic, truncated frame table
      Multimodal.MediaRecord(3L, "video/gvid",
        // "GVID" magic then frame count 2 with no frame data — built as
        // bytes so this source file stays text (no raw NULs in literals)
        Array[Byte]('G', 'V', 'I', 'D', 0, 0, 0, 2), Map.empty)).toDS()
    val out = Multimodal.decodeVideos(media).collect().sortBy(_.media_id)
    assert(out(0) == Multimodal.DecodedVideoFrame(1L, 0, 0L, 5, 4, 60L, decoded = true))
    assert(out(1) == Multimodal.DecodedVideoFrame(2L, -1, 0L, 0, 0, 0L, decoded = false))
    assert(out(2) == Multimodal.DecodedVideoFrame(3L, -1, 0L, 0, 0, 0L, decoded = false))
  }

  test("sampleFrames keeps every stride-th frame with pixel-derived fingerprints") {
    val media = Multimodal.renderVideos(
      Multimodal.fromText(docs, "doc_id", "text", "video"))
    val all = Multimodal.decodeVideos(media).collect()
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet == Set(1L, 2L, 3L))
    byId.foreach { case (id, fs) =>
      val total = all.count(_.media_id == id)
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.frame_idx).toSeq == (0 until total by 2).toSeq)
      assert(sorted.forall(f => f.pts_ms == 40L * f.frame_idx))
      // fingerprint's top 32 bits encode the decoded dims
      sorted.foreach { f =>
        val dv = all.find(a => a.media_id == id && a.frame_idx == f.frame_idx).get
        assert((f.frame_fp >>> 48) == dv.width.toLong)
        assert(((f.frame_fp >> 32) & 0xFFFF) == dv.height.toLong)
      }
    }
  }

  test("Gvid container round-trips any frame list and rejects every truncation") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 20) {
      val frames = (0 until rnd.nextInt(6)).map(_ =>
        Array.fill(1 + rnd.nextInt(300))(rnd.nextInt().toByte): Array[Byte])
      val wire = Multimodal.Gvid.write(frames)
      val back = Multimodal.Gvid.read(wire)
      assert(back.isDefined && back.get.size == frames.size)
      back.get.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
      // every strict prefix must be rejected or decode to fewer bytes,
      // never throw — the poison-row contract at the container layer
      for (cut <- Seq(0, 1, 4, 7, wire.length - 1) if cut < wire.length) {
        val r = Multimodal.Gvid.read(wire.take(cut))
        assert(r.isEmpty || cut == wire.length,
          s"truncation at $cut must not round-trip")
      }
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

  test("FastPng bytes round-trip through ImageIO pixel-for-pixel") {
    // the direct encoder replaced ImageIO.write in the synthesis stages;
    // its output must remain an ordinary PNG that the UNCHANGED decode
    // stages (genuine ImageIO.read) see pixel-identically
    val rnd = new scala.util.Random(8)
    for (_ <- 1 to 20) {
      val (w, h) = (1 + rnd.nextInt(64), 1 + rnd.nextInt(64))
      val rgb = rnd.nextInt(1 << 24)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(graft.operators.FastPng.encodeSolid(w, h, rgb)))
      assert(img != null, "ImageIO must accept the direct encoder's bytes")
      assert(img.getWidth == w && img.getHeight == h)
      assert(img.getRaster.getNumBands == 3, "truecolor decodes to 3 bands")
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1)))
        assert((img.getRGB(x, y) & 0xFFFFFF) == rgb, s"pixel ($x,$y)")
    }
    // encodeImage: arbitrary (non-solid) TYPE_3BYTE_BGR content
    val src = new java.awt.image.BufferedImage(23, 17,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 23; y <- 0 until 17)
      src.setRGB(x, y, rnd.nextInt(1 << 24))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      graft.operators.FastPng.encodeImage(src)))
    for (x <- 0 until 23; y <- 0 until 17)
      assert(back.getRGB(x, y) == src.getRGB(x, y), s"pixel ($x,$y)")
  }

  test("parseWavPcm fast path matches the AudioSystem reader on rendered payloads") {
    // the direct header parse must report exactly what the SPI reader
    // reports — rate, frame count, layout — for every payload renderWavs
    // emits, and reject non-WAV bytes so they fall back to the SPI
    val media = Seq.tabulate(25)(i =>
      Multimodal.MediaRecord(i.toLong, "text/plain",
        s"doc payload $i".getBytes("UTF-8"), Map.empty)).toDS()
    val wavs = Multimodal.renderWavs(media).collect()
    wavs.foreach { w =>
      val parsed = Multimodal.parseWavPcm(w.content)
        .getOrElse(fail(s"fast path rejected a rendered WAV (id ${w.media_id})"))
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(w.content))
      try {
        val fmt = ais.getFormat
        assert(parsed.sampleRate == fmt.getSampleRate.toInt)
        assert(parsed.bits == fmt.getSampleSizeInBits)
        assert(parsed.channels == fmt.getChannels)
        assert(parsed.dataLen.toLong / parsed.blockAlign == ais.getFrameLength)
      } finally ais.close()
    }
    assert(Multimodal.parseWavPcm("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(Multimodal.parseWavPcm(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decodeAudio fast path and SPI fallback agree on an AIFF payload") {
    // AIFF is not RIFF/WAVE, so it must take the SPI branch and still
    // decode the same features a WAV of the same PCM would
    val fmtBE = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val n = 64
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) { // alternating ±4096 square wave, big-endian
      val s = if ((i & 1) == 0) 4096 else -4096
      pcm(2 * i) = ((s >> 8) & 0xFF).toByte
      pcm(2 * i + 1) = (s & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmtBE, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    assert(Multimodal.parseWavPcm(out.toByteArray).isEmpty, "AIFF must not parse as WAV")
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/aiff", out.toByteArray, Map.empty)).toDS()
    val a = Multimodal.decodeAudio(media).collect().head
    assert(a == Multimodal.DecodedAudio(1L, 8000, n.toLong, 4096.0 / 32768.0,
      decoded = true))
  }

  test("renderPatternImages -> imageAHash: planted resize variants collapse, distinct patterns do not") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val media = Multimodal.fromText(docs, "doc_id", "text", "image")
    val hashed = Multimodal.imageAHash(
        Multimodal.renderPatternImages(media, variantEvery = 5))
      .collect()
    assert(hashed.forall(_.decoded), "every rendered pattern must decode")
    val (variants, bases) =
      hashed.partition(_.media_id >= Multimodal.ImageVariantStride)
    assert(variants.nonEmpty, "fixture must plant variants")
    val baseById = bases.map(h => h.media_id -> h).toMap
    assert(variants.map(_.media_id - Multimodal.ImageVariantStride).toSet ==
      bases.filter(_.media_id % 5 == 0).map(_.media_id).toSet,
      "exactly every 5th doc gets a variant")
    variants.foreach { v =>
      val b = baseById(v.media_id - Multimodal.ImageVariantStride)
      // the whole point of aHash: same perceptual content, different
      // bytes AND different true decoded dimensions, identical hash
      assert(v.ahash == b.ahash, s"variant hash must equal base: $v vs $b")
      assert((v.width, v.height) != (b.width, b.height),
        s"variant must be a genuinely different size: $v vs $b")
    }
    // distinct md5-derived patterns must not collapse: distinct hashes
    // among bases stay near the base count (no systematic collisions)
    val distinctHashes = bases.map(_.ahash).distinct.length
    assert(distinctHashes > bases.length * 9 / 10,
      s"only $distinctHashes distinct hashes over ${bases.length} bases")
    // and the registered pair query finds exactly the planted pairs at
    // distance 0 (plus whatever genuine near-patterns exist, none here)
    val pairs = graft.queries.PipelineQueries.mmImageNeardup(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    variants.foreach { v =>
      val baseId = v.media_id - Multimodal.ImageVariantStride
      assert(pairs.contains((baseId, v.media_id, 0L)),
        s"planted pair ($baseId, ${v.media_id}) missing")
    }
  }
}
