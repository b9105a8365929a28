package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Minimal spec-conformant PNG encoder (truecolor, 8-bit, filter 0) for
  * the deterministic media SYNTHESIS stages ([[Multimodal.renderImages]]
  * / [[Multimodal.renderVideos]] / the resize re-encode).
  *
  * Why not `ImageIO.write`: the same lesson as round 7's audio fix
  * (direct RIFF/WAVE assembly replaced the lock-serialized
  * `AudioSystem` SPI path, 14.1 s → 1.06 s) — `javax.imageio`'s writer
  * pipeline pays SPI lookup, `ImageOutputStream` creation, and color
  * model negotiation PER CALL, which dwarfs the actual deflate work for
  * the thousands of ≤64×64 frames these stages emit. The bytes
  * produced here are ordinary PNGs (signature, IHDR, one IDAT holding
  * the zlib-compressed filter-0 scanlines, IEND) that the DOWNSTREAM
  * decode stages still read with genuine `ImageIO.read` — the measured
  * operator is unchanged, only the test-data stand-in got out of its
  * way. Spec-pinned: `MultimodalSpec` round-trips these bytes through
  * `ImageIO` pixel-for-pixel.
  */
private[graft] object FastPng {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length), 0, 4)
    val tb = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(tb)
    crc.update(data)
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    out.write(be32(crc.getValue.toInt), 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED) // zlib-wrapped, as IDAT requires
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](math.max(256, raw.length / 2))
    val out = new ByteArrayOutputStream(256)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  /** Assemble a PNG from pre-built scanlines (`h` rows of 1 filter byte
    * + 3·w RGB bytes).
    */
  private def fromScanlines(w: Int, h: Int, raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(128 + raw.length / 4)
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    System.arraycopy(be32(w), 0, ihdr, 0, 4)
    System.arraycopy(be32(h), 0, ihdr, 4, 4)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    // compression 0, filter 0, interlace 0 already zeroed
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** w×h solid-color truecolor PNG. */
  def encodeSolid(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val stride = 1 + 3 * w
    val row = new Array[Byte](stride)
    var i = 1
    while (i < stride) {
      row(i) = ((rgb >> 16) & 0xFF).toByte
      row(i + 1) = ((rgb >> 8) & 0xFF).toByte
      row(i + 2) = (rgb & 0xFF).toByte
      i += 3
    }
    val raw = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      System.arraycopy(row, 0, raw, r * stride, stride)
      r += 1
    }
    fromScanlines(w, h, raw)
  }

  /** Any BufferedImage → truecolor PNG. TYPE_3BYTE_BGR (what the
    * synthesis/resize stages build) goes through its backing byte
    * buffer directly; everything else falls back to per-pixel getRGB.
    *
    * The direct path's layout assumptions (pixel stride 3, scanline
    * stride 3·w, band order B,G,R, zero buffer/raster offsets) are each
    * CHECKED against the raster's SampleModel rather than inferred from
    * getType alone (round-8 advice: a custom SampleModel image could
    * share the type constant and buffer length yet order channels
    * differently — such images now take the getRGB fallback, which is
    * layout-agnostic by construction).
    */
  def encodeImage(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    val layoutOk = img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
      img.getRaster.getSampleModelTranslateX == 0 &&
      img.getRaster.getSampleModelTranslateY == 0 &&
      (img.getRaster.getSampleModel match {
        case sm: java.awt.image.PixelInterleavedSampleModel =>
          sm.getPixelStride == 3 && sm.getScanlineStride == 3 * w &&
            java.util.Arrays.equals(sm.getBandOffsets, Array(2, 1, 0))
        case _ => false
      })
    val direct = layoutOk &&
      (img.getRaster.getDataBuffer match {
        case db: java.awt.image.DataBufferByte
            if db.getOffset == 0 && db.getData.length == w * h * 3 =>
          val src = db.getData
          var r = 0
          while (r < h) {
            val ro = r * stride
            var c = 0
            while (c < w) {
              val si = (r * w + c) * 3 // BGR order in the buffer
              val di = ro + 1 + c * 3
              raw(di) = src(si + 2)
              raw(di + 1) = src(si + 1)
              raw(di + 2) = src(si)
              c += 1
            }
            r += 1
          }
          true
        case _ => false
      })
    if (!direct) {
      var r = 0
      while (r < h) {
        val ro = r * stride
        var c = 0
        while (c < w) {
          val p = img.getRGB(c, r)
          val di = ro + 1 + c * 3
          raw(di) = ((p >> 16) & 0xFF).toByte
          raw(di + 1) = ((p >> 8) & 0xFF).toByte
          raw(di + 2) = (p & 0xFF).toByte
          c += 1
        }
        r += 1
      }
    }
    fromScanlines(w, h, raw)
  }
}
