package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Deterministic, VALID image payloads whose pixels are a pure formula
  * of the id — the fixture side of the real-pixel-decode contract
  * (q179): the engine builds these containers, decodes them with the
  * JDK's own `javax.imageio` ([[Multimodal.decodePixels]]), and
  * aggregates per-channel stats; the DuckDB oracle never decodes a
  * byte — it computes the SAME stats straight from the formula. Any
  * encoder bug (wrong stride, wrong palette, broken LZW) or decoder
  * bug therefore surfaces as a cross-engine mismatch.
  *
  * Formats (id % 3): 0 → PNG truecolor (color type 2), 1 → PNG
  * grayscale (color type 0), 2 → GIF87a with a 256-entry grayscale
  * palette. PNG IDAT is a real zlib stream (`java.util.zip.Deflater`);
  * GIF image data is a real LZW stream held at a fixed 9-bit code
  * width by emitting a CLEAR code before every pixel literal (the
  * classic fixed-width trick: the decoder's table never grows, so the
  * stream stays trivially correct at ~2.25 bytes/pixel — fine for the
  * tiny fixture images, never for production encoding).
  *
  * Pixel formula (shared verbatim with the q179 oracle SQL):
  * dimensions w = id%13+1, h = id%11+1; pixel index i = y·w + x;
  * channel value = (id·m + 3i) mod 256 with m = 7/11/13 for R/G/B in
  * truecolor and m = 7 for the single gray/palette channel (so
  * r = g = b for formats 1 and 2).
  */
object SyntheticImage {

  def widthOf(id: Long): Int = (id % 13 + 1).toInt
  def heightOf(id: Long): Int = (id % 11 + 1).toInt

  /** Channel value at pixel index `i` (row-major) — the oracle formula. */
  def px(id: Long, i: Int, mult: Long): Int =
    ((id * mult + 3L * i) % 256).toInt

  /** The valid container payload for one id (format by id % 3). */
  def payload(id: Long): Array[Byte] = (id % 3) match {
    case 0 => png(id, colorType = 2)
    case 1 => png(id, colorType = 0)
    case _ => gifGray(id)
  }

  private def be32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  /** One PNG chunk: length, tag, body, CRC32(tag ++ body). */
  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    be32(out, body.length)
    val tb = tag.getBytes("US-ASCII")
    out.write(tb, 0, tb.length)
    out.write(body, 0, body.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(body)
    be32(out, crc.getValue.toInt)
    out.toByteArray
  }

  /** 8-bit PNG, color type 2 (RGB) or 0 (gray), filter None rows,
    * one real zlib IDAT. */
  private def png(id: Long, colorType: Int): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id)
    val bpp = if (colorType == 2) 3 else 1
    val raw = new Array[Byte](h * (1 + w * bpp))
    var o = 0
    var y = 0
    while (y < h) {
      raw(o) = 0 // filter type None
      o += 1
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (colorType == 2) {
          raw(o) = px(id, i, 7).toByte
          raw(o + 1) = px(id, i, 11).toByte
          raw(o + 2) = px(id, i, 13).toByte
          o += 3
        } else {
          raw(o) = px(id, i, 7).toByte
          o += 1
        }
        x += 1
      }
      y += 1
    }
    val defl = new Deflater()
    defl.setInput(raw)
    defl.finish()
    val zbuf = new Array[Byte](raw.length + 128)
    val zout = new ByteArrayOutputStream()
    while (!defl.finished()) {
      val n = defl.deflate(zbuf)
      zout.write(zbuf, 0, n)
    }
    defl.end()
    val ihdr = new ByteArrayOutputStream()
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8)         // bit depth
    ihdr.write(colorType) // 2 = truecolor, 0 = grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate/adaptive/none
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    def put(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    put(chunk("IHDR", ihdr.toByteArray))
    put(chunk("IDAT", zout.toByteArray))
    put(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** GIF87a, global 256-entry grayscale palette (entry j = (j,j,j)),
    * single image, fixed-9-bit LZW (CLEAR before every literal). */
  private def gifGray(id: Long): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id)
    val out = new ByteArrayOutputStream()
    val sig = "GIF87a".getBytes("US-ASCII")
    out.write(sig, 0, sig.length)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    le16(w); le16(h)
    out.write(0xF7) // GCT present | 8-bit color resolution | GCT size 256
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var j = 0
    while (j < 256) { out.write(j); out.write(j); out.write(j); j += 1 }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW minimum code size → initial code width 9
    // LZW stream, LSB-first bit packing. CLEAR(256) before every pixel
    // literal resets the decoder's table each step, so the code width
    // never leaves 9 bits; EOI(257) ends the stream.
    val bits = new ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def putCode(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += 9
      while (nbits >= 8) {
        bits.write((acc & 0xFF).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    val n = w * h
    var i = 0
    while (i < n) { putCode(256); putCode(px(id, i, 7)); i += 1 }
    putCode(257)
    if (nbits > 0) bits.write((acc & 0xFF).toInt)
    val data = bits.toByteArray
    var p = 0
    while (p < data.length) {
      val len = math.min(255, data.length - p)
      out.write(len)
      out.write(data, p, len)
      p += len
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
