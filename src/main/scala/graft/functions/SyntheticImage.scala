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

  /** [[px]] with the near-dup ±1 perturbation: every 7th pixel's
    * stored value v becomes v ⊕ 1 (= v + 1 − 2·(v%2) — always a ±1
    * step, never leaves 0..255). The q208 fixture formula, shared
    * verbatim with the oracle SQL. */
  def pxPerturbed(id: Long, i: Int, mult: Long, perturb: Boolean): Int = {
    val v = px(id, i, mult)
    if (perturb && i % 7 == 3) v + 1 - 2 * (v % 2) else v
  }

  /** The valid container payload for one id (format by id % 3). */
  def payload(id: Long): Array[Byte] = (id % 3) match {
    case 0 => png(id, colorType = 2)
    case 1 => png(id, colorType = 0)
    case _ => gifGray(id)
  }

  // ---- the q207/q208 dedup-fixture plant grammar -------------------
  // Non-recursive (the SyntheticVideo discipline): plants only source
  // from ids whose RESIDUES are plant-free, so both oracles stay
  // CASE-expressible. reenc (id % 13 == 4) carries id−4's exact
  // pixels in a different encoding; near (id % 17 == 8, reenc wins
  // ties) carries id−8's pixels with the ±1 perturbation.

  private def residuePlantFree(i: Long): Boolean =
    !(i % 13 == 4 && i >= 4) && !(i % 17 == 8 && i >= 8)

  def isReencPlant(id: Long): Boolean =
    id % 13 == 4 && id >= 4 && residuePlantFree(id - 4)

  def isNearPlant(id: Long): Boolean =
    id % 17 == 8 && id >= 8 && !isReencPlant(id) &&
      residuePlantFree(id - 8)

  /** The q207/q208 fixture payload: base images plus planted
    * re-encodes (same decoded pixels, different bytes — PNG Sub-filter
    * re-encode for truecolor, PNG↔GIF cross-codec for the
    * single-channel formats) and planted near-dups (source pixels
    * with the sparse ±1 perturbation, in the source's own format
    * class). Deterministic byte-for-byte; the oracle evaluates the
    * same plant grammar over the pixel formula without decoding. */
  def dedupPayload(id: Long): Array[Byte] =
    if (isReencPlant(id)) {
      val src = id - 4
      (src % 3) match {
        // truecolor: same codec, same pixels, DIFFERENT bytes (the
        // Sub filter predicts left — a genuine re-encode, not a copy)
        case 0 => png(src, colorType = 2, filterSub = true)
        // gray PNG ↔ GIF: cross-codec, identical decoded pixels
        // (palette entry j = (j,j,j), so GIF index == gray value)
        case 1 => gifGray(src)
        case _ => png(src, colorType = 0)
      }
    } else if (isNearPlant(id)) {
      val src = id - 8
      (src % 3) match {
        case 0 => png(src, colorType = 2, perturb = true)
        case 1 => png(src, colorType = 0, perturb = true)
        case _ => gifGray(src, perturb = true)
      }
    } else payload(id)

  // ---- the q215 cross-modal still plant ----------------------------
  // Every 23rd id (id % 23 == 7) is a grayscale PNG whose raster IS
  // frame 0 of video id−7 ([[SyntheticVideo]]'s 8×8 constant-block
  // formula) — the "image is a still of a corpus video" case a
  // cross-modal dedup must catch. Sources only from videos that
  // decode (not truncated) and whose frames are their OWN formula
  // (plant-free), so the oracle stays CASE-expressible.

  private def stillSourceOk(vid: Long): Boolean =
    vid % 11 != 5 && !(vid % 13 == 4 && vid >= 4) &&
      !(vid % 19 == 6 && vid >= 6)

  def isStillPlant(id: Long): Boolean =
    id % 23 == 7 && id >= 7 && stillSourceOk(id - 7)

  /** The FAR still plant (id % 29 == 11, near plant wins ties): the
    * source video is id/2 — a MULTIPLICATIVE back-reference, so at any
    * corpus size a late-arriving image's source sits in the first half
    * of the id space, BELOW every 4/5 batch cut: the cross-epoch case
    * the incremental form (q216) exists for. */
  def isFarStillPlant(id: Long): Boolean =
    id % 29 == 11 && !isStillPlant(id) && stillSourceOk(id / 2)

  /** Source video id of a still plant, or −1. */
  def stillSourceOf(id: Long): Long =
    if (isStillPlant(id)) id - 7
    else if (isFarStillPlant(id)) id / 2
    else -1L

  /** The q215/q216 fixture payload: base images plus planted video
    * stills (frame-0 raster of the source video, encoded as a REAL
    * grayscale PNG — different codec, different bytes, same decoded
    * pixels as the MJPEG frame). */
  def stillPayload(id: Long): Array[Byte] = {
    val vid = stillSourceOf(id)
    if (vid < 0) payload(id)
    else {
      val w = ((vid % 3) + 1).toInt * 8
      val h = ((vid % 2) + 1).toInt * 8
      pngGrayRaster(w, h, i => {
        val b = (i / w / 8) * (w / 8) + (i % w) / 8
        ((vid * 7 + b * 3) % 256).toInt
      })
    }
  }

  /** 8-bit grayscale PNG over an arbitrary raster formula (filter
    * None rows, one real zlib IDAT — the [[png]] envelope with the
    * pixel source abstracted). */
  private def pngGrayRaster(w: Int, h: Int, f: Int => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + w))
    var o = 0
    var y = 0
    while (y < h) {
      raw(o) = 0 // filter None
      o += 1
      var x = 0
      while (x < w) {
        raw(o) = f(y * w + x).toByte
        o += 1
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
    ihdr.write(8)
    ihdr.write(0) // grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    def put(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    put(chunk("IHDR", ihdr.toByteArray))
    put(chunk("IDAT", zout.toByteArray))
    put(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
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

  /** 8-bit PNG, color type 2 (RGB) or 0 (gray), one real zlib IDAT.
    * `filterSub` switches every row from filter None to filter Sub
    * (byte = cur − left): the decoded raster is identical but the
    * stored bytes are not — the q207 same-codec re-encode plant. */
  private def png(id: Long, colorType: Int, filterSub: Boolean = false,
      perturb: Boolean = false): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id)
    val bpp = if (colorType == 2) 3 else 1
    val raw = new Array[Byte](h * (1 + w * bpp))
    var o = 0
    var y = 0
    while (y < h) {
      raw(o) = if (filterSub) 1 else 0 // filter type Sub / None
      o += 1
      val rowStart = o
      var x = 0
      while (x < w) {
        val i = y * w + x
        if (colorType == 2) {
          raw(o) = pxPerturbed(id, i, 7, perturb).toByte
          raw(o + 1) = pxPerturbed(id, i, 11, perturb).toByte
          raw(o + 2) = pxPerturbed(id, i, 13, perturb).toByte
          o += 3
        } else {
          raw(o) = pxPerturbed(id, i, 7, perturb).toByte
          o += 1
        }
        x += 1
      }
      if (filterSub) { // in-place: byte − left-neighbor byte (bpp back)
        var p = o - 1
        while (p >= rowStart + bpp) {
          raw(p) = (raw(p) - raw(p - bpp)).toByte
          p -= 1
        }
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
  private def gifGray(id: Long, perturb: Boolean = false): Array[Byte] = {
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
    while (i < n) {
      putCode(256); putCode(pxPerturbed(id, i, 7, perturb)); i += 1
    }
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
