package graft.functions

import java.io.ByteArrayOutputStream

/** Deterministic, VALID MJPEG-in-AVI payloads whose frame pixels are a
  * pure formula of (id, frame, block) — the video fixture of the q179
  * real-decode contract (q200): the engine walks the RIFF/AVI
  * container itself ([[Multimodal.decodeVideoFrames]]), decodes each
  * frame's JPEG with the JDK's own `javax.imageio`, and aggregates
  * per-frame pixel stats; the DuckDB oracle never touches a byte — it
  * computes the SAME stats straight from the formula. Any container
  * bug (wrong chunk size, bad list nesting) or JPEG encoder/decoder
  * bug surfaces as a cross-engine mismatch.
  *
  * JPEG exactness (the reason the formula CAN be an oracle for a
  * lossy codec): every frame is 8-bit GRAYSCALE with dimensions that
  * are multiples of 8, every 8×8 block is CONSTANT, and the
  * quantization table is all ones. A constant block's forward DCT is
  * DC-only with F(0,0) = 8·(v − 128) (an exact integer), the all-ones
  * table quantizes it losslessly, and the decoder's DC-only IDCT
  * shortcut reconstructs v exactly — so decode(encode(raster)) is the
  * raster, bit for bit, with a fully standard baseline JPEG stream
  * (T.81: SOI, DQT, SOF0, DHT, SOS, entropy-coded DC + EOB per block,
  * EOI). The Huffman tables are minimal custom canonical tables (DC
  * categories 0–12 at 4 bits, AC with the single EOB symbol at 1
  * bit) — tables travel in the stream, so any conformant decoder
  * reads them. [[SyntheticVideoSelfTest]] pins the exactness
  * assumption against the JDK decoder in the test suite.
  *
  * Formula (shared verbatim with the q200/q202 oracle SQL): every
  * id % 13 == 4 doc (id ≥ 4) is a RE-ENCODE of doc id−4 — identical
  * frame CONTENT (dimensions, frame count, pixels all follow the
  * source id's formulas) in a fresh container (its own frame timing)
  * — the planted near-duplicate q202's frame-signature dedup must
  * catch; all content formulas therefore read through srcOf. For the
  * source id s = srcOf(id): frame width = 8·(s%3+1), height =
  * 8·(s%2+1), frames nf = s%3+2; block b (row-major, bw·bh blocks of
  * 64 px) of frame f is the constant (s·7 + f·31 + b·3) mod 256.
  * Every 11th doc (id % 11 == 5) ships a TRUNCATED container instead
  * — the malformed row the walker must degrade on (no frames), never
  * throw.
  */
object SyntheticVideo {

  /** A base video: neither plant applies — its formulas read its own
    * id. Plants only ever source from BASE videos (non-recursive by
    * construction), so both oracles stay CASE-expressible. */
  def isBase(id: Long): Boolean =
    !(id % 13 == 4 && id >= 4) && !(id % 19 == 6 && id >= 6)

  /** Planted RE-ENCODE: identical frame content to the BASE video
    * id − 4 in a fresh container (q202's exact-content dup). */
  def isReenc(id: Long): Boolean =
    id % 13 == 4 && id >= 4 && isBase(id - 4)

  /** Planted CLIP: shares its first two frames (and dims/frame count)
    * with the BASE video id − 6, the rest is its own content —
    * q205's partial-overlap near-dup. A doc matching both plant
    * residues falls back to clip only when the re-encode's source is
    * not base. */
  def isClip(id: Long): Boolean =
    id % 19 == 6 && id >= 6 && !isReenc(id) && isBase(id - 6)

  /** The dims/frame-count source id. */
  def dimSrc(id: Long): Long =
    if (isReenc(id)) id - 4 else if (isClip(id)) id - 6 else id

  /** The content-source id of frame `f`. */
  def frameSrc(id: Long, f: Int): Long =
    if (isReenc(id)) id - 4
    else if (isClip(id) && f < 2) id - 6
    else id

  /** Kept for the q202 narrative: the whole-video content source
    * (== dimSrc for re-encodes and base videos). */
  def srcOf(id: Long): Long = if (isReenc(id)) id - 4 else id

  /** Uncompressed-variant selector: every id % 5 == 1 doc ships raw
    * BI_RGB DIB frames ('00db' chunks, 24-bit BGR bottom-up rows
    * padded to 4 bytes — the bytes ARE the pixels, the q197 zero-codec
    * discipline on video) instead of MJPEG; content formulas are
    * identical, so a DIB re-encode of an MJPEG source still
    * fingerprints equal in q202 (codec-independent content dedup). */
  def isDib(id: Long): Boolean = id % 5 == 1

  def widthOf(id: Long): Int = (dimSrc(id) % 3 + 1).toInt * 8
  def heightOf(id: Long): Int = (dimSrc(id) % 2 + 1).toInt * 8
  def framesOf(id: Long): Int = (dimSrc(id) % 3 + 2).toInt

  /** Constant value of block `b` (row-major) in frame `f` — the
    * oracle formula (reads through the per-frame content source). */
  def blockVal(id: Long, f: Int, b: Int): Int =
    ((frameSrc(id, f) * 7 + f * 31 + b * 3) % 256).toInt

  /** The valid (or, for id % 11 == 5, deliberately truncated)
    * AVI payload for one id. */
  def payload(id: Long): Array[Byte] = {
    val avi = aviOf(id)
    if (id % 11 == 5) java.util.Arrays.copyOf(avi, 16) else avi
  }

  // ---- bit/byte helpers -------------------------------------------------

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }
  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >>> 8) & 0xFF).toInt)
    out.write(((v >>> 16) & 0xFF).toInt)
    out.write(((v >>> 24) & 0xFF).toInt)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length)
  }
  private def be16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  // ---- minimal exact baseline JPEG (grayscale, constant blocks) ---------

  /** Canonical Huffman codes for `bits`(1..16)/`values` DHT spec:
    * symbol → (code, length). */
  private def canonical(bits: Array[Int],
      values: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += values(k) -> ((code, len)); code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    m.result()
  }

  // DC: categories 0..12, all 4-bit codes (13 of 16 codewords used —
  // the all-ones code stays unassigned, as T.81 requires)
  private val DcBits = Array(0, 0, 0, 13, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 12).toArray
  private val DcCodes = canonical(DcBits, DcVals)
  // AC: the single EOB symbol (0x00) at 1 bit
  private val AcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0)
  private val AcCodes = canonical(AcBits, AcVals)

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code.toLong & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    /** Flush with 1-padding (T.81 F.1.2.3). */
    def finish(): Unit = if (n > 0) {
      val pad = 8 - n
      put((1 << pad) - 1, pad)
    }
  }

  /** Magnitude category of a DC difference (0 for 0). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** One baseline grayscale JPEG of `bw`×`bh` CONSTANT 8×8 blocks
    * (row-major block values in `blocks`). Exact under any conformant
    * decoder — see the object Scaladoc. */
  def jpegGray(bw: Int, bh: Int, blocks: Array[Int]): Array[Byte] = {
    require(blocks.length == bw * bh, "need one value per block")
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)                         // SOI
    marker(0xDB); be16(out, 67); out.write(0x00) // DQT: table 0, 8-bit
    var i = 0
    while (i < 64) { out.write(1); i += 1 }      // all-ones quant table
    marker(0xC0); be16(out, 11)          // SOF0, 1 component
    out.write(8)                         // precision
    be16(out, bh * 8); be16(out, bw * 8) // height, width
    out.write(1)                         // components
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); be16(out, 19 + vals.length)
      out.write(cls << 4)                // class (0 DC / 1 AC), id 0
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xDA); be16(out, 8)           // SOS
    out.write(1)                         // 1 component in scan
    out.write(1); out.write(0x00)        // comp 1, DC table 0, AC table 0
    out.write(0); out.write(63); out.write(0) // spectral, approx
    val bw2 = new BitWriter(out)
    var pred = 0
    var b = 0
    while (b < blocks.length) {
      val dc = 8 * (blocks(b) - 128)     // exact DCT of a constant block
      val diff = dc - pred
      pred = dc
      val c = category(diff)
      val (code, len) = DcCodes(c)
      bw2.put(code, len)
      if (c > 0) {
        val extra = if (diff >= 0) diff else diff + (1 << c) - 1
        bw2.put(extra, c)
      }
      val (ec, el) = AcCodes(0)          // EOB: all AC are zero
      bw2.put(ec, el)
      b += 1
    }
    bw2.finish()
    marker(0xD9)                         // EOI
    out.toByteArray
  }

  /** The frame-f JPEG for one id. */
  def frameJpeg(id: Long, f: Int): Array[Byte] = {
    val bw = widthOf(id) / 8; val bh = heightOf(id) / 8
    jpegGray(bw, bh, Array.tabulate(bw * bh)(b => blockVal(id, f, b)))
  }

  /** The frame-f raw DIB (BI_RGB 24-bit, bottom-up, 4-byte-padded
    * rows) for one id — gray pixels, so B = G = R = blockVal. */
  def frameDib(id: Long, f: Int): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id); val bw = w / 8
    val rowBytes = (w * 3 + 3) & ~3
    val out = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y // bottom-up
      var x = 0
      while (x < w) {
        val v = blockVal(id, f, (y / 8) * bw + (x / 8)).toByte
        val o = fileRow * rowBytes + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v // B, G, R
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- AVI (RIFF) container ---------------------------------------------

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fourcc(out, id); le32(out, body.length.toLong)
    out.write(body, 0, body.length)
    if (body.length % 2 == 1) out.write(0) // RIFF even-pad rule
    out.toByteArray
  }
  private def list(subtype: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fourcc(out, "LIST"); le32(out, (body.length + 4).toLong)
    fourcc(out, subtype)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** One valid AVI: LIST hdrl (avih + LIST strl(strh vids/MJPG +
    * strf BITMAPINFOHEADER)) + LIST movi ('00dc' JPEG per frame). */
  private def aviOf(id: Long): Array[Byte] = {
    val w = widthOf(id); val h = heightOf(id); val nf = framesOf(id)
    // timing keys on the RAW id at mod-7 grain so a re-encode (id−4)
    // carries different frame timing than its source — same content,
    // different container, the q202 planted-dup shape
    val usPerFrame = 40000L + (id % 7) * 5000L
    val avih = {
      val o = new ByteArrayOutputStream()
      le32(o, usPerFrame)       // dwMicroSecPerFrame
      le32(o, 0L)               // dwMaxBytesPerSec
      le32(o, 0L)               // dwPaddingGranularity
      le32(o, 0L)               // dwFlags
      le32(o, nf.toLong)        // dwTotalFrames
      le32(o, 0L)               // dwInitialFrames
      le32(o, 1L)               // dwStreams
      le32(o, 0L)               // dwSuggestedBufferSize
      le32(o, w.toLong); le32(o, h.toLong)
      (1 to 4).foreach(_ => le32(o, 0L)) // dwReserved
      o.toByteArray
    }
    val codecTag = if (isDib(id)) "DIB " else "MJPG"
    val strh = {
      val o = new ByteArrayOutputStream()
      fourcc(o, "vids"); fourcc(o, codecTag)
      le32(o, 0L); le32(o, 0L)  // dwFlags, wPriority+wLanguage
      le32(o, 0L)               // dwInitialFrames
      le32(o, usPerFrame)       // dwScale (µs)
      le32(o, 1000000L)         // dwRate  (ticks/s) → rate/scale = fps
      le32(o, 0L)               // dwStart
      le32(o, nf.toLong)        // dwLength (frames)
      le32(o, 0L)               // dwSuggestedBufferSize
      le32(o, 0xFFFFFFFFL)      // dwQuality (-1)
      le32(o, 0L)               // dwSampleSize
      le32(o, 0L); le32(o, (w.toLong << 16) | h.toLong) // rcFrame
      o.toByteArray
    }
    val strf = {
      val o = new ByteArrayOutputStream()
      le32(o, 40L)              // biSize
      le32(o, w.toLong); le32(o, h.toLong)
      le16(o, 1); le16(o, 24)   // planes, bit count
      if (isDib(id)) le32(o, 0L) // biCompression: BI_RGB (uncompressed)
      else fourcc(o, "MJPG")
      le32(o, (w * h * 3).toLong) // biSizeImage
      le32(o, 0L); le32(o, 0L); le32(o, 0L); le32(o, 0L)
      o.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl",
        chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      (0 until nf).map(f =>
        if (isDib(id)) chunk("00db", frameDib(id, f))
        else chunk("00dc", frameJpeg(id, f)))
        .reduce(_ ++ _))
    val body = hdrl ++ movi
    val out = new ByteArrayOutputStream()
    fourcc(out, "RIFF"); le32(out, (body.length + 4).toLong)
    fourcc(out, "AVI ")
    out.write(body, 0, body.length)
    out.toByteArray
  }
}
