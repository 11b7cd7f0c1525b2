package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen video-container metadata parser — the video leg of
  * the [[ImageMetaExpr]]/[[AudioMetaExpr]] discipline: extracts
  * `(format, brand, width, height, timescale, duration, n_tracks)`
  * from an MP4/ISO-BMFF payload's box tree with pure byte arithmetic,
  * no codec library. The container is a tree of boxes (big-endian
  * 32-bit size + 4-byte type; size 1 → 64-bit largesize follows;
  * size 0 → box runs to end of stream — ISO/IEC 14496-12 §4.2): a
  * bounded top-level walk records the `ftyp` major brand and locates
  * `moov`; inside `moov`, `mvhd` (version 0 or 1) carries the movie
  * timescale and duration, and each `trak`'s `tkhd` carries track
  * dimensions as 16.16 fixed-point — the FIRST track with a nonzero
  * width (audio tracks are zero-width by spec) supplies width/height.
  * Headers only: `mdat` is skipped by its declared size, never read —
  * metadata must come from the leading bytes of a 100 TB media scan.
  *
  * Unrecognized/truncated/desynced payloads (no ftyp, no moov, no
  * mvhd, or a zero timescale) yield
  * `("unknown", null, null, null, null, null, null)` — never an
  * exception: at corpus scale a malformed blob must degrade to a
  * filterable row, not kill the job. Null payload → null struct
  * (UnaryExpression default).
  */
case class VideoMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_video_meta expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = VideoMetaExpr.metaType

  override def prettyName: String = "graft_video_meta"

  override protected def nullSafeEval(b: Any): Any =
    VideoMetaExpr.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.VideoMetaExpr$$.MODULE$$.parse($b)")

  override protected def withNewChildInternal(newChild: Expression): VideoMetaExpr =
    copy(child = newChild)
}

object VideoMetaExpr {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("n_tracks", IntegerType)))

  private val Mp4 = UTF8String.fromString("mp4")
  private val Avi = UTF8String.fromString("avi")
  private val Unknown = UTF8String.fromString("unknown")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def row(fmt: UTF8String, brand: Any, w: Any, h: Any,
      ts: Any, dur: Any, nt: Any): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    r.update(0, fmt); r.update(1, brand); r.update(2, w); r.update(3, h)
    r.update(4, ts); r.update(5, dur); r.update(6, nt)
    r
  }
  private val unknown: InternalRow =
    row(Unknown, null, null, null, null, null, null)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Box size including header at `pos` bounded by `end`, or -1 on a
    * malformed header (size < header, 64-bit overflow, truncation). */
  private def boxSize(b: Array[Byte], pos: Int, end: Int): Long = {
    val s = be32(b, pos)
    if (s == 0L) (end - pos).toLong            // box runs to end of stream
    else if (s == 1L) {                        // 64-bit largesize follows
      if (pos + 16 > end) -1L
      else {
        val ls = be64(b, pos + 8)
        if (ls < 16L) -1L else ls
      }
    } else if (s < 8L) -1L
    else s
  }

  /** The RIFF/AVI arm — one new list-chunk walk on the RIFF
    * discipline ([[AudioMetaExpr]]'s, Long cursor and all): LIST
    * `hdrl` carries `avih` (µs/frame, total frames, stream count,
    * dimensions) and the first LIST `strl`'s `strh`, whose fccHandler
    * (e.g. MJPG) reports as the brand. Mapping into the shared
    * schema: format = "avi", timescale = 1,000,000 (ticks are
    * microseconds), duration = µsPerFrame · totalFrames,
    * n_tracks = dwStreams. Same never-throw degrade contract. */
  private def parseAvi(b: Array[Byte]): InternalRow = {
    val n = b.length
    var pos = 12L
    var steps = 0
    while (pos + 8 <= n && steps < 64) {
      val p = pos.toInt
      val size = le32(b, p + 4)
      if (size < 0L || size > Int.MaxValue.toLong) return unknown
      if (tag(b, p, "LIST") && size >= 4L && p + 12 <= n &&
          tag(b, p + 8, "hdrl")) {
        val end = math.min(p + 8 + size, n.toLong)
        var q = p + 12L
        var inner = 0
        var usFrame = -1L; var totFrames = -1L; var streams = -1L
        var w = -1L; var h = -1L
        var brand: UTF8String = null
        while (q + 8 <= end && inner < 64) {
          val qi = q.toInt
          val s2 = le32(b, qi + 4)
          if (s2 < 0L || s2 > Int.MaxValue.toLong) return unknown
          if (tag(b, qi, "avih") && s2 >= 40L && qi + 48 <= n) {
            usFrame = le32(b, qi + 8)
            totFrames = le32(b, qi + 8 + 16)
            streams = le32(b, qi + 8 + 24)
            w = le32(b, qi + 8 + 32)
            h = le32(b, qi + 8 + 36)
          } else if (tag(b, qi, "LIST") && s2 >= 4L && qi + 12 <= n &&
              tag(b, qi + 8, "strl") && brand == null) {
            // first stream header's fccHandler is the codec brand
            val r = qi + 12
            if (r + 16 <= n && tag(b, r, "strh") &&
                le32(b, r + 4) >= 8L)
              brand = UTF8String.fromBytes(b, r + 12, 4)
          }
          q += 8L + s2 + (s2 & 1L)
          inner += 1
        }
        if (usFrame <= 0L || totFrames < 0L) return unknown
        return row(Avi, brand,
          if (w > 0L) Int.box(w.toInt) else null,
          if (w > 0L) Int.box(h.toInt) else null,
          Long.box(1000000L), Long.box(usFrame * totFrames),
          if (streams >= 0L) Int.box(streams.toInt) else null)
      }
      pos += 8L + size + (size & 1L)
      steps += 1
    }
    unknown
  }

  /** Parse the ISO-BMFF box tree (or, for RIFF/AVI payloads, the AVI
    * header list); never throws, never returns null. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 16) return unknown
    if (tag(b, 0, "RIFF") && tag(b, 8, "AVI ")) return parseAvi(b)
    var pos = 0
    var steps = 0
    var brand: UTF8String = null
    var moovStart = -1
    var moovEnd = -1
    // top-level walk: real files carry a handful of boxes before moov;
    // past 64 it's a desynced blob
    while (pos + 8 <= n && steps < 64 && moovStart < 0) {
      val size = boxSize(b, pos, n)
      if (size < 0L) return unknown
      val hdr = if (be32(b, pos) == 1L) 16 else 8
      if (tag(b, pos + 4, "ftyp")) {
        if (pos + hdr + 4 > n) return unknown
        brand = UTF8String.fromBytes(b, pos + hdr, 4)
      } else if (tag(b, pos + 4, "moov")) {
        moovStart = pos + hdr
        moovEnd = math.min(pos + math.min(size, Int.MaxValue.toLong).toInt, n)
      }
      // skip by DECLARED size (mdat's bytes need not be present —
      // headers-only scan); a skip past n ends the walk
      pos = if (size > (n - pos).toLong) n else pos + size.toInt
      steps += 1
    }
    if (brand == null || moovStart < 0 || moovEnd < moovStart) return unknown
    var p = moovStart
    steps = 0
    var ts = -1L
    var dur = -1L
    var w = -1
    var h = -1
    var nTracks = 0
    while (p + 8 <= moovEnd && steps < 64) {
      val size = boxSize(b, p, moovEnd)
      if (size < 0L) return unknown
      val hdr = if (be32(b, p) == 1L) 16 else 8
      if (tag(b, p + 4, "mvhd") && p + hdr < moovEnd) {
        // the version-byte read itself needs the guard: an 8-byte box
        // ending exactly at moovEnd == n would otherwise read index n
        val v = u8(b, p + hdr)
        if (v == 0 && p + hdr + 20 <= moovEnd) {
          ts = be32(b, p + hdr + 12)
          dur = be32(b, p + hdr + 16)
        } else if (v == 1 && p + hdr + 32 <= moovEnd) {
          // v1: 64-bit creation/modification, 32-bit timescale,
          // 64-bit duration
          ts = be32(b, p + hdr + 20)
          dur = be64(b, p + hdr + 24)
        }
      } else if (tag(b, p + 4, "trak")) {
        nTracks += 1
        val trakEnd =
          math.min(p + math.min(size, Int.MaxValue.toLong).toInt, moovEnd)
        var q = p + hdr
        var inner = 0
        var found = false
        while (q + 8 <= trakEnd && inner < 64 && !found) {
          val s2 = boxSize(b, q, trakEnd)
          if (s2 < 0L) return unknown
          val h2 = if (be32(b, q) == 1L) 16 else 8
          if (tag(b, q + 4, "tkhd") && q + h2 < trakEnd) {
            found = true
            val v = u8(b, q + h2)
            // width/height are 16.16 fixed-point at the end of the
            // header: v0 → +76 from the verflags, v1 (+8-byte
            // creation/modification/duration) → +88
            val wOff = q + h2 + (if (v == 1) 88 else 76)
            if (wOff + 8 <= trakEnd) {
              val rw = (be32(b, wOff) >> 16).toInt
              val rh = (be32(b, wOff + 4) >> 16).toInt
              // first nonzero-width track (a video track) wins; an
              // audio-first file still reports its video dimensions
              if (w <= 0 && rw > 0) { w = rw; h = rh }
              else if (w < 0) { w = rw; h = rh }
            }
          }
          q = if (s2 > (trakEnd - q).toLong) trakEnd else q + s2.toInt
          inner += 1
        }
      }
      p = if (size > (moovEnd - p).toLong) moovEnd else p + size.toInt
      steps += 1
    }
    if (ts <= 0L || dur < 0L) return unknown
    row(Mp4, brand,
      if (w > 0) Int.box(w) else null,
      if (w > 0) Int.box(h) else null,
      Long.box(ts), Long.box(dur), Int.box(nTracks))
  }
}
