package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen audio PCM SAMPLE decode — the audio leg of the q179
  * real-decode discipline, needing no codec library at all: WAV PCM
  * samples ARE the bytes (8-bit unsigned / 16-bit signed
  * little-endian), so the full decode is pure byte arithmetic. The
  * [[AudioMetaExpr]] chunk walk locates `fmt ` (stream parameters)
  * and `data` (sample bytes, either order), then every complete frame
  * actually PRESENT reduces to per-channel sum/min/max — stats over
  * the RAW stored values (8-bit in 0..255, 16-bit in −32768..32767),
  * never a rendering/normalization conversion (the q179 raster-only
  * rule). A blob truncated mid-data decodes its complete frames
  * (headers-only blobs report n_frames = 0 with null stats); the
  * channel-stat columns cover the first two channels (mono → c1
  * null), n_frames counts whatever the stride divides.
  *
  * Unsupported-for-decode streams (non-PCM codec, bit depth other
  * than 8/16, zero/absurd channel counts, desynced chunk lists) yield
  * `("unknown", null, ...)` — never an exception: at corpus scale a
  * malformed blob must degrade to a filterable row, not kill the
  * job. Null payload → null struct (UnaryExpression default).
  */
case class AudioPcmExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_pcm expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = AudioPcmExpr.statsType

  override def prettyName: String = "graft_audio_pcm"

  override protected def nullSafeEval(b: Any): Any =
    AudioPcmExpr.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.AudioPcmExpr$$.MODULE$$.parse($b)")

  override protected def withNewChildInternal(newChild: Expression): AudioPcmExpr =
    copy(child = newChild)
}

object AudioPcmExpr {

  val statsType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("n_frames", LongType),
    StructField("c0_sum", LongType),
    StructField("c0_min", IntegerType),
    StructField("c0_max", IntegerType),
    StructField("c1_sum", LongType),
    StructField("c1_min", IntegerType),
    StructField("c1_max", IntegerType)))

  private val WavPcm = UTF8String.fromString("wav_pcm")
  private val Unknown = UTF8String.fromString("unknown")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le16s(b: Array[Byte], i: Int): Int = le16(b, i).toShort.toInt
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  private def row(fmt: UTF8String, xs: Array[Any]): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(10)
    r.update(0, fmt)
    var i = 0
    while (i < 9) { r.update(i + 1, xs(i)); i += 1 }
    r
  }
  private val unknown: InternalRow =
    row(Unknown, Array.fill[Any](9)(null))

  /** Decode the PCM frames; never throws, never returns null. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return unknown
    // pos is Long: a declared chunk size near Int.MaxValue must not wrap
    // the cursor negative (the walk terminates when pos + 8 > n instead)
    var pos = 12L
    var steps = 0
    var audioFmt = -1
    var ch = 0; var bits = 0
    var dataStart = -1
    var dataSize = -1L
    while (pos + 8 <= n && steps < 32 && (audioFmt < 0 || dataStart < 0)) {
      val p = pos.toInt
      val size = le32(b, p + 4)
      if (size < 0L || size > Int.MaxValue.toLong) return unknown
      if (tag(b, p, "fmt ")) {
        if (p + 8 + 16 > n || size < 16L) return unknown
        audioFmt = le16(b, p + 8)
        ch = le16(b, p + 10)
        bits = le16(b, p + 22)
      } else if (tag(b, p, "data")) {
        dataStart = p + 8
        dataSize = size
      }
      pos += 8L + size + (size & 1L)
      steps += 1
    }
    if (audioFmt != 1 || dataStart < 0) return unknown
    if ((bits != 8 && bits != 16) || ch < 1 || ch > 8) return unknown
    val stride = ch * (bits / 8)
    // decode the frames actually PRESENT (declared size may run past a
    // truncated blob — headers-only scans still report)
    val avail = math.min(dataSize, (n - dataStart).toLong)
    val frames = (avail / stride).toInt
    if (frames <= 0)
      return row(WavPcm, Array[Any](Int.box(ch), Int.box(bits),
        Long.box(0L), null, null, null, null, null, null))
    val nc = math.min(ch, 2)
    val sums = new Array[Long](nc)
    val mins = Array.fill(nc)(Int.MaxValue)
    val maxs = Array.fill(nc)(Int.MinValue)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < nc) {
        val off = dataStart + (f * ch + c) * (bits / 8)
        val v = if (bits == 8) u8(b, off) else le16s(b, off)
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        c += 1
      }
      f += 1
    }
    val c1 = ch >= 2
    row(WavPcm, Array[Any](Int.box(ch), Int.box(bits),
      Long.box(frames.toLong),
      Long.box(sums(0)), Int.box(mins(0)), Int.box(maxs(0)),
      if (c1) Long.box(sums(1)) else null,
      if (c1) Int.box(mins(1)) else null,
      if (c1) Int.box(maxs(1)) else null))
  }
}
