package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen audio-container metadata parser — the audio leg of
  * the [[ImageMetaExpr]] discipline: extracts
  * `(format, channels, sample_rate, bit_depth, n_samples)` from a
  * WAV/RIFF payload's chunk list with pure byte arithmetic, no codec
  * library. RIFF signature + WAVE form type, then a bounded chunk walk
  * (each chunk = 4-byte id, little-endian 32-bit size, even-padded
  * payload — the spec's alignment rule): the `fmt ` chunk carries
  * audio format (1 = PCM, 3 = IEEE float), channel count, sample rate
  * and bits per sample; the `data` chunk's DECLARED size divides by
  * the frame stride (channels·bits/8) into the sample count. The
  * declared size is used even when the blob is truncated past the
  * header — metadata must come from the first KB of a 100 TB media
  * scan, not from reading the audio bytes.
  *
  * Unrecognized/truncated/desynced payloads (or a zero frame stride)
  * yield `("unknown", null, null, null, null)` — never an exception:
  * at corpus scale a malformed blob must degrade to a filterable row,
  * not kill the job. Null payload → null struct (UnaryExpression
  * default).
  */
case class AudioMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_meta expects binary, got ${dt.simpleString}")
  }

  override def dataType: DataType = AudioMetaExpr.metaType

  override def prettyName: String = "graft_audio_meta"

  override protected def nullSafeEval(b: Any): Any =
    AudioMetaExpr.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.AudioMetaExpr$$.MODULE$$.parse($b)")

  override protected def withNewChildInternal(newChild: Expression): AudioMetaExpr =
    copy(child = newChild)
}

object AudioMetaExpr {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("n_samples", LongType)))

  private val WavPcm = UTF8String.fromString("wav_pcm")
  private val WavFloat = UTF8String.fromString("wav_float")
  private val Unknown = UTF8String.fromString("unknown")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))

  private def row(fmt: UTF8String, ch: Any, sr: Any, bd: Any,
      ns: Any): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    r.update(0, fmt); r.update(1, ch); r.update(2, sr); r.update(3, bd)
    r.update(4, ns)
    r
  }
  private val unknown: InternalRow = row(Unknown, null, null, null, null)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Parse the RIFF/WAVE chunk list; never throws, never returns null. */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return unknown
    // pos is Long: a declared chunk size near Int.MaxValue must not wrap
    // the cursor negative (the walk terminates when pos + 8 > n instead)
    var pos = 12L
    var steps = 0
    var audioFmt = -1
    var ch = 0; var sr = 0; var bits = 0
    var dataSize = -1L
    // bounded walk: real WAV headers carry well under 16 chunks before
    // data; past 32 it's a desynced blob
    while (pos + 8 <= n && steps < 32 && (audioFmt < 0 || dataSize < 0)) {
      val p = pos.toInt
      val size = le32(b, p + 4)
      if (size < 0L || size > Int.MaxValue.toLong) return unknown
      if (tag(b, p, "fmt ")) {
        if (p + 8 + 16 > n || size < 16L) return unknown
        audioFmt = le16(b, p + 8)
        ch = le16(b, p + 10)
        sr = le32(b, p + 12).toInt
        bits = le16(b, p + 22)
      } else if (tag(b, p, "data")) {
        dataSize = size // declared size — the data bytes themselves
        // need not be present (headers-only scan)
      }
      // chunks are even-padded (RIFF alignment rule)
      pos += 8L + size + (size & 1L)
      steps += 1
    }
    if (audioFmt < 0 || dataSize < 0L) return unknown
    val stride = ch.toLong * (bits / 8).toLong
    if (stride <= 0L) return unknown
    val fmt = audioFmt match {
      case 1 => WavPcm
      case 3 => WavFloat
      case _ => return unknown
    }
    row(fmt, ch, sr, bits, dataSize / stride)
  }
}
