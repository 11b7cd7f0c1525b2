package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * engine as opaque `BinaryType` columns with a typed metadata struct
  * (SURVEY.md §7.2 step 7 — north-star extension).
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * per-row processing, frame sampling — is real and tested, and as of
  * round 14 the CONTAINER-METADATA half of decode is real too:
  * [[imageMeta]] parses format/width/height/bit-depth out of PNG/GIF/
  * JPEG headers with pure byte arithmetic ([[ImageMetaExpr]], q175).
  * Only the PIXEL-decode step remains STUBBED (this container has no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * features from the raw bytes.
  * On a real cluster, swap `decodeStub` for a `mapPartitions` body that
  * opens a codec once per partition and streams batches through it; the
  * schema and call shape below do not change.
  *
  * Scale notes (100 TB of media): payloads stay in executor memory only
  * one row-batch at a time (no collect); metadata-only predicates (media
  * type, width, duration) are plain columns, so Catalyst prunes/pushes
  * them without touching the blobs; frame-sampling reduces bytes BEFORE
  * any shuffle.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("codec", StringType),
    StructField("width", IntegerType),       // image/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("n_frames", IntegerType)))   // video/audio frames

  /** A media table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Payload byte length (works on BinaryType). */
  def payloadBytes(payload: Column): Column = octet_length(payload)

  /** REAL image-container metadata from the payload's leading bytes —
    * `(format, width, height, bit_depth)` via the native codegen
    * [[ImageMetaExpr]] (PNG IHDR fixed offsets, GIF little-endian
    * screen descriptor, JPEG bounded SOF-marker walk). No codec
    * library involved: this is the part of the decode step that IS
    * expressible as pure byte arithmetic, upgrading the metadata
    * fields from the stub to a real parse; pixel decode stays behind
    * the [[decodePartitionwise]] seam. Unrecognized payloads parse to
    * `("unknown", null, null, null)`. */
  def imageMeta(payload: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(ImageMetaExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(payload)))

  /** STUB "decode + feature extract": a deterministic 4-dim feature vector
    * from the payload bytes — stands in for a real decode→embed step.
    * Real implementation: ??? (codec unavailable in this container); the
    * call shape is `binary → array<double>` and stays columnar. */
  def decodeStub(payload: Column): Column = {
    // Three independent 32-bit hashes from md5 hex slices — keeps every
    // intermediate below 2^32 (no precision-losing Long→Double division).
    def h(off: Int): Column =
      conv(substring(md5(payload), off, 8), 16, 10).cast("long")
    array(
      pmod(h(1), lit(997L)).cast("double") / 997d,
      pmod(h(9), lit(991L)).cast("double") / 991d,
      pmod(h(17), lit(983L)).cast("double") / 983d,
      octet_length(payload).cast("double"))
  }

  /** Frame sampling: every `stride`-th fixed-size frame of the payload.
    * For fixed-frame media (raw audio/planar video) this is exact; for
    * container formats the real decoder replaces it — shape is identical:
    * one row in, array of binary frames out. */
  def sampleFrames(payload: Column, frameBytes: Int, stride: Int): Column =
    transform(
      sequence(lit(0L),
        greatest(floor((octet_length(payload) - 1) / (frameBytes * stride))
          .cast("long"), lit(0L))),
      i => substr(payload, (i * (frameBytes * stride) + 1).cast("int"),
        lit(frameBytes)))

  /** "Resize": keep a prefix of the payload — the stub for a thumbnail
    * step; preserves the binary-in/binary-out columnar contract. */
  def thumbnail(payload: Column, bytes: Int): Column =
    substring(payload, 1, bytes)

  /** The per-partition decoder lifecycle a REAL codec needs (native
    * handles, model weights, JNI state): constructed once per partition,
    * streamed through, never serialized to the driver. The stub computes
    * the same features as [[decodeStub]] (asserted by PipelineSpec), so
    * the two decode paths are interchangeable — columnar expressions when
    * the "decode" is expressible, this seam when it needs a library. */
  final class StubCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def features(payload: Array[Byte]): Array[Double] = {
      md.reset()
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      def h(off: Int): Long = java.lang.Long.parseLong(hex.substring(off, off + 8), 16)
      Array(h(0) % 997L / 997d, h(8) % 991L / 991d, h(16) % 983L / 983d,
        payload.length.toDouble)
    }
  }

  /** Partition-parallel decode over the batch iterator — the Scala analog
    * of a pandas/Arrow batch UDF: one codec per partition, one pass over
    * the rows, columnar result schema `(media_id, features)`. */
  def decodePartitionwise(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new StubCodec // opened once per partition, not per row
        rows.map { case (id, payload) => (id, codec.features(payload)) }
      }
      .toDF("media_id", "features")
  }

  /** Wrap a text/documents table as a synthetic media table: the text
    * bytes become the payload (deterministic, so the DuckDB oracle can
    * reproduce features exactly). */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("media_type"),
        lit("fake").as("codec"),
        (length(col("text")) % 1920).cast("int").as("width"),
        (length(col("text")) % 1080).cast("int").as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("n_frames")).as("meta"))
}
