package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-payload pixel statistics from [[Multimodal.decodePixels]] —
  * all-long so the DuckDB oracle compares dtype-clean (n_px = width
  * x height; sums/extrema per 8-bit sRGB channel). Undecodable
  * payloads carry None everywhere but media_id. */
final case class PixelStats(media_id: Long, format: Option[String],
    width: Option[Long], height: Option[Long], n_px: Option[Long],
    r_sum: Option[Long], r_min: Option[Long], r_max: Option[Long],
    g_sum: Option[Long], g_min: Option[Long], g_max: Option[Long],
    b_sum: Option[Long], b_min: Option[Long], b_max: Option[Long])

object PixelStats {
  def empty(id: Long): PixelStats =
    PixelStats(id, None, None, None, None, None, None, None, None,
      None, None, None, None, None)
}

/** Per-frame pixel statistics from [[Multimodal.decodeVideoFrames]] —
  * grayscale (band-0) stats per decoded frame; all-long for the
  * dtype-clean oracle compare. */
final case class FrameStats(media_id: Long, frame_idx: Long,
    format: String, width: Long, height: Long, n_px: Long,
    p_sum: Long, p_min: Long, p_max: Long)

/** Per-payload thumbnail statistics from
  * [[Multimodal.decodeThumbnails]] — per-channel stats over the
  * nearest-neighbor-downsampled raster; all-long for the dtype-clean
  * oracle compare. Undecodable payloads carry None everywhere but
  * media_id. */
final case class ThumbStats(media_id: Long, format: Option[String],
    src_w: Option[Long], src_h: Option[Long],
    tw: Option[Long], th: Option[Long], n_px: Option[Long],
    r_sum: Option[Long], r_min: Option[Long], r_max: Option[Long],
    g_sum: Option[Long], g_min: Option[Long], g_max: Option[Long],
    b_sum: Option[Long], b_min: Option[Long], b_max: Option[Long])

object ThumbStats {
  def empty(id: Long): ThumbStats =
    ThumbStats(id, None, None, None, None, None, None, None, None,
      None, None, None, None, None, None, None)
}

/** Exact decoded-pixel fingerprint from
  * [[Multimodal.fingerprintPixels]]: `px_hash` is a polynomial
  * rolling hash (base 31, mod 1e9+7, seed 7) over the full
  * interleaved-RGB pixel sequence — a pure function of the DECODED
  * content, so cross-codec re-encodes collide and any pixel change
  * separates. Undecodable payloads carry None everywhere but
  * media_id. */
final case class PixelFp(media_id: Long, format: Option[String],
    width: Option[Long], height: Option[Long], px_hash: Option[Long])

/** Perceptual hashes from [[Multimodal.perceptualHashes]] over the
  * t×t nearest-neighbor R-band thumb raster: `ahash` bit k = 1 iff
  * pixel k is strictly above the raster mean (integer
  * cross-multiply, no division); `dhash` bit k = 1 iff pixel k is
  * strictly above its row-cyclic right neighbor. Only images with
  * both dims ≥ t emit a row (a perceptual raster needs a minimum
  * source). */
final case class PHash(media_id: Long, t: Long, ahash: Long,
    dhash: Long)

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * engine as opaque `BinaryType` columns with a typed metadata struct
  * (SURVEY.md §7.2 step 7 — north-star extension).
  *
  * As of round 15 the decode step is REAL end-to-end for images:
  * [[imageMeta]] parses format/width/height/bit-depth out of PNG/GIF/
  * JPEG headers with pure byte arithmetic ([[ImageMetaExpr]], q175),
  * and [[decodePixels]] decodes actual PNG/GIF pixels through the
  * JDK's own `javax.imageio` (java.desktop — present in every JDK
  * Spark runs on; no external codec library) behind the partitionwise
  * codec seam: one [[ImageCodec]] per partition, rows streamed through
  * it, per-channel stats out (q179 — oracle-verified against synthetic
  * images whose pixels are a pure formula, [[SyntheticImage]]).
  * Audio/video codecs would occupy the same seam with the same
  * lifecycle; [[contentFeatures]] remains the codec-free columnar
  * fingerprint for payloads with no decodable container.
  *
  * Scale notes (100 TB of media): payloads stay in executor memory only
  * one row-batch at a time (no collect); metadata-only predicates (media
  * type, width, duration) are plain columns, so Catalyst prunes/pushes
  * them without touching the blobs; frame-sampling reduces bytes BEFORE
  * any shuffle; decode cost is per-blob CPU with no shuffle attached
  * (the decode plan is scan → project → mapPartitions, exchange-free —
  * plan-pinned by PlanQualitySpec).
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

  /** REAL audio-container metadata from the payload's chunk list —
    * `(format, channels, sample_rate, bit_depth, n_samples)` via the
    * native codegen [[AudioMetaExpr]] (RIFF/WAVE bounded chunk walk:
    * `fmt ` carries the stream parameters, `data`'s declared size
    * divides into the sample count). The audio leg of the
    * [[imageMeta]] discipline — same never-throw degrade-to-unknown
    * contract, same headers-only scan-riding cost. */
  def audioMeta(payload: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(AudioMetaExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(payload)))

  /** REAL video-container metadata from the payload's box tree —
    * `(format, brand, width, height, timescale, duration, n_tracks)`
    * via the native codegen [[VideoMetaExpr]] (MP4/ISO-BMFF bounded
    * box walk: `ftyp` brand, `moov/mvhd` movie timescale + duration,
    * first video `trak/tkhd` 16.16 fixed-point dimensions; `mdat` is
    * skipped by declared size, never read). The video leg of the
    * [[imageMeta]]/[[audioMeta]] triad — same never-throw
    * degrade-to-unknown contract, same headers-only scan-riding
    * cost. */
  def videoMeta(payload: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(VideoMetaExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(payload)))

  /** REAL audio PCM SAMPLE decode — the audio analog of
    * [[decodePixels]], needing NO codec library (PCM samples ARE the
    * bytes): the native codegen [[AudioPcmExpr]] locates `fmt `/`data`
    * via the [[audioMeta]] chunk walk and reduces every complete frame
    * present to per-channel sum/min/max over the RAW stored values.
    * Same never-throw degrade-to-unknown contract; truncated blobs
    * decode their complete frames. */
  def audioPcmStats(payload: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(AudioPcmExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(payload)))

  /** Codec-free content fingerprint: a deterministic 4-dim feature
    * vector from the payload bytes (three independent md5-derived
    * 32-bit hashes + the byte length) — the columnar feature for
    * payloads that have no decodable container (or where a cheap
    * exact-content signal is all a dedup/routing step needs). This is
    * NOT a decode (that's [[decodePixels]]); it is a real fingerprint,
    * oracle-matched bit-for-bit (q32). `binary → array<double>`,
    * stays columnar. */
  def contentFeatures(payload: Column): Column = {
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

  /** REAL per-partition image decoder — the codec lifecycle a decode
    * step needs (reader state constructed once per partition, rows
    * streamed through, never serialized to the driver), occupied by
    * the JDK's own `javax.imageio` (java.desktop — every JDK ships
    * it; headless-safe). Decodes the full pixel raster of any format
    * ImageIO recognizes (PNG, GIF, JPEG, BMP, ...) and reduces it to
    * per-channel stats; undecodable payloads degrade to an all-null
    * stats row (format = null), never throw — the imageMeta 'unknown'
    * discipline. */
  final class ImageCodec {
    ImageCodec.headless // AWT headless before any ImageIO touch

    /** Decode one payload to per-channel pixel stats. */
    def stats(id: Long, payload: Array[Byte]): PixelStats = {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers == null || !readers.hasNext) return PixelStats.empty(id)
          val rd = readers.next()
          rd.setInput(iis)
          val fmt = rd.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = try rd.read(0) finally rd.dispose()
          val w = img.getWidth; val h = img.getHeight
          // RAW decoded samples, not getRGB(): BufferedImage.getRGB
          // pushes gray/custom colorspaces through a linear→sRGB
          // conversion (gray 7 reads back as 46), which is a RENDERING
          // step, not the decode — stats must be over the stored pixel
          // values. Palette formats resolve through their color table
          // (IndexColorModel is a plain lookup, no conversion).
          val raster = img.getRaster
          val icm = img.getColorModel match {
            case m: java.awt.image.IndexColorModel => m
            case _ => null
          }
          val bands = raster.getNumBands
          var rs = 0L; var gs = 0L; var bs = 0L
          var rmn = 255L; var rmx = 0L
          var gmn = 255L; var gmx = 0L
          var bmn = 255L; var bmx = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var r = 0; var g = 0; var b = 0
              if (icm != null) {
                val idx = raster.getSample(x, y, 0)
                r = icm.getRed(idx); g = icm.getGreen(idx)
                b = icm.getBlue(idx)
              } else if (bands >= 3) {
                r = raster.getSample(x, y, 0)
                g = raster.getSample(x, y, 1)
                b = raster.getSample(x, y, 2)
              } else { // grayscale (+ optional alpha band)
                r = raster.getSample(x, y, 0); g = r; b = r
              }
              rs += r; gs += g; bs += b
              if (r < rmn) rmn = r; if (r > rmx) rmx = r
              if (g < gmn) gmn = g; if (g > gmx) gmx = g
              if (b < bmn) bmn = b; if (b > bmx) bmx = b
              x += 1
            }
            y += 1
          }
          PixelStats(id, Some(fmt), Some(w.toLong), Some(h.toLong),
            Some(w.toLong * h), Some(rs), Some(rmn), Some(rmx),
            Some(gs), Some(gmn), Some(gmx), Some(bs), Some(bmn), Some(bmx))
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => PixelStats.empty(id)
      }
    }

    /** Decode + REAL nearest-neighbor downsample to at most tw x th
      * (clamped to the source dims — a thumbnail never upsamples),
      * reduced to per-channel stats over the THUMB raster. The NN map
      * is exact integer arithmetic — sx = floor(x'*w/tw'), sy =
      * floor(y'*h/th') — so the q204 oracle reproduces every sampled
      * pixel from the fixture formula. Same decode path and raw-sample
      * discipline as [[stats]]; undecodable payloads degrade to the
      * all-null row, never throw. */
    def thumbStats(id: Long, payload: Array[Byte], tw: Int,
        th: Int): ThumbStats = {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers == null || !readers.hasNext) return ThumbStats.empty(id)
          val rd = readers.next()
          rd.setInput(iis)
          val fmt = rd.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = try rd.read(0) finally rd.dispose()
          val w = img.getWidth; val h = img.getHeight
          val raster = img.getRaster
          val icm = img.getColorModel match {
            case m: java.awt.image.IndexColorModel => m
            case _ => null
          }
          val bands = raster.getNumBands
          val twc = math.min(tw, w); val thc = math.min(th, h)
          var rs = 0L; var gs = 0L; var bs = 0L
          var rmn = 255L; var rmx = 0L
          var gmn = 255L; var gmx = 0L
          var bmn = 255L; var bmx = 0L
          var yy = 0
          while (yy < thc) {
            val sy = yy * h / thc
            var xx = 0
            while (xx < twc) {
              val sx = xx * w / twc
              var r = 0; var g = 0; var b = 0
              if (icm != null) {
                val idx = raster.getSample(sx, sy, 0)
                r = icm.getRed(idx); g = icm.getGreen(idx)
                b = icm.getBlue(idx)
              } else if (bands >= 3) {
                r = raster.getSample(sx, sy, 0)
                g = raster.getSample(sx, sy, 1)
                b = raster.getSample(sx, sy, 2)
              } else {
                r = raster.getSample(sx, sy, 0); g = r; b = r
              }
              rs += r; gs += g; bs += b
              if (r < rmn) rmn = r; if (r > rmx) rmx = r
              if (g < gmn) gmn = g; if (g > gmx) gmx = g
              if (b < bmn) bmn = b; if (b > bmx) bmx = b
              xx += 1
            }
            yy += 1
          }
          ThumbStats(id, Some(fmt), Some(w.toLong), Some(h.toLong),
            Some(twc.toLong), Some(thc.toLong),
            Some(twc.toLong * thc), Some(rs), Some(rmn), Some(rmx),
            Some(gs), Some(gmn), Some(gmx), Some(bs), Some(bmn),
            Some(bmx))
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => ThumbStats.empty(id)
      }
    }
    /** Decode + exact content fingerprint: the polynomial rolling
      * hash over the full interleaved-RGB pixel sequence (row-major,
      * r then g then b per pixel; base 31 mod 1e9+7, seed 7) — the
      * [[PixelFp]] contract. Same decode path and raw-sample
      * discipline as [[stats]]; undecodable payloads degrade to the
      * all-null row, never throw. */
    def fingerprint(id: Long, payload: Array[Byte]): PixelFp = {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers == null || !readers.hasNext)
            return PixelFp(id, None, None, None, None)
          val rd = readers.next()
          rd.setInput(iis)
          val fmt = rd.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = try rd.read(0) finally rd.dispose()
          val w = img.getWidth; val h = img.getHeight
          val raster = img.getRaster
          val icm = img.getColorModel match {
            case m: java.awt.image.IndexColorModel => m
            case _ => null
          }
          val bands = raster.getNumBands
          val P = 1000000007L
          var acc = 7L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var r = 0; var g = 0; var b = 0
              if (icm != null) {
                val idx = raster.getSample(x, y, 0)
                r = icm.getRed(idx); g = icm.getGreen(idx)
                b = icm.getBlue(idx)
              } else if (bands >= 3) {
                r = raster.getSample(x, y, 0)
                g = raster.getSample(x, y, 1)
                b = raster.getSample(x, y, 2)
              } else {
                r = raster.getSample(x, y, 0); g = r; b = r
              }
              acc = (acc * 31 + r) % P
              acc = (acc * 31 + g) % P
              acc = (acc * 31 + b) % P
              x += 1
            }
            y += 1
          }
          PixelFp(id, Some(fmt), Some(w.toLong), Some(h.toLong),
            Some(acc))
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) =>
          PixelFp(id, None, None, None, None)
      }
    }

    /** Decode + perceptual hashes over the t×t nearest-neighbor
      * R-band thumb raster (the [[thumbStats]] integer NN map) — the
      * [[PHash]] contract. None for undecodable payloads AND for
      * images smaller than t in either dimension (a perceptual hash
      * over an upsampled raster would compare padding, not content). */
    def phash(id: Long, payload: Array[Byte], t: Int): Option[PHash] = {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers == null || !readers.hasNext) return None
          val rd = readers.next()
          rd.setInput(iis)
          val img = try rd.read(0) finally rd.dispose()
          val w = img.getWidth; val h = img.getHeight
          if (w < t || h < t) return None
          val raster = img.getRaster
          val icm = img.getColorModel match {
            case m: java.awt.image.IndexColorModel => m
            case _ => null
          }
          val n = t * t
          val v = new Array[Int](n)
          var yy = 0
          while (yy < t) {
            val sy = yy * h / t
            var xx = 0
            while (xx < t) {
              val sx = xx * w / t
              val s0 = raster.getSample(sx, sy, 0)
              v(yy * t + xx) = if (icm != null) icm.getRed(s0) else s0
              xx += 1
            }
            yy += 1
          }
          var sum = 0L
          var k = 0
          while (k < n) { sum += v(k); k += 1 }
          var ah = 0L; var dh = 0L
          k = 0
          while (k < n) {
            if (v(k).toLong * n > sum) ah |= 1L << k
            val nb = (k / t) * t + ((k % t) + 1) % t
            if (v(k) > v(nb)) dh |= 1L << k
            k += 1
          }
          Some(PHash(id, t.toLong, ah, dh))
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  object ImageCodec {
    /** Executors have no display; ImageIO itself is display-free but
      * AWT class init is not guaranteed to be — pin headless once. */
    lazy val headless: Unit =
      if (System.getProperty("java.awt.headless") == null)
        System.setProperty("java.awt.headless", "true")
  }

  /** Partition-parallel REAL pixel decode over the batch iterator —
    * the Scala analog of a pandas/Arrow batch UDF and the engine's
    * decode seam: one [[ImageCodec]] per partition, one pass over the
    * rows, columnar result schema (media_id, format, width, height,
    * n_px, {r,g,b}_{sum,min,max}). Exchange-free: the plan is
    * scan → project → mapPartitions, so decode cost is pure per-blob
    * CPU that scales with executor count and never shuffles payload
    * bytes (plan-pinned). Oracle discipline: q179 decodes
    * [[SyntheticImage]] payloads whose pixels are a formula the DuckDB
    * oracle evaluates directly — cross-engine agreement proves encoder
    * AND decoder. */
  def decodePixels(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new ImageCodec // opened once per partition, not per row
        rows.map { case (id, payload) => codec.stats(id, payload) }
      }
      .toDF()
  }

  /** Partition-parallel REAL video FRAME decode — the video leg of
    * [[decodePixels]]'s codec seam, closing the triad's last honest
    * gap: the engine walks the RIFF/AVI container itself (LIST `movi`
    * → `##dc`/`##db` frame chunks; same Long-cursor bounded-walk
    * discipline as [[AudioMetaExpr]]) and feeds each MJPEG frame's
    * JPEG bytes through the SAME per-partition [[ImageCodec]] the
    * image path uses. Output: one row per decoded frame —
    * (media_id, frame_idx, format, width, height, n_px, p_sum, p_min,
    * p_max), grayscale stats over band 0 (MJPEG fixture frames are
    * grayscale; for color frames band 0 = R). Payloads that are not
    * RIFF/AVI, are truncated before `movi`, or whose frames fail to
    * decode contribute NO rows for the missing frames — a filterable
    * absence, never an exception.
    *
    * Scale shape: scan → project → mapPartitions, exchange-free (the
    * [[decodePixels]] plan); per-frame rows amplify by the frame
    * count, which `stride` bounds AT THE CONTAINER: only every
    * stride-th frame's chunk bytes enter the codec (the others are
    * walked past by their declared sizes, never decoded) — the
    * q33-shape sampling knob applied where it matters, BEFORE the
    * expensive step. frame_idx stays the stream index, so sampled
    * rows are position-faithful. */
  def decodeVideoFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"need stride >= 1 (got $stride)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new ImageCodec // one per partition, not per row
        rows.flatMap { case (id, payload) =>
          // container dims from the avih header (the VideoMetaExpr AVI
          // arm) — raw BI_RGB frames carry no dimensions of their own
          val meta = VideoMetaExpr.parse(payload)
          val isAvi = !meta.isNullAt(0) &&
            meta.getUTF8String(0).toString == "avi"
          val (cw, chh) =
            if (isAvi && !meta.isNullAt(2) && !meta.isNullAt(3))
              (meta.getInt(2), meta.getInt(3))
            else (-1, -1)
          // the DIB arm is gated on the container's DECLARED codec
          // (strh fccHandler = 'DIB '), never inferred from the frame
          // bytes: a non-MJPEG compressed codec whose chunk size
          // happens to equal rowBytes*h must degrade to no rows, not
          // be misread as raw BGR pixels
          val declaredDib = isAvi && !meta.isNullAt(1) &&
            meta.getUTF8String(1).toString == "DIB "
          aviFrames(payload, stride).iterator.flatMap {
            case (f, bytes) =>
              if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
                  (bytes(1) & 0xFF) == 0xD8) { // JPEG magic
                val s = codec.stats(id, bytes)
                s.format.map(fmt => FrameStats(id, f.toLong, fmt,
                  s.width.get, s.height.get, s.n_px.get,
                  s.r_sum.get, s.r_min.get, s.r_max.get))
              } else if (declaredDib) {
                dibFrameStats(id, f, bytes, cw, chh)
              } else None
          }
        }
      }
      .toDF()
  }

  /** Raw BI_RGB DIB frame → grayscale (R-band) stats with ZERO codec
    * involvement — the bytes ARE the pixels (24-bit BGR, bottom-up
    * rows padded to 4 bytes; the q197 discipline on video). Emits
    * nothing unless the byte count matches the container dims exactly
    * (a desynced/truncated frame must degrade, never misread). */
  private[graft] def dibFrameStats(id: Long, f: Int, bytes: Array[Byte],
      w: Int, h: Int): Option[FrameStats] = {
    if (w <= 0 || h <= 0) return None
    val rowBytes = (w * 3 + 3) & ~3
    if (bytes.length != rowBytes * h) return None
    var sum = 0L; var mn = 255L; var mx = 0L
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y
      var x = 0
      while (x < w) {
        val v = bytes(fileRow * rowBytes + x * 3 + 2) & 0xFF // R band
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        x += 1
      }
      y += 1
    }
    Some(FrameStats(id, f.toLong, "dib", w.toLong, h.toLong,
      w.toLong * h, sum, mn, mx))
  }

  /** Partition-parallel REAL thumbnail pipeline — decode + exact
    * nearest-neighbor downsample to at most `tw`×`th` + per-channel
    * stats over the thumb raster, through the same per-partition
    * [[ImageCodec]] seam as [[decodePixels]] (exchange-free plan).
    * This retires the byte-prefix [[thumbnail]] stub for images: the
    * resize step of the brief's decode/feature-extract/resize/
    * frame-sample quartet is now real, and because the NN map is
    * exact integer arithmetic the q204 oracle verifies every sampled
    * pixel from the fixture formula. */
  def decodeThumbnails(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw >= 1 && th >= 1, s"need tw/th >= 1 (got $tw x $th)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new ImageCodec // one per partition, not per row
        rows.map { case (id, payload) =>
          codec.thumbStats(id, payload, tw, th) }
      }
      .toDF()
  }

  /** Partition-parallel exact decoded-CONTENT fingerprint — the image
    * corner of the media content-dedup triangle (video q202, audio
    * q206): `px_hash` folds every decoded (r,g,b) sample through a
    * polynomial rolling hash, so the fingerprint is a pure function
    * of the decoded raster — cross-codec re-encodes (same pixels,
    * PNG↔GIF, refiltered PNG) collide exactly, any pixel change
    * separates, and the container bytes/format play no part. Same
    * exchange-free scan → project → mapPartitions plan and
    * per-partition [[ImageCodec]] seam as [[decodePixels]]; dedup
    * grouping downstream shuffles at IMAGE grain (one narrow row per
    * image), never pixel grain. */
  def fingerprintPixels(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new ImageCodec
        rows.map { case (id, payload) => codec.fingerprint(id, payload) }
      }
      .toDF()
  }

  /** Partition-parallel perceptual hashes (aHash + row-cyclic dHash)
    * over the t×t NN thumb raster — the near-dup rung of the image
    * dedup corner: Hamming-close hashes mean perceptually-similar
    * content (±1 pixel perturbations move few threshold bits), and
    * the 64-bit hash splits into 16-bit bands downstream for the
    * pigeonhole candidate join (the [[graft.ops.Dedup.simhashPairs]]
    * discipline: Hamming ≤ 3 ⟹ some band of 4 matches exactly).
    * Images smaller than t×t emit no row. Exchange-free decode plan;
    * everything pairwise happens at hash grain downstream. */
  def perceptualHashes(media: DataFrame, t: Int = 8): DataFrame = {
    require(t >= 2 && t <= 8, s"need 2 <= t <= 8 (64-bit hash; got $t)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new ImageCodec
        rows.flatMap { case (id, payload) => codec.phash(id, payload, t) }
      }
      .toDF()
  }

  /** The (stream index, payload) of every `stride`-th frame of a
    * RIFF/AVI container, in stream order — empty for
    * non-AVI/truncated/desynced blobs (never throws). Frame chunks
    * are the `movi` list's `##dc`/`##db` members (compressed /
    * uncompressed DIB of stream ##); non-sampled frames are walked
    * past by their declared sizes and their bytes are NEVER copied.
    * The cursor is a Long: a declared chunk size near Int.MaxValue
    * must terminate the walk, not wrap it negative (the
    * AudioMetaExpr lesson). */
  private[graft] def aviFrames(b: Array[Byte],
      stride: Int = 1): Seq[(Int, Array[Byte])] = {
    val n = b.length
    def tag(i: Int, s: String): Boolean =
      i + 4 <= n && b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
        b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)
    def le32(i: Int): Long =
      ((b(i) & 0xFF).toLong | ((b(i + 1) & 0xFF).toLong << 8) |
        ((b(i + 2) & 0xFF).toLong << 16) |
        ((b(i + 3) & 0xFF).toLong << 24))
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return Seq.empty
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var frameIdx = 0
    var pos = 12L
    // no step counters: both cursors advance >= 8 bytes per iteration
    // (size >= 0 always), so the walk is bounded by n/8 with no silent
    // frame-count truncation — a minutes-long 30 fps AVI keeps its
    // tail frames (desync is caught by the size-range and q+8<=end
    // gates, not by an arbitrary chunk budget)
    while (pos + 8 <= n) {
      val p = pos.toInt
      val size = le32(p + 4)
      if (size < 0L || size > Int.MaxValue.toLong) return out.result()
      if (tag(p, "LIST") && size >= 4L && p + 12 <= n &&
          tag(p + 8, "movi")) {
        val end = math.min(p + 8 + size, n.toLong)
        var q = p + 12L
        while (q + 8 <= end) {
          val qi = q.toInt
          val s2 = le32(qi + 4)
          if (s2 < 0L || s2 > Int.MaxValue.toLong) return out.result()
          // frame chunks: '##dc' (compressed) / '##db' (uncompressed)
          val isFrame = qi + 4 <= n &&
            b(qi) >= '0' && b(qi) <= '9' && b(qi + 1) >= '0' &&
            b(qi + 1) <= '9' &&
            ((b(qi + 2) == 'd' && (b(qi + 3) == 'c' || b(qi + 3) == 'b')))
          if (isFrame && q + 8 + s2 <= end) {
            if (frameIdx % stride == 0)
              out += ((frameIdx, java.util.Arrays.copyOfRange(b, qi + 8,
                qi + 8 + s2.toInt)))
            frameIdx += 1
          }
          q += 8L + s2 + (s2 & 1L)
        }
      }
      pos += 8L + size + (size & 1L)
    }
    out.result()
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
