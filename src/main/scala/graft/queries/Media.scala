package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.Multimodal._

/** Multimodal-column queries over a synthetic media table derived from
  * `documents` (text bytes as the opaque payload — deterministic, so the
  * DuckDB oracle reproduces the fake decode exactly; see
  * [[graft.functions.Multimodal]] for the real-decoder swap point).
  */
object Media {

  private def media(s: SparkSession, dir: String): DataFrame =
    syntheticMedia(Graft.parquetSource(s, dir).table("documents"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q32: metadata predicate + stubbed decode/feature-extract ------
    // The width filter is a plain column predicate — Catalyst prunes it
    // without touching payload bytes (the 100 TB contract). The 4-dim
    // feature vector is emitted as four scalar double columns: the
    // driver's pandas compare cannot sort array-typed columns, and scalar
    // doubles compare exactly (same md5-derived arithmetic both engines).
    "q32_media_features" -> ((s, dir) => {
      val feats = decodeStub(col("payload"))
      media(s, dir)
        .where(col("meta.width") >= 200)
        .select(
          col("media_id"),
          col("meta.media_type").as("media_type"),
          col("meta.width").as("width"),
          payloadBytes(col("payload")).as("n_bytes"),
          feats.getItem(0).as("f0"),
          feats.getItem(1).as("f1"),
          feats.getItem(2).as("f2"),
          feats.getItem(3).as("f3"),
          hex(thumbnail(col("payload"), 8)).as("thumb_hex"))
        .orderBy("media_id")
    }),

    // ---- q33: frame sampling — every 4th 16-byte frame -----------------
    "q33_frame_sample" -> ((s, dir) => {
      val frames = sampleFrames(col("payload"), 16, 4)
      media(s, dir)
        .select(
          col("media_id"),
          size(frames).as("n_frames"),
          hex(element_at(frames, 1)).as("first_frame_hex"),
          hex(element_at(frames, -1)).as("last_frame_hex"))
        .orderBy("media_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // payload == UTF-8 text bytes; documents are pure ASCII (verified), so
    // varchar substring == byte slicing and md5(text) == md5(payload).
    "q32_media_features" ->
      """SELECT doc_id AS media_id,
        |  'image' AS media_type,
        |  (length(text) % 1920)::int AS width,
        |  octet_length(text::blob) AS n_bytes,
        |  (('0x'||substr(md5(text),1,8))::bigint % 997)::double / 997.0 AS f0,
        |  (('0x'||substr(md5(text),9,8))::bigint % 991)::double / 991.0 AS f1,
        |  (('0x'||substr(md5(text),17,8))::bigint % 983)::double / 983.0 AS f2,
        |  octet_length(text::blob)::double AS f3,
        |  hex(substring(text, 1, 8)) AS thumb_hex
        |FROM documents
        |WHERE (length(text) % 1920) >= 200
        |ORDER BY media_id""".stripMargin,

    "q33_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    list_transform(range(0, greatest((octet_length(text::blob)-1)//64, 0) + 1),
        |      i -> substring(text, (i*64+1)::int, 16)) frames
        |  FROM documents
        |)
        |SELECT media_id, len(frames) AS n_frames,
        |  hex(frames[1]) AS first_frame_hex,
        |  hex(frames[-1]) AS last_frame_hex
        |FROM f ORDER BY media_id""".stripMargin
  )
}
