package graft.queries

import org.apache.spark.sql.functions._

import graft.Graft
import graft.streaming.EventStreams

/** Batch-parity entries for the Structured Streaming surface
  * (SURVEY.md §2.2 "Streaming" row): the driver's DuckDB oracle can only
  * run batch SQL, so these queries run the SAME transform functions the
  * streaming jobs use (`EventStreams.attributedPurchases`,
  * `EventStreams.dedupedWithinWatermark`) over the batch `events` table —
  * Structured Streaming's model is one logical plan incrementalized by
  * the engine, so a green row here certifies the transform itself while
  * StreamingSpec certifies its incremental execution over MemoryStreams
  * (watermark eviction, bounded state).
  */
object StreamingParity {

  val defs: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(

    // ---- q58: stream-stream attribution join, batch form ---------------
    // Purchases joined to same-user clicks of the preceding 30 minutes —
    // the EventStreams.attributedPurchases plan verbatim (watermarks are
    // no-ops on batch input). In streaming, the time-range condition is
    // what bounds join state (rate × window per side); in batch, Catalyst
    // plans the user_id equi-join with the range as a post-filter, so the
    // intermediate is per-user clicks × purchases — bounded by per-user
    // activity in the window, never corpus-quadratic. Output timestamps
    // are µs longs (the cross-engine-safe grain).
    "q58_stream_attribution" -> ((s, dir) => {
      val ev = Graft.parquetSource(s, dir).table("events")
      EventStreams.attributedPurchases(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"), 30)
        .select(col("purchase_id"), col("user_id"),
          unix_micros(col("p_ts")).as("p_ts_us"),
          unix_micros(col("c_ts")).as("c_ts_us"),
          col("click_value"))
    }),

    // ---- q59: watermark-bounded streaming dedup, batch form ------------
    // At-least-once delivery simulated by replaying the event stream
    // (union with itself), then EventStreams.dedupedWithinWatermark on
    // event_id — dropDuplicatesWithinWatermark, whose streaming state is
    // bounded by (arrival rate × delay) because a key's entry is evicted
    // once the watermark passes it. Duplicate rows are byte-identical, so
    // which one survives is immaterial — the output is deterministic.
    "q59_stream_dedup" -> ((s, dir) => {
      val ev = Graft.parquetSource(s, dir).table("events")
      val redelivered = ev.unionAll(ev)
      EventStreams.dedupedWithinWatermark(
        redelivered, Seq("event_id"), "30 minutes")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts_us")).as("ts_us"), col("value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q58_stream_attribution" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) ts_us, user_id, event_type, value
        |  FROM events
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, ts_us AS p_ts_us
        |  FROM e WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts_us AS c_ts_us, value AS click_value
        |  FROM e WHERE event_type = 'click'
        |)
        |SELECT p.purchase_id, p.user_id, p.p_ts_us, c.c_ts_us, c.click_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.c_ts_us <= p.p_ts_us
        |  AND c.c_ts_us >= p.p_ts_us - 30*60*1000000""".stripMargin,

    // Exact-duplicate replay collapses back to the source stream: event_id
    // is unique in `events`, so dedup over the doubled stream IS the
    // original relation.
    "q59_stream_dedup" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM events""".stripMargin
  )
}
