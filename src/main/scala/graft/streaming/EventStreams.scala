package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Structured Streaming surface over the `events` stream shape
  * (TESTDATA.md; SURVEY.md §2.2 "Streaming" row — out of reference scope,
  * part of the north-star capability set).
  *
  * Batch/stream parity: every transform here takes a DataFrame/Dataset and
  * works identically on `spark.read.parquet(...)` (batch — what the q18
  * oracle checks) and `spark.readStream` / MemoryStream input (incremental
  * — what StreamingSpec checks). That is Structured Streaming's model:
  * same logical plan, incrementalized by the engine.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 1 hour is dropped, state evicted); sessionization
  * state is per-user and evicted on event-time timeout — both shapes run
  * on a 1000-executor cluster with state in the HDFS/RocksDB store.
  */
object EventStreams {

  /** Raw event row after timestamp normalization (`eventTime`; µs
    * precision is Spark's native resolution). */
  case class Event(ts_us: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, total_value: Double)

  // Top-level visibility: the state encoder's generated code constructs
  // and reads this class reflectively.
  case class SessionState(start: Long, last: Long, n: Int, total: Double)

  /** Event-time of the raw `ts` column as a µs TimestampType Column,
    * adaptive to how the source materialized it:
    *  - LongType: nanos-since-epoch (a TIMESTAMP(NANOS) parquet read under
    *    `nanosAsLong`, or a synthetic test stream) — truncated to µs;
    *  - TIMESTAMP_NTZ: parquet `timestamp[us]` without UTC adjustment (the
    *    driver testdata shape since round 9) — cast in the UTC session, so
    *    wall-clock == instant, matching DuckDB's `epoch_us` on that file;
    *  - TimestampType: already the target grain.
    * Every engine/oracle comparison on events flows through this (or
    * `eventTimeUs`), so a future testdata re-type breaks ONE function. */
  def eventTime(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType =>
        // NTZ→TZ cast interprets the wall-clock in the SESSION timezone;
        // the stored values are UTC instants, so a non-UTC session would
        // silently shift every event time relative to the oracle's
        // epoch_us. Fail loudly instead of producing shifted timestamps.
        val tz = events.sparkSession.conf.get(
          "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
        require(
          java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
          s"events.ts is TIMESTAMP_NTZ (UTC instants); casting it in a " +
            s"non-UTC session ($tz) would shift event times — set " +
            "spark.sql.session.timeZone=UTC")
        col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case dt => throw new IllegalArgumentException(
        s"unsupported events.ts type $dt (expected long nanos or timestamp)")
    }

  /** Same instant as µs-since-epoch Long — the cross-engine-safe grain
    * used where results carry raw event times. */
  def eventTimeUs(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(eventTime(events))
    }

  /** The SQL-string twin of [[eventTimeUs]], for queries composed as raw
    * SQL over the `events` view (q36's sessionize). Lives here so a
    * testdata re-type still changes exactly one file — both dispatches
    * sit side by side. */
  def eventTimeUsSql(dt: org.apache.spark.sql.types.DataType): String =
    dt match {
      case LongType                         => "ts div 1000"
      case TimestampNTZType | TimestampType =>
        "unix_micros(cast(ts as timestamp))"
      case other => throw new IllegalArgumentException(
        s"unsupported events.ts type $other (expected long nanos or timestamp)")
    }

  /** Normalize the raw events table: attach `ts_us` (µs timestamp). */
  def normalized(events: DataFrame): DataFrame =
    events.withColumn("ts_us", eventTime(events))

  /** Tumbling 1-hour windowed counts per event type with a 1-hour
    * watermark — the canonical readStream → window agg shape. */
  def hourlyCounts(events: DataFrame): DataFrame =
    normalized(events)
      .withWatermark("ts_us", "1 hour")
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n"), col("value_sum"))

  /** Streaming exact deduplication with bounded state: drop events whose
    * dedup key was already seen within the watermark delay. The streaming
    * counterpart of q26's batch hash-dedup — `dropDuplicatesWithinWatermark`
    * evicts a key's state once the watermark passes it, so state size is
    * bounded by (arrival rate × delay), never by stream history. At 100 TB/
    * day that bound is what makes exact streaming dedup feasible at all;
    * unbounded `dropDuplicates` state would grow forever. */
  def dedupedWithinWatermark(events: DataFrame, keys: Seq[String],
      delay: String): DataFrame = {
    val n = normalized(events)
    // dropDuplicatesWithinWatermark rejects batch input, so batch parity
    // dispatches to plain key-dedup — the exact batch meaning of the
    // streaming operator: with all data at hand the watermark never
    // expires a key mid-set, so "dedup within the watermark" degenerates
    // to "dedup" (the streaming guarantee is dedup of pairs ≤ delay
    // apart, with MAY-dedup beyond — batch delivers the strongest case).
    if (n.isStreaming)
      n.withWatermark("ts_us", delay).dropDuplicatesWithinWatermark(keys)
    else n.dropDuplicates(keys)
  }

  /** Stream-stream attribution join: each purchase joins the clicks of
    * the same user from the preceding `windowMinutes`. Both sides are
    * watermarked, and the time-range condition lets the engine BOUND the
    * join state: a click's state is dropped once the watermark passes
    * click_ts + window (it can no longer match any future purchase), so
    * state is rate × window on each side — the only stream-stream join
    * shape that survives unbounded streams. Batch/stream parity holds
    * like every transform here (same plan, incrementalized). */
  def attributedPurchases(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int): DataFrame = {
    val p = normalized(purchases).withWatermark("ts_us", s"$windowMinutes minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    val c = normalized(clicks).withWatermark("ts_us", s"$windowMinutes minutes")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"),
        col("value").as("click_value"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"), col("c_ts"),
        col("click_value"))
  }

  /** Per-user session aggregation via flatMapGroupsWithState: a session
    * closes after `gapMinutes` of event-time inactivity. Custom state —
    * the KeyValueGroupedDataset state-store path the blueprint names. */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def flush(uid: Long, st: SessionState): Session =
      Session(uid, st.start, st.last, st.n, st.total)

    events
      .withWatermark("ts_us", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(uid, _)).iterator
            state.remove()
            out
          } else {
            var closed = List.empty[Session]
            var st = state.getOption.orNull
            rows.toSeq.sortBy(_.ts_us.getTime).foreach { e =>
              val t = e.ts_us.getTime // ms since epoch
              val tUs = t * 1000L
              st match {
                case null =>
                  st = SessionState(tUs, tUs, 1, e.value)
                case s if tUs - s.last > gapUs =>
                  closed ::= flush(uid, s)
                  st = SessionState(tUs, tUs, 1, e.value)
                case s =>
                  st = SessionState(s.start, tUs, s.n + 1, s.total + e.value)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.last / 1000L + gapMinutes * 60000L)
            closed.reverseIterator
          }
      }
  }
}
