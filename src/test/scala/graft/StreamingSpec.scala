package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Structured Streaming tests: the same transforms that pass the batch
  * oracle (q18) run incrementally over a MemoryStream, with watermarks
  * and custom session state. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("hourly windowed agg: stream result == batch result on same data") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), "click", 1.0), (2L, ts(10), "click", 2.0),
      (3L, ts(20), "view", 3.0), (4L, ts(59), "click", 4.0))
      .toDF("event_id", "ts_us", "user_id_x", "value")
      .withColumnRenamed("user_id_x", "event_type_x")
    // build with proper column names: ts (nanos long) like the real table
    val raw = Seq(
      (1L, ts(0).getTime * 1000000L, 10L, "click", 1.0),
      (2L, ts(10).getTime * 1000000L, 11L, "click", 2.0),
      (3L, ts(20).getTime * 1000000L, 12L, "view", 3.0),
      (4L, ts(59).getTime * 1000000L, 10L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    val batch = EventStreams.hourlyCounts(raw)
      .orderBy("hour_ts", "event_type").collect()
    assert(batch.length == 2)
    val click = batch.find(_.getString(1) == "click").get
    assert(click.getLong(2) == 3 && click.getDouble(3) == 7.0)

    // same transform, incrementally
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.hourlyCounts(streamDf)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts(0).getTime * 1000000L, 10L, "click", 1.0),
        (2L, ts(10).getTime * 1000000L, 11L, "click", 2.0),
        (3L, ts(20).getTime * 1000000L, 12L, "view", 3.0),
        (4L, ts(59).getTime * 1000000L, 10L, "click", 4.0))
      q.processAllAvailable()
      // advance the watermark past the window so append emits it
      ms.addData((5L, Timestamp.valueOf("2026-01-01 13:00:00").getTime * 1000000L,
        10L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("hourly").orderBy("hour_ts", "event_type").collect()
      assert(got.length == 2)
      val sClick = got.find(_.getString(1) == "click").get
      assert(sClick.getLong(2) == 3 && sClick.getDouble(3) == 7.0)
    } finally q.stop()
  }

  test("file stream source: events parquet processed incrementally") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    assert(stream.isStreaming)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_hourly")
      assert(got.count() > 0)
      // stream aggregate == batch aggregate over the same file
      val batchN = EventStreams.hourlyCounts(
        spark.read.parquet(dir.toString))
        .agg(sum("n")).collect().head.getLong(0)
      val streamN = got.agg(sum("n")).collect().head.getLong(0)
      assert(streamN == batchN)
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, state flushes on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.sessionize(ms.toDS(), gapMinutes = 10)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:05 (one session), then 10:30 (new one)
      ms.addData(
        Event(ts(0), 1L, "click", 1.0),
        Event(ts(5), 1L, "click", 2.0),
        Event(ts(30), 1L, "view", 3.0))
      q.processAllAvailable()
      // push watermark far ahead → all sessions time out and flush
      ms.addData(Event(Timestamp.valueOf("2026-01-01 12:00:00"), 99L, "x", 0.0))
      q.processAllAvailable()
      ms.addData(Event(Timestamp.valueOf("2026-01-01 14:00:00"), 98L, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect()
        .filter(_.user_id == 1L).sortBy(_.start_us)
      assert(got.length == 2)
      assert(got(0).n_events == 2 && got(0).total_value == 3.0)
      assert(got(1).n_events == 1 && got(1).total_value == 3.0)
    } finally q.stop()
  }

  test("stream-stream join: purchases attribute to in-window clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def df(ms: MemoryStream[(Long, Long, Long, String, Double)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val pms = MemoryStream[(Long, Long, Long, String, Double)]
    val cms = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventStreams.attributedPurchases(df(pms), df(cms), 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      def ns(minute: Int): Long = ts(minute).getTime * 1000000L
      // user 10: clicks at 10:00 and 10:05, purchase at 10:20 → both in
      // window; click at 10:50 is AFTER the purchase → no match
      cms.addData((1L, ns(0), 10L, "click", 1.0), (2L, ns(5), 10L, "click", 2.0),
        (3L, ns(50), 10L, "click", 9.0))
      pms.addData((4L, ns(20), 10L, "purchase", 50.0))
      q.processAllAvailable()
      // advance both watermarks so results flush from state
      cms.addData((5L, Timestamp.valueOf("2026-01-01 13:00:00").getTime * 1000000L,
        99L, "click", 0.0))
      pms.addData((6L, Timestamp.valueOf("2026-01-01 13:00:00").getTime * 1000000L,
        99L, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("attrib").collect()
        .filter(_.getLong(1) == 10L)
      assert(got.length == 2) // the two in-window clicks, not the later one
      assert(got.map(_.getDouble(4)).sorted.toSeq == Seq(1.0, 2.0))
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.dedupedWithinWatermark(
        streamDf, Seq("user_id", "event_type"), "30 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      // (10,click) arrives 3×, (11,view) once — within one watermark span
      ms.addData(
        (1L, ts(0).getTime * 1000000L, 10L, "click", 1.0),
        (2L, ts(1).getTime * 1000000L, 10L, "click", 1.0),
        (3L, ts(2).getTime * 1000000L, 11L, "view", 2.0))
      q.processAllAvailable()
      ms.addData((4L, ts(3).getTime * 1000000L, 10L, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("deduped").collect()
      assert(got.length == 2) // one (10,click) + one (11,view)
      // advance the watermark past (10,click)'s eviction point with an
      // unrelated key (the watermark only moves at end-of-batch) …
      ms.addData((5L, Timestamp.valueOf("2026-01-01 12:00:00").getTime * 1000000L,
        98L, "x", 0.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 3)
      // … then the same key is accepted again: its state was evicted
      // (bounded-state semantics, not exact-forever)
      ms.addData((6L, Timestamp.valueOf("2026-01-01 12:05:00").getTime * 1000000L,
        10L, "click", 9.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 4)
    } finally q.stop()
  }

  test("state is BOUNDED: watermark eviction keeps dedup state flat " +
      "across epochs (the 100 TB streaming contract)") {
    // Correctness rows prove WHAT the watermarked ops emit; this pins
    // that their state does not grow with stream history — the property
    // that makes exact streaming dedup feasible at all at 100 TB/day.
    // 10 epochs, 5 FRESH keys each, 1 h apart with a 30 min delay: if
    // eviction never ran, epoch 10 would hold all 50 keys.
    // (q76's crawl loop is stateless by design — its state is the
    // persisted SideTable artifact, pinned by the manifest-growth test.)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.dedupedWithinWatermark(
        streamDf, Seq("user_id", "event_type"), "30 minutes")
      .writeStream.format("memory").queryName("bounded_dedup")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      var eid = 0L
      val stateSizes = (1 to 10).map { e =>
        val tNanos = (base + e * 3600L * 1000L) * 1000000L
        ms.addData((0 until 5).map { k =>
          eid += 1
          (eid, tNanos + k * 1000000000L, (e * 10 + k).toLong, "click", 1.0)
        }: _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      // every event was unique → all pass through
      assert(spark.table("bounded_dedup").count() === 50)
      // flat, bounded state: at most the current epoch's keys plus the
      // not-yet-evicted previous epoch (eviction runs on the NEXT
      // batch's watermark) — never the 50-key history
      assert(stateSizes.last <= 10,
        s"state grew with stream history: $stateSizes")
      assert(stateSizes.drop(1).max <= 10,
        s"state not bounded by the watermark horizon: $stateSizes")
    } finally q.stop()
  }

  test("state is BOUNDED: closed windows leave the windowed-agg state " +
      "once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.hourlyCounts(streamDf)
      .writeStream.format("memory").queryName("bounded_hourly")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val stateSizes = (1 to 10).map { e =>
        // one fresh hour-window per epoch, epochs 3 h apart — far past
        // the 1 h watermark, so each epoch's window closes and evicts
        val tNanos = (base + e * 3L * 3600L * 1000L) * 1000000L
        ms.addData((e.toLong, tNanos, 10L, "click", 1.0))
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      // 10 distinct windows entered the stream; state must hold only
      // the open tail (current window + the one awaiting eviction)
      assert(stateSizes.last <= 2,
        s"window state grew with stream history: $stateSizes")
      assert(stateSizes.drop(1).max <= 2,
        s"window state not bounded: $stateSizes")
      // and the closed windows were all emitted downstream
      assert(spark.table("bounded_hourly").count() >= 8)
    } finally q.stop()
  }

  test("state is BOUNDED: the stream-stream attribution join evicts " +
      "both sides once the watermarks pass") {
    // The r14 pins covered watermark dedup and windowed agg; the
    // attribution JOIN holds TWO-sided state (buffered purchases AND
    // buffered clicks) that the watermark must also evict — the
    // remaining unbounded-state risk at 100 TB/day. Same 10-epoch
    // protocol: fresh users each epoch, epochs 3 h apart vs a 30 min
    // join window, both inputs advancing their watermark every epoch.
    // If eviction never ran, epoch 10's state would hold all 10
    // epochs' rows (30 = 10 × (2 clicks + 1 purchase)).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def df(ms: MemoryStream[(Long, Long, Long, String, Double)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val pms = MemoryStream[(Long, Long, Long, String, Double)]
    val cms = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventStreams.attributedPurchases(df(pms), df(cms), 30)
      .writeStream.format("memory").queryName("bounded_attrib")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
      var eid = 0L
      val stateSizes = (1 to 10).map { e =>
        val t0 = (base + e * 3L * 3600L * 1000L) * 1000000L
        val uid = 100L + e
        // two in-window clicks then the purchase, one fresh user/epoch
        cms.addData(
          { eid += 1; (eid, t0, uid, "click", 1.0) },
          { eid += 1; (eid, t0 + 5L * 60L * 1000000000L, uid, "click", 2.0) })
        pms.addData(
          { eid += 1; (eid, t0 + 10L * 60L * 1000000000L, uid,
            "purchase", 50.0) })
        q.processAllAvailable()
        q.lastProgress.stateOperators
          .find(_.operatorName.contains("symmetricHashJoin"))
          .getOrElse(q.lastProgress.stateOperators.head).numRowsTotal
      }
      // every purchase matched both of its user's clicks
      assert(spark.table("bounded_attrib").count() === 20)
      // two-sided state stays bounded by the watermark horizon: at most
      // the current epoch's 3 rows plus the not-yet-evicted previous
      // epoch (eviction runs on the NEXT batch's watermark) — never the
      // 30-row history
      assert(stateSizes.last <= 6,
        s"join state grew with stream history: $stateSizes")
      assert(stateSizes.drop(1).max <= 6,
        s"join state not bounded by the watermark horizon: $stateSizes")
    } finally q.stop()
  }

  test("q76: micro-batched crawl loop == one-shot incremental dedup") {
    // Corpus: ids 0..14 are the old corpus (cut = 19*4 div 5 = 15),
    // ids 15..19 the crawl batch, streamed in micro-batches of ≤2
    // ([15,16], [17,18], [19]). Doc 16 duplicates old doc 3 (found via
    // the ARTIFACT), doc 19 duplicates doc 15 — a pair whose members
    // arrive in DIFFERENT micro-batches, findable only if the loop
    // carries earlier batches' bands forward (the accumulated-state /
    // artifact-append semantics). Both answers must coincide exactly.
    import spark.implicits._
    import graft.queries.TextPipeline
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q76").toFile.getAbsolutePath
    def words(tag: String) =
      (0 until 12).map(i => s"$tag$i").mkString(" ")
    val docs = (0L until 20L).map {
      case 16L => 16L -> words("old3x")   // dup of doc 3
      case 19L => 19L -> words("batch15") // dup of doc 15
      case 15L => 15L -> words("batch15")
      case 3L  => 3L -> words("old3x")
      case i   => i -> words(s"filler${i}u")
    }
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val oneShot = TextPipeline.defs("q67_incremental_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = TextPipeline.defs("q76_stream_incremental_dedup")(
        spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === oneShot)
    assert(streamed.contains((3L, 16L, 1.0d)), "artifact pair missed")
    assert(streamed.contains((15L, 19L, 1.0d)),
      "cross-micro-batch pair missed — earlier bands not carried forward")
  }

  test("q76: accumulated state is the side-table artifact, growing per epoch") {
    // The crawl loop's state transition must be SideTable.append — so
    // the per-epoch plan reads ONE artifact scan and stays constant-size
    // in epoch count — not the r8 in-session union chain (whose plan
    // grew linearly). Pinned via the post-append manifest row counts: at
    // 8 epochs over sf0.001 every epoch's append must strictly grow the
    // artifact. A rerun must start over from the pre-stream seed (the
    // transient-refresh idempotence contract): identical answer,
    // identical growth trajectory — NOT a second accumulation on top.
    import graft.queries.TextPipeline
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("graft.stream.epochs", "8")
    try {
      def run() = TextPipeline.defs("q76_stream_incremental_dedup")(
          spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val first = run()
      val rows1 = TextPipeline.streamSeenRows.get()
      assert(rows1.length === 8, s"expected 8 epochs, saw ${rows1.length}")
      assert(rows1.zip(rows1.tail).forall { case (a, b) => a < b },
        s"artifact did not grow every epoch: $rows1")
      val second = run()
      val rows2 = TextPipeline.streamSeenRows.get()
      assert(rows2 === rows1,
        "rerun did not restart from the pre-stream artifact")
      assert(second === first)
      // and the streamed answer still equals the one-shot q67 pair set
      val oneShot = TextPipeline.defs("q67_incremental_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(first === oneShot)
    } finally spark.conf.unset("graft.stream.epochs")
  }

  test("q59 oracle precondition: event_id is unique at every shipped SF") {
    // q59's DuckDB oracle is `SELECT ... FROM events` — equivalent to the
    // batch dropDuplicates over the replayed stream ONLY while event_id is
    // unique in the source table. If the driver ever ships testdata with
    // duplicate event_ids, this fails before the oracle mismatch would.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val ev = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
      val total = ev.count()
      val distinctIds = ev.select("event_id").distinct().count()
      assert(total === distinctIds,
        s"$sf: ${total - distinctIds} duplicate event_id rows break q59's oracle equivalence")
    }
  }

  test("eventTime: long-nanos, NTZ, and timestamp inputs agree on the instant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    // the same instant three ways, matching the three testdata eras:
    // long nanos (nanosAsLong era), TIMESTAMP_NTZ (parquet timestamp[us],
    // round 9+), and plain TimestampType
    val instant = Timestamp.valueOf("2026-03-05 07:30:15.123456")
    val us = instant.getTime * 1000L + 456 // .123456 → µs component
    val asLong = Seq((1L, us * 1000L)).toDF("event_id", "ts")
    val asTs = Seq((1L, instant)).toDF("event_id", "ts")
    val asNtz = asTs.withColumn("ts", expr("cast(ts as timestamp_ntz)"))
    val got = Seq(asLong, asNtz, asTs).map { df =>
      df.select(unix_micros(EventStreams.eventTime(df)).as("t"),
        EventStreams.eventTimeUs(df).as("t2")).head()
    }
    got.foreach { r =>
      assert(r.getLong(0) === us, "eventTime instant drifted")
      assert(r.getLong(1) === us, "eventTimeUs instant drifted")
    }
    // the real parquet table flows through the same helper
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val n = EventStreams.normalized(ev)
    assert(n.schema("ts_us").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(n.select(col("ts_us")).where(col("ts_us").isNull).count() === 0)
  }
}
