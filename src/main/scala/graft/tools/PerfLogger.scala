package graft.tools

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Perf instrumentation mirroring the reference's perf-logger protocol
  * (conecta-core/src/perf_logger.rs:10-112): named checkpoints plus a
  * `peak_mem_usage:` line and a `Finished loading data` line — the exact
  * strings the reference's benchmark harness regex-scrapes
  * (conecta-benchmark/benchmark.py:149-155).
  *
  * Implementation is a SparkListener + wall-clock checkpoints: task-level
  * peak execution memory and input metrics are aggregated across all
  * executors (accumulator-style, cluster-safe).
  */
final class PerfLogger extends SparkListener {

  private val t0 = new AtomicLong(System.nanoTime())
  private val last = new AtomicLong(System.nanoTime())
  private val peakMem = new AtomicLong(0L)
  private val inputRecords = new AtomicLong(0L)
  private val inputBytes = new AtomicLong(0L)
  private val log = new AtomicReference[List[String]](Nil)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      peakMem.accumulateAndGet(m.peakExecutionMemory, math.max)
      inputRecords.addAndGet(m.inputMetrics.recordsRead)
      inputBytes.addAndGet(m.inputMetrics.bytesRead)
    }
  }

  private def emit(line: String): Unit = {
    log.updateAndGet(line :: _)
    System.err.println(line)
  }

  /** Named checkpoint: seconds since the previous checkpoint —
    * perf_logger.rs checkpoint semantics. */
  def checkpoint(name: String): Unit = {
    val now = System.nanoTime()
    val dt = (now - last.getAndSet(now)) / 1e9
    emit(f"perf: checkpoint '$name' +$dt%.6f s")
  }

  /** Final report in the reference's scraped format. */
  def finish(): Unit = {
    val total = (System.nanoTime() - t0.get()) / 1e9
    emit(f"peak_mem_usage: ${peakMem.get() / 1048576.0}%.6f MB")
    emit(f"input: ${inputRecords.get()} records, ${inputBytes.get()} bytes")
    emit(f"Finished loading data in $total%.6f s")
  }

  def lines: Seq[String] = log.get().reverse
}

object PerfLogger {
  /** Install on a session; caller keeps the handle for checkpoints. */
  def install(spark: SparkSession): PerfLogger = {
    val pl = new PerfLogger
    spark.sparkContext.addSparkListener(pl)
    pl
  }
}
