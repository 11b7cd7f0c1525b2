package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PerfLogger

/** The perf protocol the reference's benchmark harness regex-scrapes
  * (conecta-benchmark/benchmark.py:149-155): named checkpoints, a
  * `peak_mem_usage:` line, and a `Finished loading data` line — asserted
  * against a real job so the scraped format cannot silently drift. */
class PerfLoggerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-perf-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("emits the reference harness's scraped metric lines") {
    val pl = PerfLogger.install(spark)
    spark.range(0, 100000).selectExpr("sum(id)").collect()
    pl.checkpoint("load")
    spark.range(0, 1000).groupBy().count().collect()
    pl.checkpoint("aggregate")
    pl.finish()
    val lines = pl.lines
    assert(lines.exists(_.matches("""perf: checkpoint 'load' \+\d+\.\d{6} s""")))
    assert(lines.exists(_.matches("""perf: checkpoint 'aggregate' \+\d+\.\d{6} s""")))
    assert(lines.exists(_.matches("""peak_mem_usage: \d+\.\d{6} MB""")))
    assert(lines.exists(_.matches("""input: \d+ records, \d+ bytes""")))
    assert(lines.exists(_.matches("""Finished loading data in \d+\.\d{6} s""")))
    // checkpoints measure disjoint spans: total >= each checkpoint
    val total = lines.find(_.startsWith("Finished")).get
      .split(" in ")(1).dropRight(2).toDouble
    val cps = lines.filter(_.startsWith("perf: checkpoint"))
      .map(_.split("\\+")(1).dropRight(2).toDouble)
    assert(cps.forall(_ <= total))
  }
}
