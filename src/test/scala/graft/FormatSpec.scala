package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sink/format round-trips (SURVEY.md §2.2 "Sinks / formats"): the engine
  * writes and re-reads every bundled columnar/row format with schema and
  * values intact. */
class FormatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-format-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sample() = {
    val src = Graft.parquetSource(spark, "/root/testdata/sf0.001")
    src.table("orders").limit(500)
  }

  private def roundTrip(fmt: String): Unit = {
    val df = sample()
    val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/out"
    df.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    assert(back.count() == df.count(), s"$fmt row count")
    // key column survives with values intact
    val a = df.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = back.select("o_orderkey")
      .collect().map(_.get(0).toString.toLong).sorted
    assert(a.sameElements(b), s"$fmt o_orderkey values")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(roundTrip("csv"))

  test("avro is not bundled — csv/json/orc/parquet are the format surface") {
    // document the boundary: spark-avro is an external module
    val err = intercept[Exception] {
      sample().write.format("avro").mode("overwrite")
        .save(Files.createTempDirectory("graft-avro").toString + "/out")
    }
    assert(err.getMessage.toLowerCase.contains("avro"))
  }
}
