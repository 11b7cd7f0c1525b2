package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SideTable

/** Contract of the persisted-artifact registry behind q67/q69: an
  * artifact is built exactly once per (session, name, key), its path is
  * content-determined, and distinct keys get distinct artifacts. */
class SideTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sidetable")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ensure() builds once per key, reuses within the session") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    def build = {
      builds.incrementAndGet()
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val p1 = SideTable.ensure(spark, "spec_probe", "k1")(build)
    val p2 = SideTable.ensure(spark, "spec_probe", "k1")(build)
    assert(p1 === p2)
    assert(builds.get() === 1, "second ensure() re-built the artifact")
    assert(spark.read.parquet(p1).count() === 2)
    // a different key is a different artifact, built separately
    val p3 = SideTable.ensure(spark, "spec_probe", "k2")(build)
    assert(p3 !== p1)
    assert(builds.get() === 2)
  }

  test("paths are content-determined and respect graft.artifacts.dir") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-artifacts").toFile.getAbsolutePath
    spark.conf.set("graft.artifacts.dir", root)
    try {
      val p = SideTable.ensure(spark, "spec_rooted", "k1") {
        Seq((1L, "a")).toDF("id", "v")
      }
      assert(p.startsWith(root), s"artifact $p not under $root")
      assert(new java.io.File(p).exists())
    } finally spark.conf.unset("graft.artifacts.dir")
  }
}
