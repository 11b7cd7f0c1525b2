package graft

import org.scalatest.funsuite.AnyFunSuite

/** The IsolatedBench child-result protocol: adjudication numbers come
  * from the `SPARK_GRAFT_OUT` JSON artifact the forked Bench writes —
  * NOT from the child's stdout — so interleaved logging can never
  * corrupt a cross-round drift verdict. Pins the artifact parse against
  * the exact shape [[graft.Bench]] emits (a "queries" numeric map
  * followed by a "reps_detail" nested-object map sharing the same
  * query keys). */
class IsolatedBenchSpec extends AnyFunSuite {

  private def tmpJson(content: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("graft_isolated_spec", ".json")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p
  }

  test("reads the query's seconds from the child artifact file") {
    val p = tmpJson(
      """{"metric":"total","value":1.234,"unit":"sec",""" +
        """"queries":{"q111_stream_crawl_ingest":1.234},""" +
        """"total_min":1.2,"reps":3,"errs":0,"sf":"/x",""" +
        """"reps_detail":{"q111_stream_crawl_ingest":{"t":[1.3,1.234],"rd":[0]}}}""")
    assert(graft.tools.IsolatedBench
      .parseQuerySec(p, "q111_stream_crawl_ingest") === Some(1.234))
  }

  test("nested reps_detail objects never satisfy the numeric form") {
    // a pathological artifact where the queries map is ABSENT: the
    // reps_detail entry for the same key must not parse as a number
    val p = tmpJson(
      """{"metric":"total","reps_detail":{"q01_full_scan":{"t":[0.5]}}}""")
    assert(graft.tools.IsolatedBench.parseQuerySec(p, "q01_full_scan").isEmpty)
  }

  test("missing artifact (child crashed before writing) is None, not a throw") {
    val p = java.nio.file.Paths.get("/tmp/graft_isolated_spec_never_written.json")
    java.nio.file.Files.deleteIfExists(p)
    assert(graft.tools.IsolatedBench.parseQuerySec(p, "q01_full_scan").isEmpty)
  }

  test("regex-metacharacter query names are quoted, not interpreted") {
    val p = tmpJson("""{"queries":{"q1.x":7.5,"q1ax":9.9}}""")
    // an unquoted '.' would match "q1ax" too; Pattern.quote pins the literal
    assert(graft.tools.IsolatedBench.parseQuerySec(p, "q1ax") === Some(9.9))
    assert(graft.tools.IsolatedBench.parseQuerySec(p, "q1.x") === Some(7.5))
  }
}
