package graft.tools

/** Subprocess-isolated benchmark — the reference harness's protocol
  * (each case timed in a FRESH process:
  * conecta-benchmark/benchmark.py:209-217) as a graft main: every
  * selected query runs in its own forked JVM via the in-process
  * [[graft.Bench]] single-query mode, so no memo, code-cache, page
  * warm-up, ContextCleaner backlog, or GC state crosses query
  * boundaries. This is the ADJUDICATION protocol for cross-round
  * per-query drift (the r16 suspect bisect ran exactly this shape by
  * hand): suite-context effects — which query pays a shared
  * artifact/warm-up cost — are the dominant term in in-suite
  * cross-round deltas (measured r16: the full suite's q111 records
  * 24.6 s in r14's suite but isolates at 34.7 s on the SAME code),
  * and fresh-process timings remove them by construction.
  *
  * NOT the per-round default: a fresh JVM pays ~10–20 s of
  * startup+JIT per query (the reference pays the same per case), so
  * the full 201-query suite would take hours; run it on the handful
  * of queries under adjudication.
  *
  * Usage: run_main.sh graft.tools.IsolatedBench <sfDir> <query>...
  * Env passthrough: SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS. Output: one
  * JSON line {"metric":"isolated","queries":{q:sec,...},"errs":N}.
  */
object IsolatedBench {

  /** The child-result protocol: read the bench JSON artifact the child
    * wrote at `SPARK_GRAFT_OUT` and extract this query's seconds from
    * its "queries" object (first `"<q>":<num>` occurrence — the
    * "queries" map precedes "reps_detail" in [[graft.Bench]]'s
    * artifact, whose nested per-rep object can never match the
    * numeric-literal form). None when the file is missing (child
    * crashed before writing) or the query key is absent. */
  private[graft] def parseQuerySec(outPath: java.nio.file.Path,
      q: String): Option[Double] =
    if (!java.nio.file.Files.exists(outPath)) None
    else {
      val json = new String(
        java.nio.file.Files.readAllBytes(outPath), "UTF-8")
      ("\"" + java.util.regex.Pattern.quote(q) + "\":([0-9.]+)").r
        .findFirstMatchIn(json).map(_.group(1).toDouble)
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IsolatedBench <sfDir> <query> [query ...]")
    val sfDir = args.head
    val queries = args.drop(1).toSeq
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    var errs = 0
    val results = queries.map { q =>
      val cmd = (Seq(javaBin) ++ opens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-Xmx" + sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"),
        "-XX:ReservedCodeCacheSize=1g",
        "-cp", cp, "graft.Bench", q)).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      // the child must NEVER write round-slot artifacts (it is a
      // subset run, which Bench already refuses, but belt+braces:
      // unset the round marker and point the /tmp artifact elsewhere)
      pb.environment().remove("SPARK_GRAFT_ROUND")
      val outPath = java.nio.file.Paths.get(s"/tmp/graft_isolated_$q.json")
      java.nio.file.Files.deleteIfExists(outPath)
      pb.environment().put("SPARK_GRAFT_OUT", outPath.toString)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      // drain BOTH pipes on threads so the child can't block on a full
      // pipe — neither stream is parsed; adjudication numbers come from
      // the SPARK_GRAFT_OUT artifact the child writes, which interleaved
      // logging can never corrupt (the old last-stdout-line protocol
      // could)
      def drain(is: java.io.InputStream): Thread = {
        val t = new Thread(() => {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(is))
          try { while (br.readLine() != null) () }
          catch { case _: Exception => () }
        })
        t.setDaemon(true); t.start(); t
      }
      drain(proc.getErrorStream); drain(proc.getInputStream)
      val code = proc.waitFor()
      val sec = parseQuerySec(outPath, q)
      System.err.println(s"[isolated] $q -> " +
        sec.map(f).getOrElse(s"ERR(exit=$code)"))
      if (sec.isEmpty) errs += 1
      q -> sec
    }
    val qs = results.map { case (q, s) =>
      "\"" + q + "\":" + s.map(f).getOrElse("\"err\"")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"isolated","queries":$qs,"errs":$errs,"sf":"$sfDir"}""")
  }
}
