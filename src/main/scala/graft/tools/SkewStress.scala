package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-stress harness — measures the engine's hot-key behavior with an
  * ENGINEERED skew instead of arguing it: one domain owns 50% of the
  * corpus, one paragraph repeats in 20% of documents (the SCALE.md skew
  * table's generator). For each op it reports the isolated wall-clock
  * median of 3 plus the max-task-time / median-task-time ratio from a
  * task listener — the number that says whether one straggler task owns
  * the stage (the 100 TB failure mode a quiet average hides).
  *
  * Usage: run_main.sh graft.tools.SkewStress [sfDir]
  * (defaults to /root/testdata/sf0.01; writes the skewed corpus under
  * /tmp/graft_skew, prints one markdown table + one JSON line.)
  */
object SkewStress {

  /** Collects successful-task durations per stage; the skew signal is
    * the WORST WITHIN-STAGE max/median ratio over non-trivial stages —
    * pooling tasks across stages would compare a scan task to a
    * metadata task and call the difference "skew". */
  private[tools] final class TaskSkew extends SparkListener {
    private val buf =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskInfo != null && t.taskInfo.successful)
        buf += ((t.stageId, t.taskInfo.duration))
    }
    def reset(): Unit = synchronized { buf.clear() }
    /** (nTasks, maxMs, medOfWorstStage, worstStageRatio): worst ratio
      * over stages with >= 8 tasks and a >= 20 ms median (below that,
      * constant per-task overhead variance dominates and the ratio
      * measures noise, not data skew). Falls back to the all-task pool
      * when no stage qualifies. */
    def stats(): (Int, Long, Long, Double) = synchronized {
      if (buf.isEmpty) return (0, 0L, 0L, 0.0)
      def ratioOf(ds: Seq[Long]): (Long, Long, Double) = {
        val s = ds.sorted
        val med = s(s.length / 2).max(1L)
        (s.last, med, s.last.toDouble / med)
      }
      val byStage = buf.groupBy(_._1).values.map(_.map(_._2).toSeq)
        .filter(ds => ds.length >= 8 && ds.sorted.apply(ds.length / 2) >= 20)
      val pool = if (byStage.nonEmpty) byStage else Seq(buf.map(_._2).toSeq)
      val worst = pool.map(ratioOf).maxBy(_._3)
      (buf.length, worst._1, worst._2, worst._3)
    }
    /** Top `n` stages by within-stage max/median — the drill-down
      * behind [[stats]]'s single worst ratio: (stageId, tasks, maxMs,
      * medMs, ratio), worst first. Same ≥ 8-task / ≥ 20 ms-median
      * gate. */
    def worstStages(n: Int): Seq[(Int, Int, Long, Long, Double)] =
      synchronized {
        buf.groupBy(_._1).toSeq.map { case (sid, ds0) =>
          val ds = ds0.map(_._2).toSeq.sorted
          val med = ds(ds.length / 2).max(1L)
          (sid, ds.length, ds.last, med, ds.last.toDouble / med)
        }.filter(t => t._2 >= 8 && t._4 >= 20)
          .sortBy(-_._5).take(n)
      }
  }

  /** The engineered corpus: 50% of rows on one domain, one fixed
    * paragraph appended to 20% of documents (also making those docs
    * near-dup candidates sharing hot shingles/LSH buckets). */
  private def skewed(docs: DataFrame): DataFrame = {
    val hotPara = (1 to 40).map(i => s"hotword$i").mkString(" ")
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit("\n"), lit(hotPara)))
        .otherwise(col("text")).as("text"),
      col("lang"),
      when(col("doc_id") % 2 === 0, lit("hot.example.com"))
        .otherwise(col("source")).as("source"),
      col("n_chars"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskSkew
    spark.sparkContext.addSparkListener(listener)

    val out = "/tmp/graft_skew"
    skewed(spark.read.parquet(s"$sfDir/documents.parquet"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val plain = spark.read.parquet(s"$sfDir/documents.parquet")

    def fn3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // one warm pass, then 3 timed isolated reps; skew stats from the
    // LAST rep (steady state, no first-touch compilation tasks)
    def measure(name: String, mk: () => DataFrame)
        : (String, Double, Int, Long, Long, Double) = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val el = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        el
      }
      run() // warm
      val a = run(); val b = run()
      // the listener bus delivers asynchronously: drain rep b's
      // in-flight task-end events BEFORE reset (else they land in rep
      // c's window), and drain rep c's own tail before reading
      // (listenerBus.waitUntilEmpty is private API)
      Thread.sleep(700)
      listener.reset()
      val c = run()
      Thread.sleep(700)
      val (n, mx, med, ratio) = listener.stats()
      val wall = Seq(a, b, c).sorted.apply(1)
      (name, wall, n, mx, med, ratio)
    }

    val cases: Seq[(String, () => DataFrame)] = Seq(
      ("dedup_cascade",
        () => graft.ops.Dedup.cascade(docs)),
      ("para_dedup",
        () => graft.ops.Dedup.paraDedup(docs)),
      ("cap_per_key",
        () => graft.ops.Curate.capPerKey(docs, 10, "source")),
      ("bm25",
        () => graft.ops.Retrieval.bm25(docs,
          docs.where(col("doc_id") < 20), k = 10, excludeSelf = true)),
      ("dedup_cascade_plain",
        () => graft.ops.Dedup.cascade(plain)),
      ("para_dedup_plain",
        () => graft.ops.Dedup.paraDedup(plain)),
      ("cap_per_key_plain",
        () => graft.ops.Curate.capPerKey(plain, 10, "source")),
      ("bm25_plain",
        () => graft.ops.Retrieval.bm25(plain,
          plain.where(col("doc_id") < 20), k = 10, excludeSelf = true)))

    val rows = cases.map { case (name, mk) => measure(name, mk) }

    println(s"\nSkew stress @ $sfDir (hot domain 50%, hot paragraph 20%)")
    println("| op | wall med s | tasks | max task ms | med task ms | max/med |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (n, w, t, mx, med, r) =>
      println(s"| $n | ${fn3(w)} | $t | $mx | $med | ${fn3(r)} |")
    }
    val json = rows.map { case (n, w, t, mx, med, r) =>
      s""""$n":{"wall":${fn3(w)},"tasks":$t,"max_ms":$mx,""" +
        s""""med_ms":$med,"ratio":${fn3(r)}}"""
    }.mkString("{", ",", "}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(s"""{"metric":"skew_stress","sf":"$sfDir","cases":$json}""")
  }
}
