package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep probe — times selected flagship chains on an arbitrary
  * corpus dir (the `make_sfx.py` 10×/100× tilings) with the
  * [[SkewStress.TaskSkew]] within-stage straggler ratio attached: the
  * SCALE.md decade/century rows come from here. Reports per case the
  * isolated wall-clock median of 3 warm reps plus the worst
  * within-stage max/median task-time ratio of the last rep — the
  * number that says whether one straggler task owns a stage at scale.
  *
  * Usage: run_main.sh graft.tools.ScaleProbe <dir> [case ...]
  * cases: cascade bm25 wordvec:<topV> (default: cascade bm25)
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted =
      if (args.length > 1) args.drop(1).toSeq else Seq("cascade", "bm25")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SkewStress.TaskSkew
    spark.sparkContext.addSparkListener(listener)

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def mkCase(spec: String): (String, () => DataFrame) = spec match {
      case "cascade" =>
        ("cascade", () => graft.ops.Dedup.cascade(docs))
      case "bm25" =>
        ("bm25", () => graft.ops.Retrieval.bm25(docs,
          docs.where(col("doc_id") < 20), k = 10, excludeSelf = true))
      case "contam" =>
        ("contam", () => {
          val w = org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(col("text")), "\\s+")
          val bench = docs.where(col("doc_id") < 20 &&
            col("text").isNotNull)
            .select(col("doc_id").as("bench_id"),
              when(col("doc_id") % 2 === 1,
                concat_ws(" ", reverse(w)))
                .otherwise(col("text")).as("text"))
          graft.ops.Dedup.contamination(docs, bench, k = 13)
        })
      case "lsh" =>
        ("lsh", () => {
          val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          graft.ops.Embed.lshTopK(emb, emb.where(col("vec_id") < 20),
            k = 10, bits = 8, excludeSelf = true)
        })
      case s if s.startsWith("wordvec:") =>
        val topV = s.stripPrefix("wordvec:").toInt
        (s, () => {
          val pt = graft.queries.WordVectors.pairTokens(docs)
          val vocab = graft.ops.Text.vocabFrame(pt, topV)
            .localCheckpoint()
          graft.ops.Text.wordVectorsFromCooc(vocab,
            graft.ops.Text.coocFrame(pt, vocab), k = 3)
        })
      case s if s.startsWith("wordvec3:") =>
        // trigram tokens: the synthetic corpus's bigram universe tops
        // out near 1k distinct, so the >4096-vocabulary runs (the
        // implicit-Gram pcaFromFrameLargeV path) widen tokens to
        // trigrams (~27k distinct at sf0.1) — same chain otherwise
        val topV = s.stripPrefix("wordvec3:").toInt
        (s, () => {
          val w = graft.functions.TextFunctions.words(col("text"))
          val pt = docs.where(col("text").isNotNull &&
              length(trim(col("text"))) > 0 && size(w) >= 3)
            .select(col("doc_id"),
              concat_ws(" ", zip_with(
                zip_with(
                  slice(w, lit(1), size(w) - 2),
                  slice(w, lit(2), size(w) - 2),
                  (a, b) => concat(a, lit("_"), b)),
                slice(w, lit(3), size(w) - 2),
                (ab, c) => concat(ab, lit("_"), c))).as("text"))
          val vocab = graft.ops.Text.vocabFrame(pt, topV)
            .localCheckpoint()
          graft.ops.Text.wordVectorsFromCooc(vocab,
            graft.ops.Text.coocFrame(pt, vocab), k = 3)
        })
      case "contamaudit" =>
        ("contamaudit", () => {
          val w = org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(col("text")), "\\s+")
          val bench = docs.where(col("doc_id") < 20 &&
            col("text").isNotNull)
            .select(col("doc_id").as("bench_id"),
              when(col("doc_id") % 2 === 1,
                concat_ws(" ", reverse(w)))
                .otherwise(col("text")).as("text"))
          graft.ops.Dedup.contaminationAudit(docs, bench, k = 5,
            topN = 3)
        })
      case "wordpiece" =>
        ("wordpiece", () => {
          val merges = graft.ops.Text.wordpieceVocab(docs, 24)
            .orderBy("merge_rank").collect()
            .map(r => (r.getString(1), r.getString(2))).toSeq
          val inv = graft.ops.Text.wordpieceInventory(docs, merges)
            .localCheckpoint()
          graft.ops.Text.wordpieceEncode(docs, inv)
        })
      case "audiopcm" =>
        ("audiopcm", () => {
          val m = graft.functions.Multimodal.audioPcmStats(col("payload"))
          graft.queries.Media.syntheticPcmAudio(docs)
            .select(col("media_id"), m.as("s"))
            .groupBy(col("s.format"))
            .agg(count(lit(1)).as("n"), sum(col("s.c0_sum")).as("c0"))
        })
      case "videometa" =>
        ("videometa", () => {
          val vm = graft.functions.Multimodal.videoMeta(col("payload"))
          graft.queries.Media.syntheticVideo(docs)
            .select(col("media_id"), vm.as("m"))
            .groupBy(col("m.format"))
            .agg(count(lit(1)).as("n"), sum(col("m.duration")).as("dur"))
        })
      case "video" =>
        // q200-shape FRAME DECODE + stats: the engine's most expensive
        // per-byte op (JPEG entropy decode at the imageio codec seam) —
        // exchange-free scan → synthesize → mapPartitions decode, then
        // the container-meta join; sorts excluded (decode is the chain)
        ("video", () => {
          val media = graft.queries.Media.syntheticMjpegVideos(docs)
            .localCheckpoint() // read by the decode AND the meta arm
          val frames = graft.functions.Multimodal.decodeVideoFrames(media)
          val vm = graft.functions.Multimodal.videoMeta(col("payload"))
          val meta = media.select(col("media_id"), vm.as("m"))
            .select(col("media_id"), col("m.brand").as("brand"),
              col("m.duration").as("duration_us"))
          frames.join(meta, Seq("media_id"))
        })
      case "thumb" =>
        // q204-shape thumbnail raster: full image decode + exact
        // integer NN downsample per payload (the perceptual-dedup
        // input surface, q208) — pure scan-riding projection
        ("thumb", () => graft.functions.Multimodal.decodeThumbnails(
          graft.queries.Media.syntheticValidImages(docs), 4, 3))
      case other =>
        sys.error(s"unknown case '$other' " +
          "(cascade|bm25|contam|lsh|wordvec:<topV>|wordpiece|videometa|" +
          "video|thumb)")
    }

    def fn3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // one warm pass, then 3 timed isolated reps; skew stats from the
    // LAST rep (steady state) — the SkewStress measure() protocol
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
      Thread.sleep(700)
      listener.reset()
      val c = run()
      Thread.sleep(700)
      val (n, mx, med, ratio) = listener.stats()
      if (ratio > 3.0) // drill-down: which stages carry the straggler
        listener.worstStages(3).foreach { case (sid, t, m, md, r) =>
          println(f"[skew] stage=$sid tasks=$t max=${m}ms med=${md}ms " +
            f"ratio=$r%.1f") }
      val wall = Seq(a, b, c).sorted.apply(1)
      (name, wall, n, mx, med, ratio)
    }

    val rows = wanted.map(mkCase).map { case (n, mk) => measure(n, mk) }

    println(s"\nScale probe @ $dir")
    println("| case | median s | tasks | worst-stage max ms | med ms | max/med |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (n, w, t, mx, med, r) =>
      println(s"| $n | ${fn3(w)} | $t | $mx | $med | ${fn3(r)} |") }
    val json = rows.map { case (n, w, _, _, _, r) =>
      s""""$n":{"sec":${fn3(w)},"skew":${fn3(r)}}""" }
      .mkString("{", ",", "}")
    // Round artifact (SCALE_rNN.json beside BENCH_rNN): when
    // SPARK_GRAFT_ROUND is set, persist the run so scale regressions
    // are caught by diffing artifacts, not re-reading prose. SCALE.md
    // rule: a >1.5x regression of any chain's decade wall vs the
    // previous round's artifact is a round blocker.
    sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).foreach { rnd =>
      val f = new java.io.File(
        new java.io.File(".").getCanonicalFile,
        f"SCALE_r$rnd%02d.json")
      val body = s"""{"dir":"$dir","cases":$json}""" + "\n"
      try {
        // merge with an existing same-round artifact (the five chains
        // may be probed across several invocations)
        val merged =
          if (f.isFile) {
            val prev = java.nio.file.Files.readString(f.toPath).trim
            val prevCases = prev.indexOf("\"cases\":{")
            if (prevCases >= 0 && prev.endsWith("}}")) {
              val inner = prev.substring(prevCases + 9, prev.length - 2)
              val add = json.substring(1, json.length - 1)
              s"""{"dir":"$dir","cases":{$inner,$add}}""" + "\n"
            } else body
          } else body
        java.nio.file.Files.write(f.toPath, merged.getBytes("UTF-8"))
      } catch { case e: Exception =>
        System.err.println(s"[probe] WARN: could not write $f: $e") }
    }
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(json)
  }
}
