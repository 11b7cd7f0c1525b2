package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusQuality, TextPipeline}

/** Behavior tests for the corpus-quality operators (q61–q64): signal
  * direction on constructed corpora, an INDEPENDENT JVM re-derivation of
  * the q63 distributed prefix sum, and the containment-specific guard
  * semantics (df-ceiling blocking, subset detection Jaccard misses). */
class CorpusQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpus-quality")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cq").toFile.getAbsolutePath
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q61: common-token text outscores rare-token gibberish") {
    // doc 0+1 share every token (corpus counts high); doc 2 is all
    // singletons (every count 1 → bit-length 0 → mean_bits 0)
    val dir = corpus(Seq(
      "alpha beta gamma delta alpha beta",
      "alpha beta gamma delta gamma delta",
      "unique1 unique2 unique3 unique4"))
    val rows = CorpusQuality.defs("q61_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // every doc-0/1 token has corpus count 3 (floor(log2) = 1 bit) while
    // doc 2's singletons all quantize to 0 bits
    assert(rows(2L) === 0.0d)
    assert(rows(0L) === 1.0d && rows(1L) === 1.0d)
  }

  test("q61: n_tokens equals whitespace word count") {
    val dir = corpus(Seq("a b c d", "x y"))
    val got = CorpusQuality.defs("q61_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 4L, 1L -> 2L))
  }

  test("q63: sharded prefix sum == independent single-threaded cumsum") {
    // Re-derive the kept set with plain JVM code — MessageDigest md5,
    // Regex token count, a sort, and a running total. Any drift in the
    // shard decomposition (offsets, shard order vs hash order, window
    // frame) breaks this equality.
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    val tokRe = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]".r
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ordered = texts
      .map { case (id, t) => (id, tokRe.findAllIn(t).size.toLong, h60(t)) }
      .sortBy { case (id, _, h) => (h, id) }
    var cum = 0L
    val expect = ordered.flatMap { case (id, n, _) =>
      cum += n
      if (cum <= 10000L) Some((id, n, cum)) else None
    }.toSeq
    val got = CorpusQuality.defs("q63_token_budget")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q64: re-crawled content scores zero novelty, fresh content one") {
    val dir = corpus(Seq(
      "the quick brown fox jumps over the lazy dog today",
      "the quick brown fox jumps over the lazy dog today", // re-crawl
      "completely fresh material nobody has ever written before"))
    val rows = CorpusQuality.defs("q64_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(0L) === 1.0d) // first occurrence of every gram
    assert(rows(1L) === 0.0d) // every gram seen in doc 0
    assert(rows(2L) === 1.0d)
  }

  test("q62: detects a short doc contained in a long one (jaccard-blind)") {
    // B is a contiguous 8-word slice of 40-word A: containment
    // |B∩A|/|B| = 1.0 while jaccard is ~4/36 ≈ 0.11 — far below any
    // near-dup threshold. The shared 5-grams have df = 2 (rare), so the
    // pair blocks together.
    val a = (0 until 40).map(i => s"tok$i").mkString(" ")
    val b = (10 until 18).map(i => s"tok$i").mkString(" ")
    val c = (100 until 140).map(i => s"other$i").mkString(" ")
    val dir = corpus(Seq(a, b, c))
    val rows = TextPipeline.defs("q62_containment")(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 0L && rows.head.getLong(1) === 1L)
    assert(rows.head.getDouble(2) === 1.0d)
  }

  test("q62: boilerplate grams above the df ceiling generate no pairs") {
    // Nine distinct docs share one 5-gram prefix (df = 9 > 8): the gram
    // is blocked from candidate generation, and the tails share nothing,
    // so no pairs emerge — the degenerate-key guard, expressed as a df
    // ceiling instead of a bucket cap.
    val dir = corpus((0 until 9).map(i =>
      s"shared boiler plate gram here tail$i word$i extra$i more$i end$i"))
    assert(TextPipeline.defs("q62_containment")(spark, dir).count() === 0)
  }

  test("q65: overlapping docs score high, disjoint docs produce no pair") {
    // a and b share a 40-word run (38 shared shingles at df=2, weight
    // bitlen(8)−bitlen(2)=2 each) plus 5-word unique tails; six disjoint
    // filler docs raise n_docs to 8 so the quantized idf is non-zero
    // (with n_docs=3 the shared features would weigh bitlen(3)−bitlen(2)
    // = 0 and the pair would vanish — the idf floor is corpus-relative).
    // Expected cos = (38·4) / (38·4 + 7·9) ≈ 0.707; no other doc pair
    // shares any feature.
    val shared = (0 until 40).map(i => s"sh$i").mkString(" ")
    val a = shared + " " + (0 until 5).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (0 until 5).map(i => s"b$i").mkString(" ")
    val fillers = (0 until 6).map(f =>
      (0 until 10).map(i => s"f${f}x$i").mkString(" "))
    val dir = corpus(Seq(a, b) ++ fillers)
    val rows = CorpusQuality.defs("q65_tfidf_similarity")(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 0L && rows.head.getLong(1) === 1L)
    val cos = rows.head.getDouble(2)
    assert(cos > 0.5d && cos <= 1.0d)
  }

  test("q65: bulk-duplicated docs are recovered via the group path") {
    // nine identical docs collapse to ONE representative before the df
    // model (df counts distinct contents, so their grams sit at df = 1,
    // below the floor — no candidate work at all), and the 36
    // within-group pairs are reconstructed arithmetically at cos 1.0.
    // Before the collapse these docs pushed every gram to df = 9 > 8,
    // which not only hid the group but suppressed any UNRELATED pair
    // sharing those grams — the r7 recall loss.
    val dir = corpus(Seq.fill(9)((0 until 10).map(i => s"x$i").mkString(" ")))
    val out = CorpusQuality.defs("q65_tfidf_similarity")(spark, dir)
    assert(out.count() === 36)
    assert(out.where(org.apache.spark.sql.functions.col("cos") =!= 1.0d)
      .count() === 0)
  }

  test("q65: a 9x-mirrored doc no longer suppresses unrelated pairs") {
    // a/b share a rare 40-word run; c is mirrored 9 times and ALSO
    // contains that run. Under raw-doc df the shared grams sat at
    // df = 11 > 8 — no candidates, no (a,b) pair. Rep-collapsed, df = 3
    // (a, b, rep-of-c): the run blocks, and all pairs among {a, b, c…}
    // emerge.
    val shared = (0 until 40).map(i => s"sh$i").mkString(" ")
    val a = shared + " " + (0 until 5).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (0 until 5).map(i => s"b$i").mkString(" ")
    val c = shared + " " + (0 until 5).map(i => s"c$i").mkString(" ")
    val fillers = (0 until 6).map(f =>
      (0 until 10).map(i => s"f${f}x$i").mkString(" "))
    val dir = corpus(Seq(a, b) ++ Seq.fill(9)(c) ++ fillers)
    val out = CorpusQuality.defs("q65_tfidf_similarity")(spark, dir)
      .collect()
    // (a,b) + a×9 c-copies + b×9 c-copies + C(9,2) within the c group
    assert(out.length === 1 + 9 + 9 + 36)
    val ab = out.filter(r => r.getLong(0) === 0L && r.getLong(1) === 1L)
    assert(ab.length === 1, "the suppressed unrelated pair must reappear")
  }

  test("q65: leaves no cached tables behind") {
    spark.catalog.clearCache()
    CorpusQuality.defs("q65_tfidf_similarity")(
      spark, "/root/testdata/sf0.001").count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("incremental cut: graft.batch.cut pins the batch boundary") {
    // The shared seam of q67/q69/q72: unset, the data-relative default
    // (top ~20% of doc ids); set, a deployment-pinned crawl boundary.
    import spark.implicits._
    val d = Seq((1L, "a"), (100L, "b")).toDF("doc_id", "text")
    assert(graft.queries.BatchCut.cut(spark, d) === 80L)
    spark.conf.set("graft.batch.cut", "42")
    try assert(graft.queries.BatchCut.cut(spark, d) === 42L)
    finally spark.conf.unset("graft.batch.cut")
  }

  test("q95: incremental report equals q84 at any batch cut") {
    // Counter merging must be batch-boundary-invariant: wherever the
    // snapshot/batch line falls, artifact counters + batch deltas have
    // to reproduce the batch-unaware q84 report bit-for-bit (group reps
    // are minimal ids, so an old doc's dup status can never be changed
    // by a later batch).
    val dir = "/root/testdata/sf0.001"
    val expect = CorpusQuality.defs("q84_source_report")(spark, dir)
      .collect().map(_.toSeq).toSeq
    for (cut <- Seq("10", "37", "49")) {
      spark.conf.set("graft.batch.cut", cut)
      try {
        val got = CorpusQuality
          .defs("q95_incremental_source_report")(spark, dir)
          .collect().map(_.toSeq).toSeq
        assert(got === expect, s"cut=$cut")
      } finally spark.conf.unset("graft.batch.cut")
    }
  }

  test("q100: card totals equal the q84 report's column sums") {
    // The card must never disagree with the operators it summarizes:
    // n_docs / n_dup / n_keep are the q84 per-source report's column
    // sums, and n_sources its row count.
    val dir = "/root/testdata/sf0.001"
    val card = CorpusQuality.defs("q100_dataset_card")(spark, dir)
      .collect()(0)
    val rep = CorpusQuality.defs("q84_source_report")(spark, dir)
      .collect()
    assert(card.getLong(0) === rep.map(_.getLong(1)).sum, "n_docs")
    assert(card.getLong(6) === rep.map(_.getLong(2)).sum, "n_dup")
    assert(card.getLong(7) === rep.map(_.getLong(3)).sum, "n_keep")
    assert(card.getLong(1) === rep.length.toLong, "n_sources")
  }

  test("q101: vocab size is cut-invariant and equals the corpus distinct count") {
    // The artifact path must reproduce the batch-unaware vocabulary at
    // ANY cut: n_old + n_new is the same corpus-wide distinct-term
    // count wherever the snapshot/batch line falls.
    import org.apache.spark.sql.functions.{col, explode}
    val dir = "/root/testdata/sf0.001"
    val expect = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("t"))
      .distinct().count()
    // cut=1 is the adversarial boundary: only doc 0 is "old", so the
    // batch genuinely ADDS terms (14 of 31 at sf0.001) and the
    // anti-join path is exercised with a nonzero answer
    for (cut <- Seq("1", "10", "37", "49")) {
      spark.conf.set("graft.batch.cut", cut)
      try {
        val r = CorpusQuality.defs("q101_incremental_vocab")(spark, dir)
          .collect()(0)
        assert(r.getLong(3) === expect, s"cut=$cut vocab_size")
        assert(r.getLong(0) + r.getLong(2) === expect, s"cut=$cut old+new")
        assert(r.getLong(2) <= r.getLong(1), s"cut=$cut new > batch")
        if (cut == "1") assert(r.getLong(2) > 0,
          "cut=1 should add genuinely new terms")
      } finally spark.conf.unset("graft.batch.cut")
    }
  }

  test("q77: output passes the filter, skips dropped dups, respects the budget") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val out = CorpusQuality.defs("q77_curation_pipeline")(spark, dir)
      .collect()
    assert(out.nonEmpty, "curation pipeline produced an empty mix")
    val keepIds = CorpusQuality.defs("q66_quality_filter")(spark, dir)
      .where(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(r => keepIds(r.getLong(0))),
      "a doc failing the quality filter reached the mix")
    val drops = TextPipeline.qualityDropList(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !drops(r.getLong(0))),
      "a dropped near-dup member reached the mix")
    val cums = out.map(_.getLong(2))
    assert(cums.forall(_ <= 10000L))
    assert(cums.sameElements(cums.sorted), "cumsum not monotone in output order")
  }

  test("q66: every flag fails somewhere and keep is their conjunction") {
    val rows = CorpusQuality.defs("q66_quality_filter")(
        spark, "/root/testdata/sf0.01").collect()
    val keep = rows.map(r => r.getInt(9))
    assert(keep.contains(1) && keep.contains(0), "filter must discriminate")
    rows.foreach { r =>
      val conj = r.getInt(5) * r.getInt(6) * r.getInt(7) * r.getInt(8)
      assert(conj === r.getInt(9), s"keep != conjunction for ${r.getLong(0)}")
    }
  }

  test("q62: bulk-duplicated docs are recovered via the group path") {
    // 100 identical docs + one containing superset doc: df counting
    // DISTINCT contents keeps the shared grams at df = 2 (rep + superset),
    // so the cross pair is found AND the 100·99/2 within-group pairs are
    // reconstructed arithmetically — candidate generation saw ONE rep.
    val base = (0 until 10).map(i => s"dup$i").mkString(" ")
    val sup = base + " plus extra trailing words here"
    val dir = corpus(Seq.fill(100)(base) :+ sup)
    val out = TextPipeline.defs("q62_containment")(spark, dir)
    // 4950 within-group + 100 cross pairs (each dup vs the superset)
    assert(out.count() === 5050L)
    assert(out.where(org.apache.spark.sql.functions.col("cont") =!= 1.0d)
      .count() === 0)
  }

  test("q102: engine BM25 equals a single-threaded reimplementation") {
    // Independent oracle in plain Scala (no Spark, no shared code): md5
    // hash60, 3-gram shingles, integer-ratio BM25 with BigInt floor
    // division, (score DESC, doc_id) ranking. Proves the distributed
    // plan computes the definition, not merely something DuckDB agrees
    // with.
    val dir = "/root/testdata/sf0.001"
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shingled = docs.view.mapValues(_.trim.split("\\s+").toSeq)
      .filter(_._2.size >= 3)
      .mapValues(w => w.sliding(3).map(g =>
        math.floorMod(h60(g.mkString(" ")), 2147483647L)).toSeq)
      .toMap
    val tf = shingled.view.mapValues(
      _.groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val dl = tf.view.mapValues(_.values.sum).toMap
    val tTok = dl.values.sum
    val nDocs = tf.size.toLong
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val queries = docs.keys.filter(id =>
      math.floorMod(h60(docs(id)), 20L) == 0 && tf.contains(id))
    val expect = queries.flatMap { qid =>
      val cands = tf(qid).keys.filter(df(_) <= 16).toSet
        .flatMap((h: Long) => tf.keys.filter(d =>
          d != qid && tf(d).contains(h)))
      val scored = cands.toSeq.map { d =>
        // .toSeq before .map: keys is a Set, and mapping a Set of terms
        // to scores would DEDUPLICATE equal per-term scores before the sum
        val s = tf(qid).keys.toSeq.filter(tf(d).contains).map { h =>
          val idf = BigInt(bitlen(nDocs) - bitlen(df(h)))
          val tfp = math.min(tf(d)(h), 15L)
          (idf * 22 * tfp * tTok * 1000000L) /
            (BigInt(10) * tTok * tfp + BigInt(3) * tTok +
              BigInt(9) * dl(d) * nDocs)
        }.sum
        (d, s.toLong)
      }
      scored.sortBy { case (d, s) => (-s, d) }.take(10).zipWithIndex
        .map { case ((d, s), i) => (qid, (i + 1).toLong, d, s) }
    }.toSet
    val got = CorpusQuality.defs("q102_bm25_retrieval")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(queries.nonEmpty, "sf0.001 must sample at least one query")
    assert(got === expect)
  }

  test("q103: sees transition structure that unigram surprisal cannot") {
    // Both docs have the SAME unigram multiset (8×x, 8×y) — q61 scores
    // them identically by construction. Doc 0 alternates (only x→y and
    // y→x transitions, each seen 14+ times corpus-wide); doc 1 blocks
    // its tokens (adds x→x, y→y transitions seen only there). The
    // bigram LM must separate them.
    val dir = corpus(Seq(
      "x y x y x y x y x y x y x y x y",
      "x x x x y y y y x x x x y y y y"))
    val uni = CorpusQuality.defs("q61_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(uni(0L) === uni(1L), "q61 should be blind to word order here")
    val bi = CorpusQuality.defs("q103_bigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bi(0L) < bi(1L),
      s"alternating text must have lower conditional surprisal: $bi")
  }

  test("q104: target-like docs outrank off-domain docs; confs steer selection") {
    // target source docs are all "alpha"; the raw pool has one
    // alpha-like doc and many beta docs — the alpha-like doc must rank 1
    import org.apache.spark.sql.functions.{col, lit, when}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dsir").toFile.getAbsolutePath
    val texts = Seq.fill(5)("alpha alpha alpha alpha") ++ // target (src0)
      Seq("alpha alpha alpha alpha") ++                    // pool, on-domain
      Seq.fill(10)("beta beta beta beta")                  // pool, off-domain
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("source",
        when(col("doc_id") < 5, lit("src0")).otherwise(lit("srcX")))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = CorpusQuality.defs("q104_dsir_selection")(spark, dir).collect()
    assert(out.head.getLong(1) === 5L,
      s"the on-domain pool doc must rank first: ${out.toSeq}")
    assert(out.map(_.getLong(1)).toSet.intersect((0L to 4L).toSet).isEmpty,
      "target docs must never appear in the selection")
    spark.conf.set("graft.dsir.budget", "3")
    try {
      val capped = CorpusQuality.defs("q104_dsir_selection")(spark, dir)
        .collect()
      assert(capped.length === 3 &&
        capped.map(_.getLong(0)).sameElements(Array(1L, 2L, 3L)))
    } finally spark.conf.unset("graft.dsir.budget")
  }

  test("q105: batch retrieves from the old corpus only, at any cut") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    for (cut <- Seq("100", "250", "400")) {
      spark.conf.set("graft.batch.cut", cut)
      try {
        val rows = CorpusQuality.defs("q105_incremental_bm25")(spark, dir)
          .collect()
        assert(rows.nonEmpty, s"cut=$cut produced no retrievals")
        rows.foreach { r =>
          assert(r.getLong(0) >= cut.toLong,
            s"cut=$cut: query ${r.getLong(0)} is not a batch doc")
          assert(r.getLong(2) < cut.toLong,
            s"cut=$cut: retrieved ${r.getLong(2)} is not an old-corpus doc")
        }
        val perQ = rows.groupBy(_.getLong(0))
        perQ.values.foreach { qr =>
          assert(qr.map(_.getLong(1)).sorted.sameElements(
            (1L to qr.length)), s"cut=$cut: ranks not contiguous")
        }
      } finally spark.conf.unset("graft.batch.cut")
    }
  }

  test("q106: scores only batch pool docs; bucket conf keys the artifacts") {
    val dir = "/root/testdata/sf0.001"
    val cut = 400L
    spark.conf.set("graft.batch.cut", cut.toString)
    try {
      val base = CorpusQuality.defs("q106_incremental_dsir")(spark, dir)
        .collect()
      assert(base.nonEmpty)
      base.foreach(r => assert(r.getLong(0) >= cut,
        s"doc ${r.getLong(0)} is not a batch doc"))
      // a different bucket count is a DIFFERENT artifact identity — the
      // rebuilt LMs must actually be used (collisions change scores)
      spark.conf.set("graft.dsir.buckets", "7")
      val coarse = CorpusQuality.defs("q106_incremental_dsir")(spark, dir)
        .collect()
      assert(coarse.map(_.getLong(0)).toSeq ==
        base.map(_.getLong(0)).toSeq, "doc universe must not change")
      assert(coarse.map(_.getLong(2)).toSeq !=
        base.map(_.getLong(2)).toSeq,
        "7-bucket LM collisions should change at least one score")
    } finally {
      spark.conf.unset("graft.batch.cut")
      spark.conf.unset("graft.dsir.buckets")
    }
  }

  test("q107: frozen-LM scores only batch docs; OOV flags genuinely new grams") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    // cut=1: only doc 0 trains the LM, so the batch MUST contain
    // transitions the frozen LM has never seen (nonzero n_oov) — the
    // drift signal has to fire on genuinely novel content
    spark.conf.set("graft.batch.cut", "1")
    try {
      val rows = CorpusQuality.defs("q107_incremental_bigram_lm")(
        spark, dir).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) >= 1L))
      assert(rows.map(_.getLong(2)).sum > 0,
        "cut=1 batch must contain OOV transitions")
    } finally spark.conf.unset("graft.batch.cut")
  }

  test("q108: the audit detects recall lost to the df cap") {
    // Corpus engineered so candidacy through a COMMON gram matters: the
    // query shares its common gram with 31 docs (df > 16 → cap drops
    // the posting list) and a rare gram with exactly one doc. The
    // uncapped truth has ~32 candidates; the capped pipeline sees 1 —
    // the audit row must show the gap and recall < 1.
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    // pad the query text until the hash sampler (mod 80) selects it
    val qBase = "c c c c q1 q2 q3"
    val qText = Iterator.from(0).map(i => s"$qBase pad$i")
      .find(t => math.floorMod(h60(t), 80L) == 0).get
    val hidden = "x1 x2 c c c c x3 x4"
    val rarePartner = "q1 q2 q3 y1 y2 y3"
    val fillers = (0 until 30).map(i => s"f${i}a c c c c f${i}b f${i}c")
    val dir = corpus(Seq(qText, hidden, rarePartner) ++ fillers)
    val out = CorpusQuality.defs("q108_bm25_recall_audit")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (nTrue, nCap, _, recall) = out(0L) // doc 0 is the crafted query
    assert(nTrue >= 31L, s"expected ~32 true candidates, got $nTrue")
    assert(nCap === 1L, s"the df cap should leave one candidate, got $nCap")
    assert(recall < 1.0d, s"the audit must surface the lost recall: $recall")
  }

  test("q102: dfCap/k confs steer candidate breadth and list depth") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("graft.bm25.k", "3")
    try {
      val perQ = CorpusQuality.defs("q102_bm25_retrieval")(spark, dir)
        .collect().groupBy(_.getLong(0))
      assert(perQ.nonEmpty)
      perQ.values.foreach { rows =>
        assert(rows.length <= 3, "k conf ignored")
        assert(rows.map(_.getLong(1)).sorted.sameElements(
          (1L to rows.length)), "ranks not contiguous from 1")
      }
    } finally spark.conf.unset("graft.bm25.k")
  }
}
