package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curate, Dedup, Embed, Ingest, Retrieval, Select, Text}

/** Contract of the public `graft.ops` DataFrame-in/DataFrame-out API:
  * every operator runs against a frame with ARBITRARY column names —
  * none of the testdata layout (`documents`/`embeddings`, `doc_id`/
  * `text`/`vec_id`/`embedding`) is assumed. The q-entries bind the same
  * cores to the driver testdata, so oracle parity covers the values;
  * this spec covers the public signatures and their column-name
  * contract.
  */
class OpsApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ops-api")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** A wiki-ish corpus under non-testdata column names (page_id, body). */
  private lazy val pages = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the green forest where the small animals live and " +
      "play all day long under a warm summer sun"),
    (11L, "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the green forest where the small animals live and " +
      "play all day long under a warm summer sun"), // exact dup of 10
    (12L, "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the green forest where the small animals live and " +
      "play all day long under a warm winter sun"), // near dup of 10
    (13L, "completely different content about spark catalyst plans " +
      "optimizers and shuffles with many extra words to pass length " +
      "gates and a few more of the usual and is of a the tokens here"),
    (14L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (15L, "zz")).toDF("page_id", "body")

  test("Text.stats runs on (page_id, body)") {
    val out = Text.stats(pages, "page_id", "body")
    assert(out.columns.toSeq === Seq("page_id", "n_chars", "n_words",
      "n_tokens", "punct_ratio", "mean_word_len"))
    val r = out.where(col("page_id") === 14L).head()
    assert(r.getAs[Int]("n_words") === 10)
    assert(r.getAs[Double]("punct_ratio") === 0.0d)
  }

  test("Text.scrub redacts PII and blocklist terms with exact counts") {
    val msgs = Seq(
      (1L, "contact me at jane.doe+x@example.co.uk or 192.168.0.1 ok"),
      (2L, "ssn 123-45-6789 and phone +1 (415) 555-2671 appear here"),
      (3L, "no sensitive content in this perfectly ordinary sentence"),
      (4L, null.asInstanceOf[String])).toDF("msg_id", "content")
    val pats = Text.piiPatterns :+
      ("blocked" -> Text.blocklistPattern(Seq("ordinary", "sentence")))
    val out = Text.scrub(msgs, pats, "msg_id", "content")
    assert(out.columns.toSeq === Seq("msg_id", "n_email", "n_ssn",
      "n_ipv4", "n_phone", "n_blocked", "n_redactions", "clean_text"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_email") === 1L)
    assert(rows(1L).getAs[Long]("n_ipv4") === 1L)
    assert(rows(1L).getAs[String]("clean_text") ===
      "contact me at [EMAIL] or [IPV4] ok")
    assert(rows(2L).getAs[Long]("n_ssn") === 1L)
    assert(rows(2L).getAs[Long]("n_phone") === 1L)
    assert(rows(2L).getAs[String]("clean_text") ===
      "ssn [SSN] and phone [PHONE] appear here")
    assert(rows(3L).getAs[Long]("n_blocked") === 2L)
    assert(rows(3L).getAs[Long]("n_redactions") === 2L)
    assert(rows(3L).getAs[String]("clean_text") ===
      "no sensitive content in this perfectly [BLOCKED] [BLOCKED]")
    assert(rows(4L).getAs[Long]("n_redactions") === 0L)
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("clean_text")))
  }

  test("Text.blocklistPattern rejects regex metacharacters") {
    intercept[IllegalArgumentException] {
      Text.blocklistPattern(Seq("a.b"))
    }
    intercept[IllegalArgumentException] { Text.blocklistPattern(Nil) }
  }

  test("Text.boilerplate flags cross-doc template grams per site") {
    val sites = pages.withColumn("site",
      when(col("page_id") <= 13L, "a").otherwise("b"))
    val out = Text.boilerplate(sites, idCol = "page_id",
      textCol = "body", srcCol = "site")
    assert(out.columns.toSeq === Seq("page_id", "site", "n_grams",
      "n_boiler", "boiler_ratio"))
    val m = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("boiler_ratio")).toMap
    assert(m.size === 5, "the 2-word doc should fall out")
    assert(m(10L) === 1.0, "identical twin grams must all be boilerplate")
    assert(m(11L) === 1.0)
    assert(m(12L) > 0.8 && m(12L) < 1.0,
      s"near dup should be mostly boilerplate: ${m(12L)}")
    assert(m(13L) === 0.0, "unique doc flagged as boilerplate")
    assert(m(14L) === 0.0, "sole ≥3-word doc of its site has df=1 grams")
  }

  test("Text.boilerScore scores a batch against the FROZEN gram set") {
    val sites = pages.withColumn("site",
      when(col("page_id") <= 13L, "a").otherwise("b"))
    val frozen = Text.boilerGramFrame(sites, idCol = "page_id",
      textCol = "body", srcCol = "site")
    assert(frozen.columns.toSeq === Seq("src", "h"))
    val batch = Seq(
      // verbatim copy of page 10 (site a): every gram is frozen chrome
      (20L, "a", "the quick brown fox jumps over the lazy dog and " +
        "runs far away into the green forest where the small animals " +
        "live and play all day long under a warm summer sun"),
      // fresh text on a known site: nothing frozen matches
      (21L, "a", "totally original writing with no recycled template " +
        "material at all anywhere"),
      // site unseen at snapshot time: scores 0 by definition
      (22L, "c", "the quick brown fox jumps over the lazy dog again"))
      .toDF("page_id", "site", "body")
    val out = Text.boilerScore(batch, frozen, idCol = "page_id",
      textCol = "body", srcCol = "site")
    val m = out.collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("boiler_ratio")).toMap
    assert(m(20L) === 1.0, "verbatim copy of frozen template != 1.0")
    assert(m(21L) === 0.0)
    assert(m(22L) === 0.0, "unseen source must score 0 against a frozen set")
  }

  test("Text.qualityFlags keeps prose, rejects a 2-char doc") {
    val out = Text.qualityFlags(pages, "page_id", "body")
    val keep = out.select(col("page_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(keep(10L) === 1)
    assert(keep(15L) === 0, "2-char doc passed the length gate")
  }

  test("Text.langId predicts en for English prose on (page_id, body)") {
    val out = Text.langId(pages, "page_id", "body")
    val pred = out.select(col("page_id"), col("lang_pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) === "en")
    assert(pred(14L) === "und", "stopword-free doc should be und")
  }

  test("Text.fingerprint is order-sensitive and keeps the id name") {
    val docs = Seq((1L, "aa bb cc"), (2L, "cc bb aa")).toDF("k", "txt")
    val out = Text.fingerprint(docs, "k", "txt")
    assert(out.columns.toSeq === Seq("k", "fp"))
    val fps = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) !== fps(2L), "permuted doc fingerprinted identically")
  }

  test("Dedup.exact groups identical content under (page_id, body)") {
    val out = Dedup.exact(pages, "page_id", "body")
    val byKeep = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKeep(10L) === 2L, "exact pair 10/11 not grouped")
    assert(byKeep(12L) === 1L)
  }

  test("Dedup.minhashPairs finds the exact and near pair, not junk") {
    val pairs = Dedup.minhashPairs(pages, "page_id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((10L, 11L)).contains(1.0d),
      s"exact dup pair missing from $pairs")
    assert(pairs.forall(_._3 >= 0.8d))
    assert(!byPair.contains((10L, 13L)) && !byPair.contains((10L, 14L)),
      "unrelated docs paired")
  }

  test("Dedup.simhashPairs pairs the exact dup at hamming 0") {
    val pairs = Dedup.simhashPairs(pages, "page_id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(pairs.get((10L, 11L)).contains(0))
    assert(!pairs.contains((10L, 14L)))
  }

  test("Dedup.cascade labels kept/exact/near stages with cluster keepers") {
    val out = Dedup.cascade(pages, idCol = "page_id", textCol = "body")
    assert(out.columns.toSeq === Seq("page_id", "keep_id", "stage"))
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(10L) === ((10L, "kept")), "cluster canonical must be kept")
    assert(rows(11L) === ((10L, "exact")),
      "exact dup must point at the cluster keeper, removed at stage exact")
    assert(rows(12L) === ((10L, "near")),
      "near dup rep must be removed at stage near with the cluster keeper")
    assert(rows(13L) === ((13L, "kept")))
    assert(rows(14L) === ((14L, "kept")))
    assert(rows(15L) === ((15L, "kept")),
      "sub-floor doc must pass through kept")
    assert(rows.size === 6, "one verdict row per input document")
  }

  test("Text.knScore matches the hand-built interpolated-KN model") {
    val docs = Seq((1L, "a b a b"), (2L, "c b")).toDF("doc_id", "text")
    val out = Text.knScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // model: pc = {(a,b):2, (b,a):1, (c,b):1}, B = 3;
    // c1(a)=2 n1l(a)=1, c1(b)=1 n1l(b)=1, c1(c)=1 n1l(c)=1;
    // n1r(b)=2, n1r(a)=1 — replay the engine's exact double expression
    def kn20(c12: Long, c1: Long, n1l: Long, n1r: Long, b: Long): Long =
      math.floor((((c12 - 0.75d) + (0.75d * n1l) * (n1r.toDouble / b)) /
        c1) * 1048576.0d).toLong
    val ab = kn20(2, 2, 1, 2, 3)
    val ba = kn20(1, 1, 1, 1, 3)
    val cb = kn20(1, 1, 1, 2, 3)
    assert(out(1L) === ((3L, 2 * ab + ba, (2 * ab + ba) / 3.0d)))
    assert(out(2L) === ((1L, cb, cb.toDouble)))
    // the KN point: same raw count (c12 = 1, c1 = 1), but the bigram
    // whose RIGHT word continues more distinct contexts scores higher
    assert(cb > ba, "continuation probability must break the count tie")
  }

  test("Retrieval.bm25 retrieves the phrase-sharing doc first") {
    val queries = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("qid", "qtext")
    val out = Retrieval.bm25(pages, queries, k = 3, dfCap = 16,
      corpusIdCol = "page_id", corpusTextCol = "body",
      queryIdCol = "qid", queryTextCol = "qtext")
    assert(out.columns.toSeq ===
      Seq("query_id", "rank", "doc_id", "score_ppm"))
    val top = out.where(col("rank") === 1).head()
    assert(top.getAs[Long]("query_id") === 100L)
    assert(top.getAs[Long]("doc_id") === 14L,
      "shared 3-gram shingles should retrieve page 14 first")
  }

  test("Select.dsir scores target-like docs above junk") {
    val target = Seq((1L, "physics physics quantum quantum field theory"))
      .toDF("pid", "content")
    val pool = Seq(
      (2L, "quantum field theory physics"),
      (3L, "xqzw vbnm asdf ghjk")).toDF("pid", "content")
    val out = Select.dsir(pool, target, "pid", "content", buckets = 1000)
    assert(out.columns.toSeq ===
      Seq("pid", "n_tokens", "sum_bits", "score"))
    val scores = out.collect().map(r => r.getLong(0) -> r.getDouble(3))
      .toMap
    assert(scores(2L) > scores(3L),
      s"target-like doc did not outscore junk: $scores")
  }

  test("Text.gopherQuality trips each Table A1 rule independently") {
    val healthy = ("the cat and dog ran with joy that day here " * 6).trim
    val docs = Seq(
      (1L, healthy),                                    // passes all
      (2L, "the cat and dog ran with joy here"),        // < 50 words
      (3L, healthy + " " + ("# " * 20).trim),           // symbol-heavy
      (4L, "- a b c\n- d e f\n- g h i"),                // all bullets
      (5L, "one two three...\nfour five six...\nseven"),// ellipsis ends
      (6L, ("pneumonoultramicroscopic " * 60).trim),    // mwl > 10
      // Table A1 applies the 0.1 symbol ratio to '#' and '...'
      // SEPARATELY: 60 words + 4 hashes (6.7%) + 4 ellipses (6.7%)
      // passes r_sym even though the combined count (13.3%) would not
      (7L, healthy + " ab# cd# ef# gh# i... j... k... l..."),
      // CRLF line endings: Java and RE2 must count the same ellipsis
      // lines (2 of 3) via the \r-strip
      (8L, "one two three...\r\nfour five six...\r\nseven")
    ).toDF("page_id", "body")
    val out = Text.gopherQuality(docs, idCol = "page_id",
        textCol = "body")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (10 to 17).map(out(id).getBoolean).toList
    // (r_words, r_mwl, r_sym, r_bullet, r_ellipsis, r_alpha, r_stop, keep)
    assert(flags(1L) === List(true, true, true, true, true, true,
      true, true))
    assert(!flags(2L).head && !flags(2L).last)  // r_words fails
    assert(!flags(3L)(2) && !flags(3L).last)    // r_sym fails
    assert(!flags(4L)(3))                       // r_bullet fails
    assert(!flags(5L)(4))                       // r_ellipsis fails
    assert(!flags(6L)(1))                       // r_mwl fails
    // counts: 3 bullets of 3 lines; 2 ellipsis lines; 20 '#' marks
    assert(out(4L).getLong(3) === 3L && out(4L).getLong(4) === 3L)
    assert(out(5L).getLong(5) === 2L)
    assert(out(3L).getLong(6) === 20L)
    // '#' tokens carry no letter: alpha floor also trips on doc 3
    assert(!flags(3L)(5))
    // independent symbol thresholds: 4 of each over 68 words — passes
    assert(out(7L).getLong(6) === 4L && out(7L).getLong(7) === 4L)
    assert(flags(7L)(2), "separate '#'/'...' ratios must pass r_sym")
    // CRLF doc: 3 lines, 2 ellipsis-terminated, same as the \n doc 5
    assert(out(8L).getLong(3) === 3L && out(8L).getLong(5) === 2L)
  }

  test("Dedup.contaminationAudit finds the longest shared verbatim " +
      "run on capped candidate pairs (hand-computed)") {
    val corpus = Seq(
      (100L, "a b c d e f g h i j"),
      (101L, "x1 x2 a b c d e f y1 y2"),   // carries the 6-run
      (102L, "z z z z z"),                  // shares nothing
      (103L, "a b c d e f g h i j"),        // dup of 100, larger id
      (104L, "a b c d e f g h i j"),        // dup of 100, largest id
      (105L, "q a a b c d e e r")           // repeated tokens
    ).toDF("page_id", "body")
    val bench = Seq(
      (1L, "a b c d e f q r s t"),  // 2 shared 5-grams with 100/101/103/104
      (2L, "m n o p q"),            // no candidate → absent
      (3L, "a a b c d e e")         // 3 shared grams with 105, full-run
    ).toDF("item_id", "btext")
    val out = graft.ops.Dedup.contaminationAudit(corpus, bench,
        k = 5, topN = 3, idCol = "page_id", textCol = "body",
        benchIdCol = "item_id", benchTextCol = "btext")
      .orderBy("item_id", "page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // item 1 ties at 2 shared grams across 100/101/103/104 — the
    // bounded top-3 keeps the id-ascending three, drops 104
    // deterministically; the longest shared run is "a b c d e f" = 6
    assert(out.toSeq === Seq(
      (1L, 100L, 2L, 10L, 6L, 600000L),
      (1L, 101L, 2L, 10L, 6L, 600000L),
      (1L, 103L, 2L, 10L, 6L, 600000L),
      // item 3's [a b c d e] gram also blocks 100/101 (5-token run);
      // its whole text recurs inside 105 (repeated tokens put matches
      // on many diagonals; the run diagonal wins): 7/7 tokens
      (3L, 100L, 1L, 7L, 5L, 714285L),
      (3L, 101L, 1L, 7L, 5L, 714285L),
      (3L, 105L, 3L, 7L, 7L, 1000000L)))
    // determinism under re-planning
    val again = graft.ops.Dedup.contaminationAudit(
        corpus.repartition(7), bench, 5, 3,
        idCol = "page_id", textCol = "body",
        benchIdCol = "item_id", benchTextCol = "btext")
      .orderBy("item_id", "page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(again.toSeq === out.toSeq.map(t => (t._1, t._2, t._5)))
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.contaminationAudit(corpus, bench, k = 1)
    }
  }

  test("Curate.epochSchedule water-fills overflow into uncapped " +
      "sources (hand-computed waterfall)") {
    // srcA 10 tokens w=1, srcB 4 tokens w=1, srcC 100 tokens w=2;
    // budget 60, maxEpochs 2 (caps 20/8/200). Round 1 (W=4, R=60):
    // shares 15/15/30 — B caps at 8. Round 2 (W=3, R=52): shares
    // 17/-/34, nothing caps → final, 1 token of floor dust unallocated.
    val d = Seq(
      ("a", ("x " * 10).trim), ("b", ("x " * 4).trim),
      ("c", ("x " * 100).trim)).toDF("site", "body")
    val w = Seq(("a", 1L), ("b", 1L), ("c", 2L)).toDF("site", "w")
    def run(budget: Long, maxE: Long) =
      Curate.epochSchedule(d, w, budget, maxE,
          srcCol = "site", textCol = "body")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6)))).toMap
    val out = run(60L, 2L)
    assert(out("a") === ((10L, 20L, 17L, 1700000L, false)))
    assert(out("b") === ((4L, 8L, 8L, 2000000L, true)))
    assert(out("c") === ((100L, 200L, 34L, 340000L, false)))
    // budget past every cap: everyone caps, dust stays unallocated
    val all = run(1000L, 2L)
    assert(all("a") === ((10L, 20L, 20L, 2000000L, true)))
    assert(all("b") === ((4L, 8L, 8L, 2000000L, true)))
    assert(all("c") === ((100L, 200L, 200L, 2000000L, true)))
    // zero budget: nothing allocated
    assert(run(0L, 2L).values.forall(_._3 == 0L))
    // zero-weight source receives nothing; others split its share
    val w0 = Seq(("a", 0L), ("b", 1L), ("c", 1L)).toDF("site", "w")
    val z = Curate.epochSchedule(d, w0, 12L, 2L,
        srcCol = "site", textCol = "body")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(z("a") === 0L)
    assert(z("b") + z("c") <= 12L && z("b") === 6L)
    // determinism under re-planning
    val rep = Curate.epochSchedule(d.repartition(7), w, 60L, 2L,
        srcCol = "site", textCol = "body")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rep === out.map { case (k, v) => k -> v._3 })
    intercept[IllegalArgumentException] {
      Curate.epochSchedule(d, w, -1L, 2L, "site", "body")
    }
    intercept[IllegalArgumentException] {
      Curate.epochSchedule(d, w, 60L, 0L, "site", "body")
    }
  }

  test("Curate.capPerKey keeps a deterministic n-sample per key on " +
      "(page_id, site)") {
    import graft.ops.Curate
    val d = (1L to 20L).map(i =>
      (i, if (i <= 12) "big.com" else "small.org", s"doc $i"))
      .toDF("page_id", "site", "body")
    val out = Curate.capPerKey(d, 5, keyCol = "site", idCol = "page_id")
    assert(out.columns.toSeq === Seq("site", "page_id", "keep_rank"))
    val bySite = out.collect().groupBy(_.getString(0))
    assert(bySite("big.com").length === 5) // capped
    assert(bySite("small.org").length === 5) // under... 8 docs, capped to 5
    assert(bySite.values.flatten.map(_.getAs[Long]("keep_rank")).toSeq
      .forall(r => r >= 1 && r <= 5))
    // deterministic: a re-run under a different partitioning keeps the
    // same documents in the same ranks
    val again = Curate.capPerKey(d.repartition(7), 5,
      keyCol = "site", idCol = "page_id")
    assert(out.orderBy("site", "page_id").collect().toSeq ===
      again.orderBy("site", "page_id").collect().toSeq)
    intercept[IllegalArgumentException] {
      Curate.capPerKey(d, 0, keyCol = "site", idCol = "page_id")
    }
    intercept[IllegalArgumentException] {
      Curate.capPerKey(d.withColumn("sid", col("site")), 3,
        keyCol = "site", idCol = "sid") // non-integral id fails loudly
    }
  }

  test("Curate.capPerKeyAppend fills only the remaining slots and " +
      "never evicts snapshot-kept docs") {
    import graft.ops.Curate
    val old = (1L to 8L).map(i => (i, "big.com", s"doc $i"))
      .toDF("page_id", "site", "body")
    val batch = Seq((10L, "big.com", "b1"), (11L, "big.com", "b2"),
      (12L, "big.com", "b3"), (13L, "new.org", "b4"))
      .toDF("page_id", "site", "body")
    val counts = Curate.capCounts(old, 10, keyCol = "site",
      idCol = "page_id") // big.com: 8 kept of a 10-cap
    val out = Curate.capPerKeyAppend(batch, counts, 10,
      keyCol = "site", idCol = "page_id").collect()
    val big = out.filter(_.getString(0) == "big.com")
    // 2 remaining slots: exactly 2 batch docs kept, ranks continue 9, 10
    assert(big.length === 2)
    assert(big.map(_.getAs[Long]("keep_rank")).sorted.toSeq ===
      Seq(9L, 10L))
    // a key unseen at snapshot time starts from 0
    val nw = out.filter(_.getString(0) == "new.org")
    assert(nw.length === 1 && nw.head.getAs[Long]("keep_rank") === 1L)
    // saturated key: no batch doc fits
    val full = Curate.capPerKeyAppend(batch, counts, 8,
      keyCol = "site", idCol = "page_id").collect()
    assert(!full.exists(_.getString(0) == "big.com"))
  }

  test("Curate.capPerKey preserves the input id type (no silent " +
      "widening to long)") {
    import graft.ops.Curate
    val d = (1 to 9).map(i => (i, s"s${i % 2}", s"d$i"))
      .toDF("pid", "site", "body") // pid: IntegerType
    val out = Curate.capPerKey(d, 3, keyCol = "site", idCol = "pid")
    assert(out.schema("pid").dataType ===
      org.apache.spark.sql.types.IntegerType)
    // kept ids equi-join back against the source frame without casts
    assert(out.join(d, Seq("pid", "site")).count() === out.count())
    val app = Curate.capPerKeyAppend(
      d.where(col("pid") > 6),
      Curate.capCounts(d.where(col("pid") <= 6), 3, "site", "pid"),
      3, keyCol = "site", idCol = "pid")
    assert(app.schema("pid").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("Curate.capPerKeyAppend honors the cap for a NULL key domain " +
      "across epochs") {
    import graft.ops.Curate
    val old = Seq((1L, null: String), (2L, null), (3L, "a.com"))
      .toDF("page_id", "site")
    val counts = Curate.capCounts(old, 3, keyCol = "site",
      idCol = "page_id") // null domain: 2 kept of a 3-cap
    val batch = Seq((10L, null: String), (11L, null), (12L, null))
      .toDF("page_id", "site")
    val out = Curate.capPerKeyAppend(batch, counts, 3,
      keyCol = "site", idCol = "page_id").collect()
    val nullKey = out.filter(_.isNullAt(0))
    // only ONE remaining slot — null keys must match their counts row
    assert(nullKey.length === 1)
    assert(nullKey.head.getAs[Long]("keep_rank") === 3L)
  }

  test("Curate.curriculum ranks by score, ntiles stages, and shuffles " +
      "within buckets deterministically") {
    val scored = (1L to 10L).map(i => (i, i.toDouble * 10))
      .toDF("item", "diff")
    val out = Curate.curriculum(scored, nBuckets = 3,
      scoreCol = "diff", idCol = "item")
    assert(out.columns.toSeq ===
      Seq("item", "diff", "rank", "bucket", "ord"))
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // ascending: lowest score ranks first
    assert(rows(1L)._1 === 1L && rows(10L)._1 === 10L)
    // SQL-standard ntile of 10 over 3: sizes 4/3/3
    val sizes = rows.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes === Map(1L -> 4, 2L -> 3, 3L -> 3))
    // ord covers 1..size within each bucket
    rows.values.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).toSeq.sorted ===
        (1L to members.size.toLong))
    }
    // descending flips the rank order
    val desc = Curate.curriculum(scored, nBuckets = 3,
      scoreCol = "diff", idCol = "item", ascending = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(desc(10L) === 1L && desc(1L) === 10L)
    // deterministic under re-evaluation
    val again = Curate.curriculum(scored, nBuckets = 3,
      scoreCol = "diff", idCol = "item")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(again === rows.map { case (k, v) => k -> v._3 })
  }

  test("Curate.tokenBudget matches the brute-force prefix cut") {
    val docs = (1L to 40L)
      .map(i => (i, s"tok$i " * (i % 5 + 1).toInt)).toDF("k", "txt")
    val budget = 30L
    val out = Curate.tokenBudget(docs, budget, "k", "txt", shards0 = 4)
      .collect()
    // brute force: global (hash, id) order, running sum, cut at budget
    val brute = docs.select(col("k"),
        graft.functions.TextFunctions.bpeTokenCount(col("txt"))
          .cast("long").as("n"),
        graft.functions.TextFunctions.hash60(col("txt")).as("h"))
      .orderBy("h", "k").collect()
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), r) =>
        (r.getLong(0), r.getLong(1), cum + r.getLong(1)) }
      .drop(1).takeWhile(_._3 <= budget)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === brute.toSeq)
  }

  test("Curate.qualityFilter + hashSplit compose on (page_id, body)") {
    val kept = Curate.qualityFilter(pages, "body")
    assert(kept.count() === 4) // 14 (10 words) and 15 (2 chars) fail
    val split = Curate.hashSplit(pages, "body", 100, 0)
    assert(split.where(col("split") === "train").count() === pages.count())
    // determinism: same content, same split, any run
    val s1 = Curate.hashSplit(pages, "body").select("page_id", "split")
      .collect().toSet
    val s2 = Curate.hashSplit(pages, "body").select("page_id", "split")
      .collect().toSet
    assert(s1 === s2)
  }

  test("Curate.packAppend continues each shard at its frozen tail") {
    val tails = Curate.packTailFrame(pages, shards = 4,
      idCol = "page_id", textCol = "body")
    assert(tails.columns.toSeq === Seq("shard", "tail"))
    val tailMap = tails.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Seq(
      (30L, "brand new crawl content arriving after the snapshot"),
      (31L, "another incoming document with different words entirely"))
      .toDF("page_id", "body")
    val out = Curate.packAppend(batch, tails, seqLen = 16, shards = 4,
      idCol = "page_id", textCol = "body").collect()
    assert(out.length === 2)
    // per shard: the first batch doc starts exactly at the frozen tail
    // (0 for a shard the snapshot never touched), later ones advance
    // by n_tokens; pack_id stays start_off div seqLen
    out.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_off"))
      assert(sorted.head.getAs[Long]("start_off") ===
        tailMap.getOrElse(sh, 0L))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_off") ===
            a.getAs[Long]("start_off") + a.getAs[Int]("n_tokens"))
        case _ => ()
      }
      sorted.foreach(r => assert(r.getAs[Long]("pack_id") ===
        r.getAs[Long]("start_off") / 16))
    }
  }

  test("Embed.cosineTopK ranks by cosine under (node, vec)") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("node", "vec")
    val queries = Seq((7L, Seq(1.0f, 0.05f))).toDF("node", "vec")
    val out = Embed.cosineTopK(corpus, queries, k = 2,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
    val ranked = out.orderBy("rank").collect()
      .map(r => r.getAs[Long]("vec_id"))
    assert(ranked.toSeq === Seq(1L, 2L))
  }

  test("Embed.marginPairs mines mutual top-1 pairs and leaves hubs " +
      "unpaired") {
    import math.{cos => mcos, sin => msin}
    def v(deg: Double) = Seq(mcos(deg.toRadians).toFloat,
      msin(deg.toRadians).toFloat)
    // X at 0° and 90°; Y at 5°, 85°, and a 45° "hub" equally close to
    // both X vectors — mutual-max pairing must yield exactly
    // (x1,y11) and (x2,y12), the hub y13 stays unpaired
    val x = Seq((1L, v(0)), (2L, v(90))).toDF("node", "vec")
    val y = Seq((11L, v(5)), (12L, v(85)), (13L, v(45)))
      .toDF("node", "vec")
    val out = Embed.marginPairs(x, y, k = 2, tau = 0.0,
        idCol = "node", vecCol = "vec")
      .orderBy("x_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.map(p => (p._1, p._2)).toSeq === Seq((1L, 11L), (2L, 12L)))
    // top-1 cosine sits above the k-NN mean by construction → margin>1
    assert(out.forall(_._4 > 1.0d), s"margins not >1: ${out.toSeq}")
    // a high tau drops everything
    assert(Embed.marginPairs(x, y, k = 2, tau = 2.0,
      idCol = "node", vecCol = "vec").count() === 0L)
    // marginPairsOf ignores ranks beyond k: a deeper retrieval frame
    // (k=3) fed at k=2 reproduces the k=2 mining exactly
    val xy3 = Embed.cosineTopK(y, x, k = 3, idCol = "node",
      vecCol = "vec", queryIdCol = "node", queryVecCol = "vec")
    val yx3 = Embed.cosineTopK(x, y, k = 3, idCol = "node",
      vecCol = "vec", queryIdCol = "node", queryVecCol = "vec")
    val reused = Embed.marginPairsOf(xy3, yx3, k = 2, tau = 0.0)
      .orderBy("x_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(reused.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Embed.marginPairsOf(xy3, yx3, k = 0)
    }
    // the crawl-batch form (one corpus scan, batch broadcast) must
    // reproduce the session form exactly on the same two sides
    val batchForm = Embed.marginPairsBatch(y, x, k = 2, tau = 0.0,
        idCol = "node", vecCol = "vec",
        batchIdCol = "node", batchVecCol = "vec")
      .orderBy("x_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(batchForm.toSeq === out.toSeq)
    // and it accepts an artifact-shaped corpus frame ((vec_id, v, nrm)
    // from Embed.normalize) via vecCol = "v" — re-deriving the norm is
    // bit-identical
    val artifact = Embed.normalize(y, idCol = "node", vecCol = "vec")
    val fromArtifact = Embed.marginPairsBatch(artifact, x, k = 2,
        tau = 0.0, idCol = "vec_id", vecCol = "v",
        batchIdCol = "node", batchVecCol = "vec")
      .orderBy("x_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(fromArtifact.toSeq === out.toSeq)
  }

  test("Embed.kmeans separates two blobs under (node, vec)") {
    val blobs = Seq(
      (1L, Seq(10.0f, 0.1f)), (2L, Seq(10.2f, 0.0f)),
      (3L, Seq(9.9f, 0.2f)), (4L, Seq(0.1f, 10.0f)),
      (5L, Seq(0.0f, 10.1f)), (6L, Seq(0.2f, 9.9f))).toDF("node", "vec")
    val out = Embed.kmeans(blobs, k = 2, iters = 3,
      idCol = "node", vecCol = "vec")
    assert(out.columns.toSeq === Seq("node", "cluster", "score"))
    val cl = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) === cl(2L) && cl(2L) === cl(3L))
    assert(cl(4L) === cl(5L) && cl(5L) === cl(6L))
    assert(cl(1L) !== cl(4L), "blobs merged into one cluster")
  }

  test("Curate.pack lays shards out contiguously from offset 0") {
    val out = Curate.pack(pages, seqLen = 16, shards = 4,
      idCol = "page_id", textCol = "body").cache()
    assert(out.columns.toSeq === Seq("page_id", "shard", "n_tokens",
      "start_off", "pack_id"))
    assert(out.count() === 6)
    // per shard: offsets start at 0, advance by exactly n_tokens, and
    // pack_id is start_off div seqLen
    out.collect().groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_off"))
      assert(sorted.head.getAs[Long]("start_off") === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_off") ===
            a.getAs[Long]("start_off") + a.getAs[Int]("n_tokens"))
        case _ => ()
      }
      sorted.foreach(r => assert(r.getAs[Long]("pack_id") ===
        r.getAs[Long]("start_off") / 16))
    }
    out.unpersist()
  }

  test("Embed.ivfTopK retrieves the probed blob's members") {
    val corpus = Seq(
      (1L, Seq(10.0f, 0.1f)), (2L, Seq(10.2f, 0.0f)),
      (3L, Seq(9.9f, 0.2f)), (4L, Seq(0.1f, 10.0f)),
      (5L, Seq(0.0f, 10.1f)), (6L, Seq(0.2f, 9.9f))).toDF("node", "vec")
    val queries = Seq((100L, Seq(10.0f, 0.15f))).toDF("node", "vec")
    // nprobe = nlist probes every cell, so IVF must equal the exact
    // brute-force ranking bit-for-bit — tests the cell/probe plumbing
    // without depending on where k-means splits the blobs
    val out = Embed.ivfTopK(corpus, queries, k = 3, nlist = 2,
      nprobe = 2, iters = 3, idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
    assert(out.columns.toSeq === Seq("q_id", "vec_id", "cos", "rank"))
    val got = out.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
        r.getAs[Double]("cos")))
    val exact = Embed.cosineTopK(corpus, queries, k = 3,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
        r.getAs[Double]("cos")))
    assert(got.sortBy(_._2).toSeq === exact.sortBy(_._2).toSeq)
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
    // a 1-cell probe still returns k rows from whichever cell it chose
    val narrow = Embed.ivfTopK(corpus, queries, k = 2, nlist = 2,
      nprobe = 1, iters = 3, idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
    assert(narrow.count() <= 2)
  }

  test("Ingest.buildIndexes + scoreBatch run the crawl loop on (page_id, site, body)") {
    val mk = (id: Long, site: String, body: String) => (id, site, body)
    val old = Seq(
      mk(1L, "wiki", "the quick brown fox jumps over the lazy dog and " +
        "runs far away into the green forest where the small animals " +
        "live and play all day long under a warm summer sun"),
      mk(2L, "wiki", "alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      mk(3L, "crawl", "completely different content about spark " +
        "catalyst plans optimizers and shuffles with many extra words " +
        "to pass length gates and a few more of the usual tokens here"))
      .toDF("page_id", "site", "body")
    val batch = Seq(
      mk(10L, "crawl", "the quick brown fox jumps over the lazy dog " +
        "and runs far away into the green forest where the small " +
        "animals live and play all day long under a warm summer sun"),
      mk(11L, "crawl", "entirely novel text mentioning catalyst " +
        "optimizers briefly while adding fresh unseen vocabulary like " +
        "zeppelin quasar nebula photon"))
      .toDF("page_id", "site", "body")
    val idx = Ingest.buildIndexes(old, target = "wiki", buckets = 64,
      idCol = "page_id", textCol = "body", srcCol = "site")
    assert(idx.contentKeys.count() === 3)
    assert(idx.bm25Stats.count() === 1)
    val rec = Ingest.scoreBatch(old, batch, idx, target = "wiki",
      buckets = 64, dfCap = 16,
      idCol = "page_id", textCol = "body", srcCol = "site")
    assert(rec.columns.take(2).toSeq === Seq("page_id", "site"))
    val rows = rec.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 2)
    // doc 10 is a verbatim copy of old doc 1: exact triage, dup flag
    assert(rows(10L).getAs[String]("triage") === "exact")
    assert(rows(10L).getAs[Int]("is_dup") === 1)
    assert(rows(10L).getAs[Long]("n_new_terms") === 0L)
    // doc 11 is novel, owns its unseen terms, and routes to the old
    // doc sharing its rare "catalyst optimizers" 3-gram neighborhood
    assert(rows(11L).getAs[String]("triage") === "novel")
    assert(rows(11L).getAs[Int]("is_dup") === 0)
    assert(rows(11L).getAs[Long]("n_new_terms") >= 4L)
  }

  test("Embed.rerankTopK with c = corpus size equals the exact ranking") {
    val corpus = Seq(
      (1L, Seq(10.0f, 0.1f)), (2L, Seq(10.2f, 0.0f)),
      (3L, Seq(9.9f, 0.2f)), (4L, Seq(0.1f, 10.0f)),
      (5L, Seq(0.0f, 10.1f)), (6L, Seq(0.2f, 9.9f))).toDF("node", "vec")
    val queries = Seq((100L, Seq(10.0f, 0.15f))).toDF("node", "vec")
    // candidate pool = whole corpus: stage 1 cannot lose recall, so the
    // exact re-rank must reproduce the brute-force ranking bit-for-bit
    val got = Embed.rerankTopK(corpus, queries, k = 3, c = 6,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    val exact = Embed.cosineTopK(corpus, queries, k = 3,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    assert(got.sortBy(_._1).toSeq === exact.sortBy(_._1).toSeq)
    // a narrow pool still returns k exact-scored rows
    val narrow = Embed.rerankTopK(corpus, queries, k = 2, c = 3,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
    assert(narrow.count() === 2)
    intercept[IllegalArgumentException] {
      Embed.rerankTopK(corpus, queries, k = 5, c = 3,
        idCol = "node", vecCol = "vec",
        queryIdCol = "node", queryVecCol = "vec")
    }
  }

  test("Embed.pqTopK with c = corpus size equals the exact ranking " +
      "on (node, vec)") {
    // two well-separated 4-dim blobs: subspace codebooks (m=2) learn
    // each axis pair, so ADC candidate generation keeps the true
    // neighborhood even at tiny ksub
    val corpus = Seq(
      (1L, Seq(10.0f, 0.1f, 0.0f, 0.1f)),
      (2L, Seq(10.2f, 0.0f, 0.1f, 0.0f)),
      (3L, Seq(9.9f, 0.2f, 0.0f, 0.2f)),
      (4L, Seq(0.1f, 10.0f, 9.9f, 0.0f)),
      (5L, Seq(0.0f, 10.1f, 10.0f, 0.1f)),
      (6L, Seq(0.2f, 9.9f, 10.2f, 0.0f))).toDF("node", "vec")
    val queries = Seq((100L, Seq(10.0f, 0.15f, 0.05f, 0.1f)))
      .toDF("node", "vec")
    // candidate pool = whole corpus: ADC cannot lose recall, so the
    // exact re-rank must reproduce the brute-force ranking bit-for-bit
    val got = Embed.pqTopK(corpus, queries, k = 3, m = 2, ksub = 4,
      iters = 2, c = 6, idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    val exact = Embed.cosineTopK(corpus, queries, k = 3,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    assert(got.sortBy(_._1).toSeq === exact.sortBy(_._1).toSeq)
    // m must divide the dimension; ragged/misaligned splits fail loudly
    intercept[IllegalArgumentException] {
      Embed.pqTopK(corpus, queries, k = 2, m = 3, ksub = 4, c = 3,
        idCol = "node", vecCol = "vec",
        queryIdCol = "node", queryVecCol = "vec")
    }
    intercept[IllegalArgumentException] {
      Embed.pqTopK(corpus, queries, k = 5, c = 3,
        idCol = "node", vecCol = "vec",
        queryIdCol = "node", queryVecCol = "vec")
    }
  }

  test("Embed.pqSearch over pqCodebooks/pqEncode frames equals the " +
      "session pqTopK") {
    val corpus = Seq(
      (1L, Seq(10.0f, 0.1f, 0.0f, 0.1f)),
      (2L, Seq(10.2f, 0.0f, 0.1f, 0.0f)),
      (3L, Seq(9.9f, 0.2f, 0.0f, 0.2f)),
      (4L, Seq(0.1f, 10.0f, 9.9f, 0.0f)),
      (5L, Seq(0.0f, 10.1f, 10.0f, 0.1f)),
      (6L, Seq(0.2f, 9.9f, 10.2f, 0.0f))).toDF("node", "vec")
    val queries = Seq((100L, Seq(10.0f, 0.15f, 0.05f, 0.1f)),
      (101L, Seq(0.1f, 9.8f, 10.1f, 0.05f))).toDF("node", "vec")
    // the frozen-artifact path: codebooks + codes + exact payload as
    // standalone frames (what q120 persists), searched cold
    val cb = Embed.pqCodebooks(corpus, m = 2, ksub = 4, iters = 2,
      idCol = "node", vecCol = "vec")
    val codes = Embed.pqEncode(corpus, cb, m = 2,
      idCol = "node", vecCol = "vec")
    assert(codes.columns.toSeq === Seq("vec_id", "c0", "c1"))
    val exact = Embed.normalize(corpus, "node", "vec")
    val frozen = Embed.pqSearch(codes, cb, exact, queries, k = 3,
      c = 6, m = 2, queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).sorted
    val session = Embed.pqTopK(corpus, queries, k = 3, m = 2, ksub = 4,
      iters = 2, c = 6, idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).sorted
    assert(frozen.toSeq === session.toSeq)
  }

  test("Embed.ivfPqTopK with all cells probed and c = corpus equals " +
      "the exact ranking") {
    val corpus = Seq(
      (1L, Seq(10.0f, 0.1f, 0.0f, 0.1f)),
      (2L, Seq(10.2f, 0.0f, 0.1f, 0.0f)),
      (3L, Seq(9.9f, 0.2f, 0.0f, 0.2f)),
      (4L, Seq(0.1f, 10.0f, 9.9f, 0.0f)),
      (5L, Seq(0.0f, 10.1f, 10.0f, 0.1f)),
      (6L, Seq(0.2f, 9.9f, 10.2f, 0.0f))).toDF("node", "vec")
    val queries = Seq((100L, Seq(10.0f, 0.15f, 0.05f, 0.1f)))
      .toDF("node", "vec")
    // nprobe = nlist and c = corpus: neither the router nor the
    // candidate cut can lose recall — the composition must reproduce
    // the brute-force ranking bit-for-bit
    val got = Embed.ivfPqTopK(corpus, queries, k = 3, nlist = 2,
      nprobe = 2, m = 2, ksub = 4, iters = 2, c = 6,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    val exact = Embed.cosineTopK(corpus, queries, k = 3,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    assert(got.sortBy(_._1).toSeq === exact.sortBy(_._1).toSeq)
    // nprobe = 1 on two far blobs: the query's own blob still surfaces
    val routed = Embed.ivfPqTopK(corpus, queries, k = 2, nlist = 2,
      nprobe = 1, m = 2, ksub = 4, iters = 2, c = 6,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(routed.subsetOf(Set(1L, 2L, 3L)),
      s"nprobe=1 surfaced the wrong blob: $routed")
  }

  test("Embed.pqSearch with cellProbes over frozen frames equals the " +
      "session ivfPqTopK") {
    val corpus = Seq(
      (1L, Seq(10.0f, 0.1f, 0.0f, 0.1f)),
      (2L, Seq(10.2f, 0.0f, 0.1f, 0.0f)),
      (3L, Seq(9.9f, 0.2f, 0.0f, 0.2f)),
      (4L, Seq(0.1f, 10.0f, 9.9f, 0.0f)),
      (5L, Seq(0.0f, 10.1f, 10.0f, 0.1f)),
      (6L, Seq(0.2f, 9.9f, 10.2f, 0.0f))).toDF("node", "vec")
    val queries = Seq((100L, Seq(10.0f, 0.15f, 0.05f, 0.1f)),
      (101L, Seq(0.1f, 9.8f, 10.1f, 0.05f))).toDF("node", "vec")
    // the q123 artifact shapes as standalone frames: router centroids,
    // codebooks, cell-routed codes, exact payload — searched cold
    val e = Embed.normalize(corpus, "node", "vec")
    val router = graft.queries.Embeddings.kmeansCentroids(
      e.localCheckpoint(), 2, 2, capture = false)
    val cb = Embed.pqCodebooks(corpus, m = 2, ksub = 4, iters = 2,
      idCol = "node", vecCol = "vec")
    val codes = Embed.pqEncode(corpus, cb, m = 2,
        idCol = "node", vecCol = "vec")
      .join(Embed.assignCells(corpus, router, "node", "vec"),
        Seq("vec_id"))
    val probes = Embed.cellProbes(queries, router, nprobe = 1,
      queryIdCol = "node", queryVecCol = "vec")
    val frozen = Embed.pqSearch(codes, cb, e, queries, k = 3, c = 6,
      m = 2, queryIdCol = "node", queryVecCol = "vec",
      probes = Some(probes))
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).sorted
    val session = Embed.ivfPqTopK(corpus, queries, k = 3, nlist = 2,
      nprobe = 1, m = 2, ksub = 4, iters = 2, c = 6,
      idCol = "node", vecCol = "vec",
      queryIdCol = "node", queryVecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).sorted
    assert(frozen.toSeq === session.toSeq)
    // nprobe=1 routing is actually restrictive: each query surfaces
    // only its own blob's members
    assert(frozen.filter(_._1 == 100L).map(_._3).toSet
      .subsetOf(Set(1L, 2L, 3L)))
    assert(frozen.filter(_._1 == 101L).map(_._3).toSet
      .subsetOf(Set(4L, 5L, 6L)))
  }

  test("Embed.semdedupKeep drops the near-identical cluster-mate only") {
    val blobs = Seq(
      (1L, Seq(10.0f, 0.1f)), (2L, Seq(10.0f, 0.1f)), // dup of 1
      (3L, Seq(7.0f, 7.2f)), // same half-space, far from 1 in angle
      (4L, Seq(0.1f, 10.0f)), (5L, Seq(0.12f, 10.0f)), // dup of 4
      (6L, Seq(-9.9f, 0.2f))).toDF("node", "vec")
    val out = Embed.semdedupKeep(blobs, k = 2, iters = 3, tau = 0.99,
      idCol = "node", vecCol = "vec")
    assert(out.columns.toSeq === Seq("node", "cluster", "kept",
      "dropped_by"))
    val kept = out.collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept.size === 6)
    assert(!kept(2L), "exact angular dup of node 1 survived")
    assert(!kept(5L), "near-dup of node 4 survived")
    assert(Seq(1L, 3L, 4L, 6L).forall(kept), "a non-dup was dropped")
  }

  test("Text.bpeVocab learns the canonical Sennrich merge sequence") {
    // the worked example of the BPE paper (arXiv:1508.07909 §3.2 uses
    // low/lower/newest/widest); expected sequence computed by an
    // independent reference implementation with the same total
    // tie-break (freq DESC, left ASC, right ASC)
    val corpus = ("low " * 5 + "lower " * 2 + "newest " * 6 +
      "widest " * 3).trim
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val out = Text.bpeVocab(docs, nMerges = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L), (5L, "lo", "w", 7L), (6L, "e", "w", 6L),
      (7L, "ew", "est</w>", 6L), (8L, "n", "ewest</w>", 6L),
      (9L, "low", "</w>", 5L), (10L, "d", "est</w>", 3L)))
    // word frequency weighting: the same corpus as distinct documents
    // per occurrence learns the same merges (weights via cnt)
    val docs2 = corpus.split(" ").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("doc_id", "text")
    val out2 = Text.bpeVocab(docs2, nMerges = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out2.toSeq === out.toSeq)
    // determinism under re-planning
    val out3 = Text.bpeVocab(docs.repartition(7), nMerges = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out3.toSeq === out.toSeq)
    intercept[IllegalArgumentException] { Text.bpeVocab(docs, 0) }
    intercept[IllegalArgumentException] {
      Text.bpeVocab(docs, 3, endMark = "a b")
    }
  }

  test("Text.bpeVocab minFreq stops the loop once the best pair is " +
      "below threshold") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val out = Text.bpeVocab(docs, nMerges = 50, minFreq = 2L).collect()
    // (a,b) freq 2 merges; ab</w> freq 2 merges; everything else is 1
    assert(out.forall(_.getLong(3) >= 2L))
    assert(out.length === 2)
  }

  test("Text.bpeEncode applies a trained merge list as one projection " +
      "and never crosses word boundaries") {
    val corpus = ("low " * 5 + "lower " * 2 + "newest " * 6 +
      "widest " * 3).trim
    val train = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = Text.bpeVocab(train, nMerges = 10).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = Seq((1L, "low lower newest"), (2L, "lowest wide"))
      .toDF("doc_id", "text")
    val out = Text.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // reference-implementation expectations (word-local application)
    assert(out(1L)._1 === "low</w> low e r </w> newest</w>")
    assert(out(1L)._2 === 6)
    assert(out(2L)._1 === "low est</w> w i d e </w>")
    assert(out(2L)._2 === 7)
    // single projection: no exchange, no generator in the plan
    val plan = Text.bpeEncode(docs, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bpeEncode shuffled:\n$plan")
  }

  test("Text.wordpieceVocab scores merges by likelihood, not raw count " +
      "— the rare-but-exclusive pair wins (hand-computed example)") {
    // hug×3 pug pun hun hugs: the FIRST WordPiece merge is (##g, ##s)
    // with pair count 1 — its score 2^30/(5·1) beats every count-5
    // pair's 2^30·5/(5·7) because ##s occurs nowhere else; plain BPE
    // (bpeVocab) would pick a count-5 pair. Full 6-merge sequence and
    // the exact integer scores hand-computed from the definition.
    val docs = Seq((1L, "hug hug hug pug pun hun hugs"))
      .toDF("doc_id", "text")
    val out = Text.wordpieceVocab(docs, nMerges = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "##g", "##s", 1L, 214748364L),
      (2L, "h", "##u", 5L, 153391689L),  // tie on score → freq wins
      (3L, "p", "##u", 2L, 536870912L),
      (4L, "pu", "##n", 1L, 268435456L),
      (5L, "pu", "##g", 1L, 268435456L),
      (6L, "hu", "##g", 3L, 214748364L)))
    // determinism under re-planning
    val out3 = Text.wordpieceVocab(docs.repartition(7), nMerges = 6)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out3.toSeq === out.toSeq)
    intercept[IllegalArgumentException] { Text.wordpieceVocab(docs, 0) }
  }

  test("Text.wordpieceEncode is greedy longest-match-first with the " +
      "[UNK] contract (OOV chars, over-long words)") {
    val train = Seq((1L, "hug hug hug pug pun hun hugs"))
      .toDF("doc_id", "text")
    val merges = Text.wordpieceVocab(train, nMerges = 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val inv = Text.wordpieceInventory(train, merges)
    val invSet = inv.collect().map(_.getString(0)).toSet
    // singles (bare + continuations) ∪ merged pieces
    assert(invSet === Set("h", "p", "##u", "##g", "##n", "##s",
      "##gs", "hu", "pu", "pun", "pug", "hug"))
    val docs = Seq((1L, "hug hugs pun hun"), (2L, "bug hughug hug"))
      .toDF("doc_id", "text")
    val out = Text.wordpieceEncode(docs, inv, maxWordLen = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // greedy ≠ merge replay: "hugs" takes the LONGEST prefix hug then
    // ##s (never hu + ##gs, even though ##gs was merge 1)
    assert(out(1L) === ((6L, 0L, "hug hug ##s pun hu ##n")))
    // 'b' has no piece → whole word [UNK]; len 6 > maxWordLen 4 → [UNK]
    assert(out(2L) === ((3L, 2L, "[UNK] [UNK] hug")))
    // empty merge list: inventory = singles, every word char-splits
    val charInv = Text.wordpieceInventory(train, Seq.empty)
    val charOut = Text.wordpieceEncode(
        Seq((1L, "hug")).toDF("doc_id", "text"), charInv, 4)
      .collect().head
    assert(charOut.getString(3) === "h ##u ##g")
    // the corpus assembly join must broadcast the word-token table
    val plan = Text.wordpieceEncode(docs, inv, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"wordpiece corpus join did not broadcast:\n$plan")
  }

  test("Dedup.spanDups merges duplicated-gram positions into maximal " +
      "extents (overlap, adjacency, within-doc repetition)") {
    val docs = Seq(
      // d1/d2 share the 6-word span S1..S6 → two overlapping dup
      // 5-grams each, merging into ONE extent of 6 tokens
      (1L, "a1 a2 S1 S2 S3 S4 S5 S6 a3 a4"),
      (2L, "b1 b2 b3 S1 S2 S3 S4 S5 S6 b4"),
      (3L, "z1 z2 z3 z4 z5 z6"), // fully novel → zeros
      (4L, "too short"),          // < k words → excluded
      // d5: the same 5-gram twice WITHIN one doc (gap 6 > k) → two
      // separate extents; within-doc repetition counts as duplication
      (5L, "R1 R2 R3 R4 R5 m R1 R2 R3 R4 R5"),
      // d6/d7 share two 5-grams; in d6 they sit at gap exactly k
      // (adjacent intervals [1,5]+[6,10] → merge to one 10-token
      // extent), in d7 at gap k+1 (two 5-token extents)
      (6L, "T1 T2 T3 T4 T5 U1 U2 U3 U4 U5"),
      (7L, "T1 T2 T3 T4 T5 x U1 U2 U3 U4 U5"))
      .toDF("page_id", "body")
    val out = Dedup.spanDups(docs, k = 5, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L, 6L, 7L))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L) === ((1L, 6L, 1L, 6L, 0.6d)))
    assert(m(2L) === ((2L, 6L, 1L, 6L, 0.6d)))
    assert(m(3L) === ((3L, 2L, 0L, 0L, 0.0d)))
    assert(m(5L) === ((5L, 7L, 2L, 10L, 10.0d / 11)))
    assert(m(6L) === ((6L, 6L, 1L, 10L, 1.0d)))
    assert(m(7L) === ((7L, 7L, 2L, 10L, 10.0d / 11)))
    intercept[IllegalArgumentException] { Dedup.spanDups(docs, k = 1) }
    intercept[IllegalArgumentException] {
      Dedup.spanDups(docs, minCount = 1L)
    }
    // the gram generator is one projection: a single Generate riding
    // the scan, and the only Exchange is the doc_id spread
    val plan = Dedup.spanGramRows(docs, 5, "page_id", "body")
      .queryExecution.executedPlan.toString
    assert(plan.sliding("Generate".length).count(_ == "Generate") === 1,
      s"spanGramRows should have exactly one generator:\n$plan")
    assert(!plan.contains("Window"),
      s"spanGramRows must not window-sort the corpus:\n$plan")
  }

  test("Dedup.spanDupScore scores a batch against the frozen gram " +
      "inventory only (batch-internal repetition does not count)") {
    val base = Seq((1L, "a1 a2 S1 S2 S3 S4 S5 S6 a3 a4"))
      .toDF("page_id", "body")
    val inventory = Dedup.spanGramFrame(base, k = 5, idCol = "page_id",
      textCol = "body")
    val batch = Seq(
      (10L, "n1 S1 S2 S3 S4 S5 S6 n2"),  // base span present → 1 extent
      (11L, "v1 v2 v3 v4 v5 v6"),        // novel → zeros
      // 12/13 share a NOVEL span: against the frozen set neither hits
      (12L, "K1 K2 K3 K4 K5 w1 w2"),
      (13L, "K1 K2 K3 K4 K5 y1 y2"))
      .toDF("page_id", "body")
    val out = Dedup.spanDupScore(batch, inventory, k = 5,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(10L) === ((10L, 4L, 1L, 6L, 0.75d)))
    assert(m(11L) === ((11L, 2L, 0L, 0L, 0.0d)))
    assert(m(12L) === ((12L, 3L, 0L, 0L, 0.0d)))
    assert(m(13L) === ((13L, 3L, 0L, 0L, 0.0d)))
    // spanDups over the SAME batch (session form) DOES count the
    // batch-internal 12/13 duplication — the two forms differ exactly
    // on novelty attribution
    val sess = Dedup.spanDups(batch, k = 5, idCol = "page_id",
        textCol = "body").orderBy("page_id").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sess(12L) === 1L && sess(13L) === 1L)
  }

  test("frozen BPE merges compress trained words and leave novel words " +
      "fragmented (the q133 fertility-drift contract)") {
    val train = Seq((1L, ("low " * 5 + "lower " * 2 + "newest " * 6 +
      "widest " * 3).trim)).toDF("doc_id", "text")
    val merges = Text.bpeVocab(train, nMerges = 10).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val batch = Seq((10L, "low newest"), (11L, "qqqq wxyz"))
      .toDF("doc_id", "text")
    val enc = Text.bpeEncode(batch, merges).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // trained: low</w> newest</w> (1 token/word); novel words stay
    // char-level (q q q q </w> = 5, w x y z </w> = 5) — fertility
    // separates them 5x
    assert(enc(10L) === 2, s"trained words should stay 1 token/word: $enc")
    assert(enc(11L) === 10, s"novel words should stay char-level: $enc")
    // word-boundedness (the r12→r13 fix): ADJACENT identical merged
    // words used to share one boundary space, and the literal replace
    // scan resumed past it — the second 'low' kept a split end marker.
    // The double-boundary-space stream makes application word-local
    // exactly like reference BPE encoders (see the bpeEncode docs).
    val adj = Text.bpeEncode(
      Seq((12L, "low low")).toDF("doc_id", "text"), merges).head()
    assert(adj.getString(1) === "low</w> low</w>" &&
      adj.getInt(2) === 2)
    // three in a row — every occurrence merges
    val adj3 = Text.bpeEncode(
      Seq((13L, "low low low")).toDF("doc_id", "text"), merges).head()
    assert(adj3.getString(1) === "low</w> low</w> low</w>" &&
      adj3.getInt(2) === 3)
  }

  test("Dedup.spanTrim removes duplicated extents and reassembles the " +
      "survivors in position order") {
    val docs = Seq(
      (1L, "a1 a2 S1 S2 S3 S4 S5 S6 a3 a4"),  // span S1..S6 cut
      (2L, "b1 b2 b3 S1 S2 S3 S4 S5 S6 b4"),
      (3L, "z1 z2 z3 z4 z5 z6"),               // novel → untouched
      (4L, "too short"),                        // < k words → untouched
      (5L, "S1 S2 S3 S4 S5 S6"))                // fully duplicated → empty
      .toDF("page_id", "body")
    val out = Dedup.spanTrim(docs, k = 5, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L) === ((1L, 10L, 6L, "a1 a2 a3 a4")))
    assert(m(2L) === ((2L, 10L, 6L, "b1 b2 b3 b4")))
    assert(m(3L) === ((3L, 6L, 0L, "z1 z2 z3 z4 z5 z6")))
    assert(m(4L) === ((4L, 2L, 0L, "too short")),
      "sub-k docs must pass through untrimmed")
    assert(m(5L) === ((5L, 6L, 6L, "")),
      "a fully-duplicated doc must come out empty")
    // trim composes with spanDups: every doc's n_removed equals its
    // dup_tokens from the signal op under the same (k, minCount)
    val sig = Dedup.spanDups(docs, k = 5, idCol = "page_id",
        textCol = "body").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sig.forall { case (id, dt) => m(id)._3 === dt })
    intercept[IllegalArgumentException] { Dedup.spanTrim(docs, k = 1) }
  }

  test("Dedup.crossSourceOverlap reports the full source-pair matrix " +
      "with shared-gram Jaccard") {
    val docs = Seq(
      (1L, "A", "S1 S2 S3 S4 S5 x1 x2"),
      (2L, "B", "y1 S1 S2 S3 S4 S5 y2"),
      (3L, "C", "c1 c2 c3 c4 c5 c6"))
      .toDF("page_id", "site", "body")
    val out = Dedup.crossSourceOverlap(docs, k = 5, idCol = "page_id",
        textCol = "body", srcCol = "site")
      .orderBy("src1", "src2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // A: 3 distinct grams, B: 3, C: 2; A∩B = {S1..S5} only
    assert(out.toSeq === Seq(
      ("A", "B", 1L, 3L, 3L, 0.2d),
      ("A", "C", 0L, 3L, 2L, 0.0d),
      ("B", "C", 0L, 3L, 2L, 0.0d)),
      "zero-overlap pairs must appear in the matrix")
    intercept[IllegalArgumentException] {
      Dedup.crossSourceOverlap(docs, k = 1)
    }
    // the inventory form tolerates appended duplicates: the artifact
    // appended to itself yields the exact from-scratch matrix
    val sg = Dedup.sourceGramFrame(docs, k = 5, idCol = "page_id",
      textCol = "body", srcCol = "site")
    val appended = Dedup.crossSourceOverlapOf(sg.unionByName(sg))
      .orderBy("src1", "src2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(appended.toSeq === out.toSeq)
  }

  test("Retrieval.rrfFuse sums reciprocal-rank ppm across rankings " +
      "with the (score, doc) total order") {
    val r1 = Seq((1L, 1L, 1L), (1L, 2L, 2L), (2L, 5L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val r2 = Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(r1, r2), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q1 = out.filter(_._1 == 1L).map(r => (r._2, r._3, r._4))
    // doc 2 fuses both lists (16393 + 16129); docs 1/3 one each
    assert(q1.toSeq === Seq((1L, 2L, 32522L), (2L, 1L, 16393L),
      (3L, 3L, 16129L)))
    // rank-1 tie across lists breaks by doc_id ascending
    val q2 = out.filter(_._1 == 2L).map(r => (r._2, r._3, r._4))
    assert(q2.toSeq === Seq((1L, 4L, 16393L), (2L, 5L, 16393L)))
    // k cuts the fused list
    assert(Retrieval.rrfFuse(Seq(r1, r2), k = 2)
      .where(col("query_id") === 1L).count() === 2L)
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil) }
  }

  test("Curate.sourceBudget cuts each source to its own token budget " +
      "in deterministic hash order") {
    val docs = Seq(
      (1L, "A", "one two three four five six seven eight"),
      (2L, "A", "alpha beta gamma delta epsilon zeta"),
      (3L, "A", "lorem ipsum dolor sit amet consectetur"),
      (4L, "B", "big corpus line with quite a few words here"),
      (5L, "B", "another line of text for source b"),
      (6L, "C", "unbudgeted source never appears"))
      .toDF("page_id", "site", "body")
    val budgets = Map("A" -> 14L, "B" -> 1000L)
    val out = Curate.sourceBudget(docs, budgets, idCol = "page_id",
        textCol = "body", srcCol = "site")
      .orderBy("site", "cum").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.forall(_._2 != "C"), "unbudgeted source leaked through")
    val a = out.filter(_._2 == "A")
    assert(a.nonEmpty && a.last._4 <= 14L,
      s"source A exceeded its budget: ${a.toSeq}")
    assert(a.size < 3, "the A budget should cut at least one doc")
    val b = out.filter(_._2 == "B")
    assert(b.size === 2, "source B's ample budget must keep everything")
    // cum is the exact within-source running total in (hash, id) order
    assert(b.map(_._3).sum === b.last._4)
    // equivalence with the single-source op under the same budget:
    // per-source cut == tokenBudget over that source alone
    val aAlone = Curate.tokenBudget(
        docs.where(col("site") === "A"), 14L,
        idCol = "page_id", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.map(r => (r._1, r._4)).toSeq === aAlone.toSeq)
    intercept[IllegalArgumentException] {
      Curate.sourceBudget(docs, Map.empty[String, Long])
    }
  }

  test("Dedup.winnow selects the rightmost window minimum and holds " +
      "the coverage guarantee") {
    // 12 tokens → 8 grams (k=5) → 5 full windows at w=4
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"),
      (2L, "a b c d e f g h"),  // 4 grams = exactly one window
      (3L, "too few words"))    // < k+w−1: no full window
      .toDF("page_id", "body")
    val out = Dedup.winnow(docs, k = 5, w = 4, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(!out.exists(_._1 == 3L), "sub-window doc produced fingerprints")
    val d2 = out.filter(_._1 == 2L)
    assert(d2.size === 1, "a single window must select exactly one gram")
    // coverage: every w-window of doc 1's grams contains a selection
    val sel1 = out.filter(_._1 == 1L).map(_._2).toSet
    assert((1 to 5).forall(p => (p until p + 4).exists(sel1)),
      s"a window has no fingerprint: $sel1")
    // density: selections ≤ windows, ≥ 1
    assert(sel1.nonEmpty && sel1.size <= 5)
    // determinism under re-planning
    val out2 = Dedup.winnow(docs.repartition(7), k = 5, w = 4,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out2.toSeq === out.toSeq)
    intercept[IllegalArgumentException] { Dedup.winnow(docs, k = 1) }
    intercept[IllegalArgumentException] { Dedup.winnow(docs, w = 0) }
  }

  test("Text.readability computes Flesch reading ease with the " +
      "documented deterministic heuristics") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),     // 6 words, 2 sents, 6 syll
      (2L, "no terminator here at all"),     // 5 words, 1 sent (floor)
      (3L, "zzz xxx qqq"))                   // vowel-less: 0 syllables
      .toDF("page_id", "body")
    val out = Text.readability(docs, "page_id", "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L)._2 === 6L && m(1L)._3 === 2L && m(1L)._4 === 6L)
    assert(math.abs(m(1L)._5 -
      (206.835d - 1.015d * 3.0d - 84.6d * 1.0d)) < 1e-12)
    assert(m(2L)._3 === 1L, "terminator-free doc must count 1 sentence")
    assert(m(3L)._4 === 0L, "vowel-less tokens contribute 0 syllables")
    // one projection riding the scan: no shuffle
    val plan = Text.readability(docs, "page_id", "body")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"readability shuffled:\n$plan")
  }

  test("Embed.dimStats reports exact per-dimension stats and flags " +
      "dead dimensions") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.5f, 2.0f)),
      (2L, Array(3.0f, 0.5f, -2.0f)),
      (3L, Array(5.0f, 0.5f, 0.0f)))
      .toDF("eid", "vec")
    val out = Embed.dimStats(vecs, idCol = "eid", vecCol = "vec")
      .orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out.forall(_._2 == 3L))
    // dim 1: values 1,3,5 -> mean 3, pop var 8/3 (exact in fixed point)
    assert(out(0)._3 === 3.0d)
    assert(math.abs(out(0)._4 - 8.0d / 3.0d) < 1e-12)
    assert(out(0)._5 === 1.0d && out(0)._6 === 5.0d && !out(0)._7)
    // dim 2 is constant -> dead, zero variance
    assert(out(1)._7 && out(1)._4 === 0.0d && out(1)._3 === 0.5d)
    // dim 3: mean 0, var (4+4+0)/3
    assert(out(2)._3 === 0.0d)
    assert(math.abs(out(2)._4 - 8.0d / 3.0d) < 1e-12)
    // determinism under re-planning
    val a = Embed.dimStats(vecs, "eid", "vec").orderBy("dim")
      .collect().toSeq
    val b = Embed.dimStats(vecs.repartition(7), "eid", "vec")
      .orderBy("dim").collect().toSeq
    assert(a === b)
  }

  test("Embed.dimStatsFrame/Merge/Finalize: incremental merge equals " +
      "the from-scratch report bit-for-bit") {
    val vecs = (1L to 40L).map(i =>
      (i, Array(i.toFloat / 7f, (i % 5).toFloat, -i.toFloat / 3f)))
      .toDF("vec_id", "embedding")
    val full = Embed.dimStats(vecs).orderBy("dim").collect().toSeq
    // split at an arbitrary cut, in both orders, and at a second cut
    for (cut <- Seq(13L, 32L)) {
      val a = Embed.dimStatsFrame(vecs.where($"vec_id" < cut))
      val b = Embed.dimStatsFrame(vecs.where($"vec_id" >= cut))
      val m1 = Embed.dimStatsFinalize(Embed.dimStatsMerge(a, b))
        .orderBy("dim").collect().toSeq
      val m2 = Embed.dimStatsFinalize(Embed.dimStatsMerge(b, a))
        .orderBy("dim").collect().toSeq
      assert(m1 === full, s"merge(cut=$cut) != from-scratch")
      assert(m2 === full, s"merge order mattered at cut=$cut")
    }
    // merged frame schema is the frame schema (re-mergeable)
    val fa = Embed.dimStatsFrame(vecs.where($"vec_id" < 13L))
    val fb = Embed.dimStatsFrame(vecs.where($"vec_id" >= 13L))
    val merged = Embed.dimStatsMerge(fa, fb)
    assert(merged.schema.fieldNames.toSeq ===
      fa.schema.fieldNames.toSeq)
    assert(merged.schema("sfp").dataType.typeName.startsWith("decimal"))
  }

  test("Embed.normOutliers assigns exact boundary-invariant global " +
      "ranks and rank-quantile flags") {
    // 20 vectors with norms 1..20 (vector (i, 0)): ranks are the ids
    val vecs = (1 to 20).map(i => (i.toLong, Array(i.toFloat, 0.0f)))
      .toDF("eid", "vec")
    val out = Embed.normOutliers(vecs, loPct = 10, hiPct = 90,
        idCol = "eid", vecCol = "vec")
      .orderBy("eid").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getString(3)))
    assert(out.map(_._3).toSeq === (1L to 20L), "ranks must be 1..20")
    assert(out.map(_._2).toSeq === (1 to 20).map(_.toDouble), "norms")
    val flags = out.map(r => r._1 -> r._4).toMap
    // n=20, lo 10% -> 2 low, hi 90% -> 2 high
    assert(Seq(1L, 2L).forall(flags(_) == "low"))
    assert(Seq(19L, 20L).forall(flags(_) == "high"))
    assert((3L to 18L).forall(flags(_) == "keep"))
    // determinism under re-planning (different partitioning/boundaries)
    val out2 = Embed.normOutliers(vecs.repartition(7), 10, 90,
        "eid", "vec")
      .orderBy("eid").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getString(3)))
    assert(out2.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Embed.normOutliers(vecs, 50, 50, "eid", "vec") }
  }

  test("Dedup.winnowScore scores batch novelty against the frozen " +
      "winnowed-fingerprint inventory") {
    val snap = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("page_id", "body")
    val fpSet = Dedup.winnowFrame(snap, k = 5, w = 4,
      idCol = "page_id", textCol = "body")
    val batch = Seq(
      // exact copy of snapshot doc 1 -> every fingerprint hits
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // fully novel -> zero hits
      (11L, "red orange yellow green blue indigo violet cyan magenta pink"),
      // shares an 8-token (= w+k-1) span with doc 2 -> >= 1 hit
      (12L, "zzz one two three four five six seven eight qqq rrr sss"),
      (13L, "too short here"))
      .toDF("page_id", "body")
    val out = Dedup.winnowScore(batch, fpSet, k = 5, w = 4,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val m = out.map(r => r._1 -> r).toMap
    assert(!m.contains(13L), "sub-window doc must produce no row")
    assert(m(10L)._4 === 1.0d, "exact copy must hit every fingerprint")
    assert(m(11L)._3 === 0L && m(11L)._4 === 0.0d, "novel doc must miss")
    assert(m(12L)._3 >= 1L,
      s"a shared w+k-1 span must guarantee a hit: ${m(12L)}")
    assert(out.forall(r => r._3 <= r._2), "hits cannot exceed fingerprints")
    // determinism under re-planning
    val out2 = Dedup.winnowScore(batch.repartition(7),
        Dedup.winnowFrame(snap.repartition(5), 5, 4, "page_id", "body"),
        k = 5, w = 4, idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out2.toSeq === out.toSeq)
  }

  test("Text.repetition scores within-doc n-gram repetition with the " +
      "documented clipped fractions") {
    val docs = Seq(
      (1L, "a a a a"),                      // top1 4/4; top2 "a a"×3 → clip
      (2L, "x y x y x y z q r s t u"),      // 12 words, top2 "x y"×3 → 0.5
      (3L, "one two three four"),           // all unique, < 5 words
      (4L, "p q r s t p q r s t p q"),      // 5-gram "p q r s t" twice
      (5L, "   "), (6L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val out = Text.repetition(docs, Seq(1, 2, 3), k = 5,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val m = out.map(r => r._1 -> r).toMap
    assert(!m.contains(5L) && !m.contains(6L), "blank/null doc kept")
    assert(m(1L)._3 === 1.0d, "top1 of 'a a a a' must be 1.0")
    assert(m(1L)._4 === 1.0d, "overlapping top2 must clip at 1.0")
    assert(m(2L)._4 === 0.5d, "'x y'x3 over 12 words = 0.5")
    assert(m(3L)._3 === 0.25d && m(3L)._6 === 0.0d,
      "unique words: top1 1/4, no 5-grams -> dup5 0")
    // doc 4: 8 5-gram positions; the rotations of 'p q r s t' at
    // pos 1..3 repeat at pos 6..8 -> 6 duplicated positions / 8
    assert(m(4L)._6 === 0.75d, s"dup5 of doc 4: ${m(4L)._6}")
    // determinism under re-planning
    val out2 = Text.repetition(docs.repartition(7), Seq(1, 2, 3), k = 5,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out2.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Text.repetition(docs, Seq(2, 1), idCol = "page_id") }
    intercept[IllegalArgumentException] {
      Text.repetition(docs, Seq(1), k = 1, idCol = "page_id") }
  }

  test("Curate.mixtureWeights renormalizes per-key token counts with " +
      "exact fixed-point temperature scaling") {
    val docs = Seq(
      ("web", "aaaa bbbb cccc dddd"),     // 4 tokens
      ("web", "eeee ffff gggg hhhh " * 3), // 12 tokens -> web 16
      ("book", "aaaa bbbb cccc dddd"))     // book 4
      .toDF("src", "body")
    val out = Curate.mixtureWeights(docs, alpha = 0.5d,
        keyCol = "src", textCol = "body")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m("web")._2 === 16L && m("book")._2 === 4L)
    // sqrt(16)=4, sqrt(4)=2 -> fixed-point 4·2^20, 2·2^20 -> 2/3, 1/3
    assert(m("web")._3 === 4L * 1048576L && m("book")._3 === 2L * 1048576L)
    assert(m("web")._4 === 4.0d / 6.0d && m("book")._4 === 2.0d / 6.0d)
    // alpha=1 reproduces the natural distribution; alpha=0 is uniform
    val nat = Curate.mixtureWeights(docs, 1.0d, "src", "body")
      .orderBy("src").collect().map(r => r.getString(0) -> r.getDouble(3))
      .toMap
    assert(nat("web") === 16.0d / 20.0d && nat("book") === 4.0d / 20.0d)
    val uni = Curate.mixtureWeights(docs, 0.0d, "src", "body")
      .collect().map(_.getDouble(3)).toSeq
    assert(uni === Seq(0.5d, 0.5d))
    // determinism under re-planning
    val a = Curate.mixtureWeights(docs, 0.5d, "src", "body")
      .orderBy("src").collect().toSeq
    val b = Curate.mixtureWeights(docs.repartition(7), 0.5d, "src", "body")
      .orderBy("src").collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Curate.mixtureWeights(docs, 0.3d, "src", "body") }
  }

  test("mixtureWeights -> sourceBudget composition keeps every source " +
      "under its solved budget") {
    val docs = Seq(
      ("web", 1L, "aaaa bbbb cccc dddd eeee ffff"),
      ("web", 2L, "gggg hhhh iiii jjjj kkkk llll"),
      ("web", 3L, "mmmm nnnn oooo pppp qqqq rrrr"),
      ("book", 4L, "ssss tttt uuuu vvvv wwww xxxx"))
      .toDF("src", "id", "body")
    val total = 12L
    val w = Curate.mixtureWeights(docs, 0.5d, "src", "body")
    val budgets = w.select(col("src"),
        floor(col("weight") * total).cast("long").as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // web 18 tokens, book 6: sqrt-temper -> weights
    // sqrt(18)≈4.2426, sqrt(6)≈2.4495 -> web ≈ .634, book ≈ .366
    assert(budgets("web") === 7L && budgets("book") === 4L,
      s"solved budgets: $budgets")
    val kept = Curate.sourceBudget(docs, budgets, idCol = "id",
        textCol = "body", srcCol = "src")
      .groupBy(col("src")).agg(max(col("cum")).as("used"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.forall { case (s, used) => used <= budgets(s) },
      s"budget exceeded: $kept vs $budgets")
    // 6-token docs: one fits web's budget of 7; none fit book's 4
    assert(kept("web") === 6L && !kept.contains("book"))
  }

  test("Text.wordVectors: top-V PPMI factorized to k exact fixed-point " +
      "components, partition-invariant") {
    val docs = Seq(
      (1L, "cat dog cat dog mouse cat dog"),
      (2L, "red blue red blue green red blue red"),
      (3L, "cat dog mouse green blue red cat dog"),
      (4L, "dog cat dog cat red blue"),
      (5L, "   "), (6L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val out = Text.wordVectors(docs, topV = 6, k = 2, textCol = "body")
      .orderBy("word_id", "comp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // k rows per vocabulary word
    assert(out.length === 6 * 2)
    // vocabulary ranked by (count DESC, word ASC): cat=7 dog=7 red=6
    // blue=5 green=2 mouse=2 — the cat/dog and green/mouse ties break
    // on the word
    assert(out.filter(_._4 == 1L).map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("cat", 1L, 7L), ("dog", 2L, 7L), ("red", 3L, 6L),
        ("blue", 4L, 5L), ("green", 5L, 2L), ("mouse", 6L, 2L)))
    // rescale contract: |wv_fp| <= 2^20 with the max magnitude EXACTLY
    // 2^20 (the global-max cell divides to ±2^20 by construction)
    assert(out.forall(r => math.abs(r._5) <= (1L << 20)))
    assert(out.map(r => math.abs(r._5)).max === (1L << 20))
    // vectors are non-degenerate: comp-1 loadings are not all equal
    // (the PPMI structure must survive into the factorization; the
    // SEMANTIC check — like attracts like — is the docVectors test's
    // cosine assertion, where composition makes it well-posed)
    val c1 = out.filter(_._4 == 1L).map(_._5)
    assert(c1.distinct.length > 1, "component 1 separates words")
    // bit-equal under any partitioning (the exactness contract)
    val out7 = Text.wordVectors(docs.repartition(7), topV = 6, k = 2,
        textCol = "body")
      .orderBy("word_id", "comp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out7.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Text.wordVectors(docs, topV = 1, textCol = "body")
    }
  }

  test("Text.coocFrame/coocMerge/wordVectorsFromCooc: merged cell " +
      "accumulators reproduce from-scratch word vectors bit-for-bit") {
    val docs = Seq(
      (1L, "cat dog cat dog mouse cat dog"),
      (2L, "red blue red blue green red blue red"),
      (3L, "cat dog mouse green blue red cat dog"),
      (4L, "dog cat dog cat red blue"),
      (5L, "mouse green mouse cat red dog blue"))
      .toDF("page_id", "body")
    val old = docs.where(col("page_id") <= 3L)
    val batch = docs.where(col("page_id") > 3L)
    // the frozen vocabulary (the crawl-loop contract: snapshot fixes it)
    val vocab = Text.vocabFrame(old, topV = 6, textCol = "body")
      .localCheckpoint()
    def vecsOf(coo: org.apache.spark.sql.DataFrame) =
      Text.wordVectorsFromCooc(vocab, coo, k = 2)
        .orderBy("word_id", "comp").collect()
        .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    val fromScratch = vecsOf(Text.coocFrame(docs, vocab, "body"))
    val merged = vecsOf(Text.coocMerge(
      Text.coocFrame(old, vocab, "body"),
      Text.coocFrame(batch, vocab, "body")))
    assert(merged === fromScratch,
      "epoch-N must equal from-scratch bit-for-bit (lossless cells)")
    // merge is commutative — any artifact/batch order works
    val flipped = vecsOf(Text.coocMerge(
      Text.coocFrame(batch, vocab, "body"),
      Text.coocFrame(old, vocab, "body")))
    assert(flipped === fromScratch)
    // and the cells themselves are exact counts: adjacent pairs never
    // span documents, so splitting by doc loses nothing
    val cells = Text.coocMerge(
        Text.coocFrame(old, vocab, "body"),
        Text.coocFrame(batch, vocab, "body"))
      .orderBy("a", "b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val direct = Text.coocFrame(docs, vocab, "body")
      .orderBy("a", "b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(cells === direct)
  }

  test("Text.wordVectorsFromCooc: the sparse large-V path is " +
      "bit-identical to the dense path (randomized corpora)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the denseMaxV switch must be invisible in the VALUES — only the
    // plan changes. Force the sparse path with denseMaxV = 0 and
    // compare against the dense default row-for-row on randomized
    // multi-word corpora (including vocab words whose PPMI row is all
    // zero — sparse rows with no cells must still project).
    val wordsGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docGen = Gen.listOfN(12, wordsGen).map(_.mkString(" "))
    val corpGen = Gen.listOfN(9, docGen)
    (0 until 4).flatMap(i =>
      corpGen.apply(Gen.Parameters.default, Seed(1234L + i)))
      .foreach { corp =>
        val docs = corp.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }
          .toDF("page_id", "body")
        val vocab = Text.vocabFrame(docs, topV = 7, textCol = "body")
          .localCheckpoint()
        val coo = Text.coocFrame(docs, vocab, "body").localCheckpoint()
        def rows(denseMaxV: Int) =
          Text.wordVectorsFromCooc(vocab, coo, k = 2,
              denseMaxV = denseMaxV)
            .orderBy("word_id", "comp").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4))).toSeq
        val dense = rows(denseMaxV = 256)
        val sparse = rows(denseMaxV = 0)
        assert(sparse === dense,
          "sparse path must be bit-identical to the dense path")
        // every vocabulary word has k rows in BOTH paths (all-zero
        // PPMI rows included)
        val v = vocab.count()
        assert(dense.length === 2 * v && sparse.length === 2 * v)
      }
  }

  test("Text.lsaVectors: exact LSA doc embeddings — stop-word " +
      "self-suppression, all-zero docs project, partition-invariant") {
    val docs = Seq(
      (1L, "cat dog cat dog mouse cat"),
      (2L, "cat dog dog cat cat dog"),       // same topic as 1
      (3L, "red blue red blue green red"),
      (4L, "blue red red blue blue green"),  // same topic as 3
      (5L, "cat red dog blue mouse green"),  // mixed
      (6L, "the the the"),                   // only the everywhere-word
      (7L, "   "), (8L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
      // 'the' appears in EVERY usable doc -> idf = 0 -> suppressed
      .select(col("page_id"),
        when(col("body").isNotNull && length(trim(col("body"))) > 0,
          concat(col("body"), lit(" the"))).otherwise(col("body"))
          .as("body"))
    val out = Text.lsaVectors(docs, topV = 8, k = 2,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // k rows per USABLE doc (6 docs; null/blank rows are not matrix
    // rows) — including doc 6, whose only word has idf 0 (all-zero
    // row, still projects to the centered constant)
    assert(out.length === 6 * 2)
    assert(out.count(_._1 == 6L) === 2)
    // rescale contract: max |lsa_fp| is exactly 2^20
    assert(out.map(r => math.abs(r._3)).max === (1L << 20))
    // semantic sanity via the latent space: same-topic docs land
    // closer than cross-topic docs on component 1
    val c1 = out.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    assert(math.abs(c1(1L) - c1(2L)) < math.abs(c1(1L) - c1(3L)),
      s"cat-docs should be closer than cat-vs-red: $c1")
    // bit-equal under any partitioning
    val out7 = Text.lsaVectors(docs.repartition(7), topV = 8, k = 2,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out7.toSeq === out.toSeq)
    // empty corpus -> empty typed frame (the family guard)
    val empty = Seq((1L, null.asInstanceOf[String])).toDF("page_id", "body")
    assert(Text.lsaVectors(empty, topV = 8, k = 2,
      idCol = "page_id", textCol = "body").count() === 0L)
  }

  test("Embed.lshTopK: training-free sign-bucket ANN — clustered " +
      "corpora concentrate, exact re-rank, partition-invariant") {
    // two tight antipodal clusters: every vector's projection signs
    // match its cluster-mates', so same-cluster vectors share the
    // bucket and the exact re-rank returns them first
    val base = Seq.tabulate(8)(i => (i.toLong,
      Seq(10.0 + i * 0.1, 5.0 - i * 0.05, 2.0 + i * 0.01)))
    val anti = Seq.tabulate(8)(i => (100L + i,
      Seq(-10.0 - i * 0.1, -5.0 + i * 0.05, -2.0 - i * 0.01)))
    val emb = (base ++ anti).toDF("eid", "vec")
    val out = Embed.lshTopK(emb, emb.where(col("eid").isin(0L, 100L)),
        k = 5, bits = 6, idCol = "eid", vecCol = "vec",
        queryIdCol = "eid", queryVecCol = "vec", excludeSelf = true)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    // each query finds its OWN cluster's members, never the antipode
    val per = out.groupBy(_._1)
    assert(per(0L).forall(_._2 < 100L), s"cluster purity: ${per(0L).toSeq}")
    assert(per(100L).forall(_._2 >= 100L),
      s"cluster purity: ${per(100L).toSeq}")
    assert(per(0L).length === 5 && per(100L).length === 5)
    // exact re-rank: cosines descend, ranks are 1..k
    per.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to 5))
      assert(sorted.map(_._3).toSeq ===
        sorted.map(_._3).sortBy(-(_: Double)).toSeq)
    }
    // bit-equal under any partitioning
    val out7 = Embed.lshTopK(emb.repartition(7),
        emb.where(col("eid").isin(0L, 100L)), k = 5, bits = 6,
        idCol = "eid", vecCol = "vec", queryIdCol = "eid",
        queryVecCol = "vec", excludeSelf = true)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(out7.toSeq === out.toSeq)
  }

  test("Embed.lshTopK multi-table/multi-probe: recall grows " +
      "monotonically, cross-table duplicates dedup, masks correct") {
    // probe-mask generator: C(bits,0..radius) masks, distinct, popcounts
    assert(Embed.lshProbeMasks(8, 0) === Seq(0L))
    val m81 = Embed.lshProbeMasks(8, 1)
    assert(m81.size === 9 && m81.distinct.size === 9)
    val m82 = Embed.lshProbeMasks(8, 2)
    assert(m82.size === 1 + 8 + 28 && m82.distinct.size === 37)
    assert(m82.forall(m => java.lang.Long.bitCount(m) <= 2))
    // spread vectors (no planted clusters) so single-table recall is
    // partial and widening tables/radius can only add candidates
    val emb = Seq.tabulate(40)(i => (i.toLong,
      Seq(math.cos(i * 0.7), math.sin(i * 1.3), math.cos(i * 2.1),
        math.sin(i * 0.35)))).toDF("eid", "vec")
    val q = emb.where(col("eid") < 3)
    def cand(tables: Int, radius: Int) =
      Embed.lshCandidatePairs(emb, q, bits = 6, tables = tables,
          radius = radius, idCol = "eid", vecCol = "vec",
          queryIdCol = "eid", queryVecCol = "vec", excludeSelf = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c11 = cand(1, 1); val c41 = cand(4, 1); val c42 = cand(4, 2)
    // more tables / wider probes only ADD candidates (union semantics)
    assert(c11.subsetOf(c41), "tables=4 must contain tables=1")
    assert(c41.subsetOf(c42), "radius=2 must contain radius=1")
    assert(c41.size > c11.size || c42.size > c41.size,
      "widening never added a candidate — grid degenerate")
    // candidate pairs are DISTINCT even across tables
    val raw = cand(4, 2)
    assert(raw.size === raw.toSeq.distinct.size)
    // the re-ranked list never contains a duplicate vec per query and
    // table 0 of the multi-table index hashes like the single table:
    // tables=1 output is reproduced exactly by the tables=4 run's
    // candidate superset + exact re-rank on the SAME top candidates
    val t4 = Embed.lshTopK(emb, q, k = 4, bits = 6, idCol = "eid",
        vecCol = "vec", queryIdCol = "eid", queryVecCol = "vec",
        excludeSelf = true, tables = 4, radius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    t4.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).distinct.length === rows.length,
        s"duplicate candidate survived the cross-table dedup: ${rows.toSeq}")
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length))
    }
    // deterministic under re-partitioning (the house invariant)
    val t4b = Embed.lshTopK(emb.repartition(7), q, k = 4, bits = 6,
        idCol = "eid", vecCol = "vec", queryIdCol = "eid",
        queryVecCol = "vec", excludeSelf = true, tables = 4, radius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(t4b.sortBy(r => (r._1, r._4)).toSeq ===
      t4.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("Dedup.contamination: the 13-gram decontamination rule — " +
      "verbatim items fully hit, novel items zero, inventory merge " +
      "lossless") {
    // corpus under non-testdata names; k = 5 so short texts gram
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red blue green yellow purple orange pink black"))
      .toDF("page_id", "body")
    val bench = Seq(
      // verbatim copy of page 1 -> every gram hits
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      // overlaps page 2's tail by exactly one 5-gram window
      (11L, "five six seven eight nine totally novel words here"),
      // fully novel
      (12L, "nothing of this text appears in the training corpus"),
      // shorter than k -> no grams -> omitted
      (13L, "too short"))
      .toDF("item_id", "content")
    val out = Dedup.contamination(corpus, bench, k = 5,
        idCol = "page_id", textCol = "body",
        benchIdCol = "item_id", benchTextCol = "content")
      .orderBy("item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(10L, 11L, 12L))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(10L) === ((10L, 4L, 4L, 1000000L)), s"verbatim: ${m(10L)}")
    assert(m(11L)._2 === 5L && m(11L)._3 === 1L &&
      m(11L)._4 === 200000L, s"one-window overlap: ${m(11L)}")
    assert(m(12L)._3 === 0L && m(12L)._4 === 0L)
    // crawl-loop form: split-inventory union == from-scratch
    val inv = Dedup.spanGramFrame(corpus.where(col("page_id") <= 2L),
        k = 5, idCol = "page_id", textCol = "body")
      .unionByName(Dedup.spanGramFrame(
        corpus.where(col("page_id") > 2L), k = 5,
        idCol = "page_id", textCol = "body"))
    val inc = Dedup.contaminationOf(inv, bench, k = 5,
        benchIdCol = "item_id", benchTextCol = "content")
      .orderBy("item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(inc.toSeq === out.toSeq)
  }

  test("Text.lsaIdf/lsaCellsFrom: lsaCells factors into the frozen-idf " +
      "artifact + cell assembly (the q184 incremental contract)") {
    val docs = Seq(
      (1L, "cat dog cat mouse"), (2L, "cat dog dog"),
      (3L, "red blue red"), (4L, "blue red green cat"))
      .toDF("page_id", "body")
    val vocab = Text.vocabFrame(docs, topV = 8, textCol = "body")
      .localCheckpoint()
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("page_id", "dim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = rows(Text.lsaCells(docs, vocab,
      idCol = "page_id", textCol = "body"))
    val idf = Text.lsaIdf(docs, vocab, idCol = "page_id",
      textCol = "body").localCheckpoint()
    val composed = rows(Text.lsaCellsFrom(docs, vocab, idf,
      idCol = "page_id", textCol = "body"))
    assert(composed === direct)
    // the frozen artifact applied to a BATCH yields the same cells the
    // from-scratch pipeline would give those docs under the same
    // weights — the q184 semantics
    val batch = docs.where(col("page_id") >= 3L)
    val bCells = rows(Text.lsaCellsFrom(batch, vocab, idf,
      idCol = "page_id", textCol = "body"))
    assert(bCells === direct.filter(_._1 >= 3L))
    // idf is word-grain, positive, and absent for everywhere-words
    val idfRows = idf.collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(idfRows.forall(_._2 > 0L))
  }

  test("Embed.pcaFrameSparse/pcaProjectSparse equal the dense forms " +
      "on a hand-built matrix with an all-zero row") {
    // matrix (3 rows x 3 dims): row 1 = (3, 0, 1), row 2 = all zeros,
    // row 3 = (0, 2, 0) — integer values, so the dense 2^24
    // quantization is exact and the comparison is bit-level
    val dense = Seq(
      (1L, Seq(3.0d, 0.0d, 1.0d)),
      (2L, Seq(0.0d, 0.0d, 0.0d)),
      (3L, Seq(0.0d, 2.0d, 0.0d))).toDF("vid", "v")
    val sc = 1L << 24
    val cells = Seq((1L, 1L, 3L * sc), (1L, 3L, 1L * sc),
      (3L, 2L, 2L * sc)).toDF("vid", "dim", "xfp")
    val fd = Embed.pcaFrame(dense, idCol = "vid", vecCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap
    val fs = Embed.pcaFrameSparse(cells, nVecs = 3L, d = 3,
        idCol = "vid", dimCol = "dim", valCol = "xfp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap
    // sparse frame = dense frame minus its zero S_ij cells
    assert(fs.keySet.subsetOf(fd.keySet))
    fd.foreach { case (k, v) =>
      assert(fs.getOrElse(k, BigInt(0)) === v, s"cell $k") }
    // and the driver math agrees end-to-end
    def comps(f: org.apache.spark.sql.DataFrame) =
      Embed.pcaFromFrame(f, k = 2, iters = 4)
        .orderBy("comp", "dim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
    val cd = comps(Embed.pcaFrame(dense, idCol = "vid", vecCol = "v"))
    assert(comps(Embed.pcaFrameSparse(cells, 3L, 3,
      "vid", "dim", "xfp")) === cd)
    // projection: sparse cells + explicit id universe vs dense arrays —
    // the all-zero row 2 must appear in both with the same (nonzero,
    // centered) projection
    val compsDf = Embed.pcaFromFrame(
      Embed.pcaFrame(dense, idCol = "vid", vecCol = "v"), k = 2,
      iters = 4).localCheckpoint()
    val pd = Embed.pcaProject(dense, compsDf, idCol = "vid",
        vecCol = "v")
      .orderBy("vid", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ps = Embed.pcaProjectSparse(dense.select(col("vid")), cells,
        compsDf, idCol = "vid", dimCol = "dim", valCol = "xfp")
      .orderBy("vid", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ps === pd)
    assert(pd.count(_._1 == 2L) === 2, "all-zero row projects in both")
  }

  test("Embed.pcaFromFrameLargeV: the implicit-Gram path matches the " +
      "dense driver path to fixed-point noise and is partition-" +
      "invariant") {
    // a 6x4 matrix with a strongly separated spectrum (dominant
    // direction ~(3,1,0,0)), integer-valued so the 2^24 grid is exact
    val sc = 1L << 24
    val rows = Seq(
      (1L, Seq(9.0d, 3.0d, 0.0d, 1.0d)),
      (2L, Seq(6.0d, 2.0d, 1.0d, 0.0d)),
      (3L, Seq(3.0d, 1.0d, 0.0d, 0.0d)),
      (4L, Seq(-9.0d, -3.0d, 1.0d, 0.0d)),
      (5L, Seq(-6.0d, -2.0d, 0.0d, 1.0d)),
      (6L, Seq(0.0d, 0.0d, 2.0d, 2.0d)))
    val dense = rows.toDF("vid", "v")
    val cells = rows.flatMap { case (id, v) =>
      v.zipWithIndex.collect { case (x, p) if x != 0.0d =>
        (id, (p + 1).toLong, (x * sc).toLong) }
    }.toDF("vid", "dim", "xfp")
    val frame = Embed.pcaFrameSparse(cells, nVecs = 6L, d = 4,
      idCol = "vid", dimCol = "dim", valCol = "xfp").localCheckpoint()
    def collectComps(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("comp", "dim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
    val dn = collectComps(Embed.pcaFromFrame(frame, k = 2, iters = 8))
    val lv = collectComps(Embed.pcaFromFrameLargeV(frame, k = 2,
      iters = 8))
    // comp 0 (the mean row) is defined identically — exact match
    assert(lv.filter(_._1 == 0L) === dn.filter(_._1 == 0L))
    // components: same 2^20 grid, floors placed at row vs cell grain —
    // directions agree to ~1e-4 relative (cos >= 0.9999, sign-aligned)
    for (c <- 1L to 2L) {
      val a = dn.filter(_._1 == c).sortBy(_._2).map(_._3.toDouble)
      val b = lv.filter(_._1 == c).sortBy(_._2).map(_._3.toDouble)
      val cos = (a, b).zipped.map(_ * _).sum /
        (math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(cos) >= 0.9999d, s"comp $c direction: cos=$cos")
      val lamA = dn.find(_._1 == c).get._4.toDouble
      val lamB = lv.find(_._1 == c).get._4.toDouble
      assert(math.abs(lamA - lamB) <= 0.001d * math.abs(lamA).max(1.0d),
        s"comp $c eigenvalue: $lamA vs $lamB")
    }
    // deterministic under re-partitioning (bit-level)
    val lv7 = collectComps(Embed.pcaFromFrameLargeV(
      Embed.pcaFrameSparse(cells.repartition(7), 6L, 4,
        "vid", "dim", "xfp"), k = 2, iters = 8))
    assert(lv7 === lv)
  }

  test("Text.ppmiVectors equals an independent pure-Scala PPMI replica " +
      "on randomized corpora (the fixed-point log2 recurrence pinned)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the engine's exact integer log2: e from the bit length of p div q,
    // ten squaring rounds on the 2^20-grid mantissa — replicated
    // INDEPENDENTLY here (BigInt driver math, not Spark columns)
    def log2fp(p: BigInt, q: BigInt): Long = {
      val pdq = (p / q).toLong
      val e = 63 - java.lang.Long.numberOfLeadingZeros(pdq)
      var r = ((p * 1048576) / (q * (BigInt(1) << e))).toLong
      var frac = 0L
      for (b <- 1 to 10) {
        val t = r * r
        val bit = if (t >= (1L << 41)) 1L else 0L
        r = t / (1L << (20 + bit))
        frac += bit << (10 - b)
      }
      e * 1024L + frac
    }
    // accuracy contract of the recurrence itself: within 1/2^10-grade
    // error of the real log2, exact on powers of two
    for (k <- 1 to 40) assert(log2fp(BigInt(1) << k, BigInt(1)) === 1024L * k)
    val ratios = for {
      p <- Gen.chooseNum(2L, 1000000000L); q <- Gen.chooseNum(1L, p - 1)
    } yield (p, q)
    (0 until 300).flatMap(i =>
      ratios.apply(Gen.Parameters.default, Seed(7L + i))).foreach {
      case (p, q) =>
        val l = log2fp(BigInt(p), BigInt(q))
        val exact = math.log(p.toDouble / q) / math.log(2.0) * 1024.0
        assert(math.abs(l - exact) < 3.0,
          s"log2fp($p/$q)=$l vs exact $exact")
        assert(l >= 0L)
    }
    // end-to-end: randomized two-word corpora, engine vs replica
    val wordsGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val pairGen = for {
      w1 <- wordsGen; w2 <- wordsGen; c <- Gen.chooseNum(1, 9)
    } yield (w1, w2, c)
    val corpGen = Gen.listOfN(8, pairGen)
    (0 until 5).flatMap(i =>
      corpGen.apply(Gen.Parameters.default, Seed(99L + i))).foreach { ps =>
      // one doc per pair occurrence: doc text = "w1 w2"
      val docs = ps.zipWithIndex.flatMap { case ((w1, w2, c), i) =>
        (0 until c).map(j => (i * 100L + j, s"$w1 $w2"))
      }.toDF("page_id", "body")
      val vocab = Text.vocabFrame(docs, topV = 8, textCol = "body")
        .localCheckpoint()
      val ids = vocab.collect()
        .map(r => r.getString(0) -> r.getInt(2)).toMap
      val got = Text.ppmiVectors(vocab,
          Text.coocFrame(docs, vocab, "body"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      // independent replica: symmetric window-1 counts -> marginals ->
      // positive cells through log2fp
      val cnt = scala.collection.mutable.Map.empty[(Int, Int), Long]
      ps.foreach { case (w1, w2, c) =>
        val (a, b) = (ids(w1), ids(w2))
        cnt((a, b)) = cnt.getOrElse((a, b), 0L) + c
        cnt((b, a)) = cnt.getOrElse((b, a), 0L) + c
      }
      val row = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
      val n = cnt.values.sum
      val v = ids.size
      ids.values.foreach { a =>
        val expected = (1 to v).map { b =>
          val cab = cnt.getOrElse((a, b), 0L)
          val p = BigInt(cab) * BigInt(n)
          val q = BigInt(row(a)) * BigInt(row(b))
          if (cab > 0 && p > q) log2fp(p, q) / 1024.0 else 0.0
        }
        assert(got(a) === expected,
          s"PPMI row of word_id $a: ${got(a)} vs replica $expected")
      }
    }
  }

  test("Text.ppmiVectors feeds the PCA audit: explained variance is " +
      "a sane ppm partition of the PPMI trace") {
    val docs = Seq(
      (1L, "cat dog cat dog mouse cat dog"),
      (2L, "red blue red blue green red blue red"),
      (3L, "cat dog mouse green blue red cat dog"))
      .toDF("page_id", "body")
    val vocab = Text.vocabFrame(docs, topV = 6, textCol = "body")
      .localCheckpoint()
    val vecs = Text.ppmiVectors(vocab, Text.coocFrame(docs, vocab, "body"))
    // dense rows: one per vocab word, V-length, nonnegative values
    val rows = vecs.collect().map(r => r.getSeq[Double](1))
    assert(rows.length === 6 && rows.forall(_.length === 6))
    assert(rows.flatten.forall(_ >= 0.0), "PPMI is nonnegative")
    val audit = Embed.pcaExplained(
        Embed.pcaFrame(vecs, idCol = "word_id", vecCol = "vec"), k = 2)
      .orderBy("comp").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(audit.map(_._1).toSeq === Seq(1L, 2L))
    // each component explains a nonnegative fraction; together <= 100%
    assert(audit.forall(a => a._2 >= 0L && a._2 <= 1000000L))
    assert(audit.map(_._2).sum <= 1000000L)
    // the leading component dominates (ordered by deflation)
    assert(audit(0)._2 >= audit(1)._2)
  }

  test("Text.docVectors sums in-vocabulary word vectors exactly and " +
      "omits empty/zero documents") {
    val docs = Seq(
      (1L, "cat dog"), (2L, "cat cat mouse"),
      (3L, "zebra unknownword"), // no vocab words → omitted
      (4L, "cat anticat"))       // engineered exact-zero sum → omitted
      .toDF("page_id", "body")
    val wv = Seq(
      ("cat", 1L, 100L), ("cat", 2L, -50L),
      ("dog", 1L, 30L), ("dog", 2L, 10L),
      ("mouse", 1L, -20L), ("mouse", 2L, 0L),
      ("anticat", 1L, -100L), ("anticat", 2L, 50L))
      .toDF("word", "comp", "wv_fp")
    val out = Text.docVectors(docs, wv, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0)._2 === Seq(130.0, -40.0)) // cat+dog
    assert(out(1)._2 === Seq(180.0, -100.0)) // 2·cat+mouse
    // empty word-vector frame → empty (id, vec) frame, not an NPE
    val emptyDv = Text.docVectors(docs, wv.limit(0), idCol = "page_id",
      textCol = "body")
    assert(emptyDv.columns.toSeq === Seq("page_id", "vec"))
    assert(emptyDv.count() === 0L)
    // composition: wordVectors → docVectors → the existing ANN family
    val corpus = Seq(
      (1L, "cat dog cat dog mouse cat dog"),
      (2L, "red blue red blue green red blue red"),
      (3L, "cat dog mouse cat dog"),
      (4L, "red blue green red blue"))
      .toDF("page_id", "body")
    val vecs = Text.docVectors(corpus,
      Text.wordVectors(corpus, topV = 6, k = 2, textCol = "body"),
      idCol = "page_id", textCol = "body")
    val sim = Embed.cosineTopK(vecs, vecs.where(col("page_id") === 1L),
        k = 3, idCol = "page_id", vecCol = "vec",
        queryIdCol = "page_id", queryVecCol = "vec", excludeSelf = true)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // doc 3 (cat-dog-mouse) must outrank the red-blue docs for doc 1
    assert(sim.find(_._2 == 1).get._1 === 3L,
      "nearest neighbor of the cat/dog doc is the other cat/dog doc")
  }

  test("Text.collocations computes self-consistent bigram-slot PMI lift") {
    val docs = Seq(
      (1L, "new york new york city"),
      (2L, "the new york times and the old york house"),
      (3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val out = Text.collocations(docs, minCount = 1L, textCol = "body")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // bigrams: doc1: new-york, york-new, new-york, york-city;
    // doc2: the-new, new-york, york-times, times-and, and-the, the-old,
    // old-york, york-house  -> N = 12
    val ny = out(("new", "york"))
    assert(ny._1 === 3L, "c_pair(new,york)")
    assert(ny._2 === 3L, "c_left(new) - 'new' is left in 3 bigrams")
    assert(ny._3 === 4L, "c_right(york) - york right of new,new,old,new")
    assert(ny._4 === 12L, "total bigrams")
    assert(ny._5 === (3.0d * 12.0d) / (3.0d * 4.0d), "lift exact")
    // marginal self-consistency: sum of c_pair over each slot = marginal
    val left = out.toSeq.groupBy(_._1._1).map { case (w, ps) =>
      w -> ps.map(_._2._1).sum }
    assert(left.forall { case (w, s) =>
      out.find(_._1._1 == w).get._2._2 == s }, "left marginals consistent")
    // determinism under re-planning
    val a = Text.collocations(docs, 1L, "body")
      .orderBy(col("lift").desc, col("w1"), col("w2")).collect().toSeq
    val b = Text.collocations(docs.repartition(7), 1L, "body")
      .orderBy(col("lift").desc, col("w1"), col("w2")).collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Text.collocations(docs, 0L, "body") }
  }

  test("Text.chunk covers every token with overlapping windows and " +
      "keeps caller column names") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")), // 30 tokens
      (2L, "a b c"),                                  // shorter than window
      (3L, "   "),                                    // blank: no chunks
      (4L, null.asInstanceOf[String]))                // null: no chunks
      .toDF("page_id", "body")
    val out = Text.chunk(docs, window = 8, stride = 5,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.map(_._1).distinct.toSeq === Seq(1L, 2L))
    val d1 = out.filter(_._1 == 1L)
    // ⌈(30−8)/5⌉ = 5 → starts 0,5,10,15,20,25; tail is 5 tokens and
    // ends exactly at token 30
    assert(d1.map(_._3).toSeq === Seq(0L, 5L, 10L, 15L, 20L, 25L))
    assert(d1.map(_._4).toSeq === Seq(8L, 8L, 8L, 8L, 8L, 5L))
    assert(d1.last._3 + d1.last._4 === 30L, "tail chunk must reach the end")
    assert(d1.head._5 === (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1.last._5 === (26 to 30).map(i => s"t$i").mkString(" "))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0L, 0L, 3L, "a b c")),
      "short doc must yield exactly one whole-doc chunk")
    // no shuffle: chunking is one generator projection riding the scan
    val plan = Text.chunk(docs, 8, 5, "page_id", "body")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk shuffled:\n$plan")
    intercept[IllegalArgumentException] { Text.chunk(docs, 0, 1) }
    intercept[IllegalArgumentException] { Text.chunk(docs, 8, 9) }
    intercept[IllegalArgumentException] { Text.chunk(docs, 8, 0) }
  }

  test("Text.unigramVocab learns shared morphemes and unigramEncode " +
      "reconstructs every word losslessly (incl. novel/long words)") {
    val corpus = ("walking talking walked talked walks talks " +
      "jumping jumped jumps ") * 4
    val train = Seq((1L, corpus.trim)).toDF("page_id", "body")
    val vocab = Text.unigramVocab(train, maxPiece = 4, minFreq = 2,
      rounds = 2, vocabSize = 64, maxWordLen = 16, textCol = "body")
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // multi-char shared morphemes must be learned (the exact split —
    // "walk|ing" vs "wal|king" — is a legitimate tie of the unigram
    // objective, broken deterministically by the integer costs; don't
    // over-pin it)
    assert(v.contains("jump") && v.keys.count(_.length >= 3) >= 4,
      s"shared morphemes must be learned: ${v.keys.toSeq.sorted}")
    // partition invariance: exact-integer costs + total-order argmin
    val v7 = Text.unigramVocab(train.repartition(7), 4, 2, 2, 64, 16,
      "body").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v7 === v, "vocabulary must be partition-invariant")
    // encode: every word reassembles losslessly; novel words segment
    // via single-char fallback; >maxWordLen words char-split
    val longWord = "x" * 20
    val docs = Seq((10L, "walking talked zzq"), (11L, longWord))
      .toDF("page_id", "body")
    val out = Text.unigramEncode(docs, vocab, 4, 16, "page_id", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .map(t => t._1 -> t).toMap
    assert(out(10L)._3.replace(" ", "") === "walkingtalkedzzq",
      s"pieces must reassemble the text: ${out(10L)}")
    // trained words compress to 2 pieces each; the novel word zzq has
    // no trained pieces and falls back to 3 single chars -> 7 total
    assert(out(10L)._2 === 7L,
      s"trained words must compress, novel words char-split: ${out(10L)}")
    assert(out(11L)._2 === 20L && out(11L)._3 === ("x " * 19 + "x"),
      s"over-maxWordLen words char-split: ${out(11L)}")
    intercept[IllegalArgumentException] {
      Text.unigramVocab(train, maxPiece = 1, textCol = "body")
    }
    intercept[IllegalArgumentException] {
      Text.unigramVocab(train, rounds = 0, textCol = "body")
    }
    intercept[IllegalArgumentException] {
      Text.unigramEncode(docs, vocab, 4, 33, "page_id", "body")
    }
  }

  test("Dedup.spanExtentAudit flags mixed-source island merges and " +
      "matches brute-force position coverage (the covering theorem)") {
    val docs = Seq(
      // A holds spans X (shared with B) and Y (shared with C) ADJACENT:
      // the k-gram islands merge them into one extent whose full text
      // exists nowhere else -> exact = false (the attribution artifact)
      (1L, "x1 x2 x3 y1 y2 y3"),
      (2L, "b1 x1 x2 x3 b2 b3"),
      (3L, "c1 c2 y1 y2 y3 c3"),
      // D/E share s1..s4 as a unit -> their extents are exact
      (4L, "d1 s1 s2 s3 s4 d2"),
      (5L, "e1 e2 s1 s2 s3 s4"),
      (6L, "n1 n2 n3 n4 n5 n6")) // fully novel -> no extents
      .toDF("page_id", "body")
    val out = Dedup.spanExtentAudit(docs, k = 3, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).toSeq === Seq((1L, 1L, 6L, 1L, false)),
      s"A's merged island is NOT duplicated as a unit: ${out.toSeq}")
    assert(byDoc(2L).toSeq === Seq((2L, 2L, 3L, 2L, true)))
    assert(byDoc(3L).toSeq === Seq((3L, 3L, 3L, 2L, true)))
    assert(byDoc(4L).toSeq === Seq((4L, 2L, 4L, 2L, true)))
    assert(byDoc(5L).toSeq === Seq((5L, 3L, 4L, 2L, true)))
    assert(!byDoc.contains(6L))
    // covering theorem: island coverage == positions inside ANY
    // duplicated window of length >= k, brute-forced here
    val k = 3
    val toks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val winCount = scala.collection.mutable.Map.empty[String, Int]
    for ((_, w) <- toks; m <- k to w.length; i <- 0 to w.length - m)
      winCount.updateWith(w.slice(i, i + m).mkString(" "))(
        c => Some(c.getOrElse(0) + 1))
    val truth = (for {
      (id, w) <- toks.toSeq; m <- k to w.length; i <- 0 to w.length - m
      if winCount(w.slice(i, i + m).mkString(" ")) >= 2
      p <- i until (i + m)
    } yield (id, (p + 1).toLong)).toSet // 1-based positions
    val claimed = out.flatMap { case (id, st, n, _, _) =>
      (st until st + n).map(p => (id, p))
    }.toSet
    assert(claimed === truth,
      s"position coverage must equal exact-substring truth:\n" +
        s"only-claimed=${(claimed -- truth).toSeq.sorted}\n" +
        s"only-true=${(truth -- claimed).toSeq.sorted}")
    intercept[IllegalArgumentException] {
      Dedup.spanExtentAudit(docs, k = 1, idCol = "page_id",
        textCol = "body")
    }
  }

  test("Select.classifierTrain/classifierScore separate distinct " +
      "vocabularies on (page_id, body, lbl) and are partition-invariant") {
    val good = "good clean helpful prose informative article reference"
    val bad = "spam junk casino pills lottery winner click banner"
    val docs = ((0 until 8).map(i =>
        (100L + i, s"$good extra$i word", 1L)) ++
      (0 until 8).map(i => (200L + i, s"$bad extra$i word", 0L)))
      .toDF("page_id", "body", "lbl")
    val model = Select.classifierTrain(docs, labelCol = "lbl",
      idCol = "page_id", textCol = "body", buckets = 512, iters = 12,
      lr20 = 2L * 1048576L)
    val m = model.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m.exists(_._1 == -1L), "model must carry the bias row")
    assert(m.length <= 513)
    val scored = Select.classifierScore(docs, model,
        threshold20 = 524288L, idCol = "page_id", textCol = "body",
        buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val posMin = (0 until 8).map(i => scored(100L + i)).min
    val negMax = (0 until 8).map(i => scored(200L + i)).max
    assert(posMin > negMax,
      s"classes must separate: pos min p20 $posMin <= neg max $negMax")
    // partition invariance: the exact-integer training is order-free
    val m7 = Select.classifierTrain(docs.repartition(7), "lbl",
        "page_id", "body", 512, 12, 2L * 1048576L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m7.sorted.toSeq === m.sorted.toSeq,
      "model must be bit-identical under any input partitioning")
    intercept[IllegalArgumentException] {
      Select.classifierTrain(docs, "lbl", "page_id", "body", 512, 0)
    }
    intercept[IllegalArgumentException] {
      Select.classifierTrain(docs, "lbl", "page_id", "body", 512, 64,
        lr20 = 1L << 30) // iters*lr20 over the zn-exactness bound
    }
    intercept[IllegalArgumentException] {
      Select.classifierScore(docs, model, threshold20 = -1L,
        idCol = "page_id", textCol = "body", buckets = 512)
    }
    // buckets boundary: 2^18 (the per-iteration driver-gradient cap)
    // trains; above it is a contract error naming the collect
    val mMax = Select.classifierTrain(docs, "lbl", "page_id", "body",
      1 << 18, 1)
    assert(mMax.count() >= 1L)
    val eCap = intercept[IllegalArgumentException] {
      Select.classifierTrain(docs, "lbl", "page_id", "body",
        (1 << 18) + 1, 1)
    }
    assert(eCap.getMessage.contains("gradient"))
  }

  test("Select.classifierScore against a frozen model is the " +
      "incremental path: batch-only input, broadcast model join") {
    val good = "good clean helpful prose informative article reference"
    val bad = "spam junk casino pills lottery winner click banner"
    val train = ((0 until 8).map(i =>
        (100L + i, s"$good t$i", 1L)) ++
      (0 until 8).map(i => (200L + i, s"$bad t$i", 0L)))
      .toDF("page_id", "body", "lbl")
    val model = Select.classifierTrain(train, "lbl", "page_id", "body",
      512, 12, 2L * 1048576L)
    // "frozen": the model round-trips through collected rows (what the
    // SideTable parquet artifact stores) and scores UNSEEN batch docs
    val frozen = model.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.toDF("h", "w20")
    val batch = Seq((900L, s"$good fresh page"),
      (901L, s"$bad fresh page"),
      (902L, "entirely novel vocabulary neither class saw"))
      .toDF("page_id", "body")
    val out = Select.classifierScore(batch, frozen, 524288L,
      "page_id", "body", 512)
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getBoolean(4))).toMap
    assert(byId(900L)._1 > byId(901L)._1,
      "frozen model must still order good above bad on unseen docs")
    assert(byId(900L)._2 && !byId(901L)._2)
    // the model join must broadcast — the 100 TB contract: the batch
    // never shuffles to meet the ≤ buckets+1-row model
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join in the scoring plan:\n$plan")
  }

  test("Select.classifierEval sweeps exact integer-ppm confusion " +
      "metrics over the threshold grid and ignores unlabeled docs") {
    val scored = Seq((100L, 1000000L), (101L, 600000L), (102L, 500000L),
        (103L, 100000L), (104L, 300000L), (105L, 999999L))
      .toDF("page_id", "p20")
    val labels = Seq((100L, 1L), (101L, 1L), (102L, 0L), (103L, 0L),
        (104L, 1L)) // 105 unlabeled — must be excluded (inner join)
      .toDF("page_id", "gold")
    val out = Select.classifierEval(scored, labels, nThresholds = 3,
        idCol = "page_id", labelCol = "gold")
    assert(out.columns.toSeq === Seq("thr20", "tp", "fp", "fn", "tn",
      "precision_ppm", "recall_ppm", "f1_ppm", "keep_ppm"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6), r.getLong(7), r.getLong(8)))
    // thresholds are the interior quartiles of 2^20: 262144/524288/786432
    assert(rows.toSeq === Seq(
      (262144L, 3L, 1L, 0L, 1L, 750000L, 1000000L, 857142L, 800000L),
      (524288L, 2L, 0L, 1L, 2L, 1000000L, 666666L, 799999L, 400000L),
      (786432L, 1L, 0L, 2L, 2L, 1000000L, 333333L, 499999L, 200000L)))
    // the sweep rides the (p20, y) histogram: the only join touching
    // threshold rows is a broadcast nested-loop at histogram grain
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"threshold sweep must broadcast over the histogram:\n$plan")
    intercept[IllegalArgumentException] {
      Select.classifierEval(scored, labels, nThresholds = 0,
        idCol = "page_id", labelCol = "gold")
    }
  }

  test("Dedup.exactSubstrSpans finds maximal verbatim-duplicated " +
      "spans with exact boundaries, matching brute force") {
    // the spanExtentAudit corpus: doc 1's adjacent X/Y runs duplicate
    // against DIFFERENT docs — the k-gram islands merge them into one
    // over-claimed extent; ExactSubstr must report them as TWO spans
    val docs = Seq(
      (1L, "x1 x2 x3 y1 y2 y3"),
      (2L, "b1 x1 x2 x3 b2 b3"),
      (3L, "c1 c2 y1 y2 y3 c3"),
      (4L, "d1 s1 s2 s3 s4 d2"),
      (5L, "e1 e2 s1 s2 s3 s4"),
      (6L, "n1 n2 n3 n4 n5 n6"))
      .toDF("page_id", "body")
    val out = Dedup.exactSubstrSpans(docs, k = 3, maxSpan = 8,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, false), (1L, 4L, 3L, false), // NOT one merged span
      (2L, 2L, 3L, false), (3L, 3L, 3L, false),
      (4L, 2L, 4L, false), (5L, 3L, 4L, false)))
    // brute-force cross-check: maximal duplicated spans, cap maxSpan
    val k = 3; val cap = 8
    val toks = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val winCount = scala.collection.mutable.Map.empty[String, Int]
    for ((_, w) <- toks; m <- k to math.min(cap, w.length);
         i <- 0 to w.length - m)
      winCount.updateWith(w.slice(i, i + m).mkString(" "))(
        c => Some(c.getOrElse(0) + 1))
    val truth = (for ((id, w) <- toks.toSeq) yield {
      val ls = w.indices.map { i =>
        val ms = (k to math.min(cap, w.length - i)).filter(m =>
          winCount(w.slice(i, i + m).mkString(" ")) >= 2)
        i -> (if (ms.isEmpty) 0 else ms.max)
      }.filter(_._2 >= k)
      // maximal filter: keep i where i+L exceeds every previous end
      var best = -1
      ls.flatMap { case (i, l) =>
        if (i + l > best) { best = i + l; Some((id, (i + 1).toLong,
          l.toLong)) } else None
      }
    }).flatten.toSet
    assert(out.map(t => (t._1, t._2, t._3)).toSet === truth,
      s"must equal brute-force maximal duplicated spans")
    // partition invariance
    val out7 = Dedup.exactSubstrSpans(docs.repartition(7), k = 3,
        maxSpan = 8, idCol = "page_id", textCol = "body")
      .orderBy("page_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out7.toSeq === out.toSeq,
      "spans must be identical under any input partitioning")
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrSpans(docs, k = 1, idCol = "page_id",
        textCol = "body")
    }
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrSpans(docs, k = 3, maxSpan = 48,
        idCol = "page_id", textCol = "body") // not a power of two
    }
  }

  test("Dedup.exactSubstrSpans clamps at maxSpan as a covering chain " +
      "and flags only truly-extendable spans") {
    // two identical 6-token docs, maxSpan = 4: L(pos) = min(4, rem);
    // the maximal chain is starts 1/2/3 with ends 5/6/7 — start 3 has
    // rem exactly 4, so its span is EXACT (clamped = false)
    val docs = Seq(
      (1L, "c1 c2 c3 c4 c5 c6"),
      (2L, "c1 c2 c3 c4 c5 c6"))
      .toDF("page_id", "body")
    val out = Dedup.exactSubstrSpans(docs, k = 2, maxSpan = 4,
        idCol = "page_id", textCol = "body")
      .where(col("page_id") === 1L)
      .orderBy("start_tok").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq((1L, 4L, true), (2L, 4L, true),
      (3L, 4L, false)))
    // covered positions are exact despite clamping: 1..6
    val covered = out.flatMap { case (st, n, _) => st until st + n }.toSet
    assert(covered === (1L to 6L).toSet)
  }

  test("Dedup.paraDedup removes recurring paragraphs keeping the " +
      "first occurrence, in document order") {
    val docs = Seq(
      (1L, "aaa\nbbb\nccc"),
      (2L, "bbb\nddd"),
      (3L, "eee\n\n  \neee"), // within-doc dup + blank paragraphs
      (4L, "aaa"),
      (5L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val out = Dedup.paraDedup(docs, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, "aaa\nbbb\nccc"), // all first occurrences
      (2L, 2L, 1L, "ddd"),           // bbb first seen at (1, 2)
      (3L, 2L, 1L, "eee"),           // within-doc second copy removed
      (4L, 1L, 1L, "")))             // aaa first seen at (1, 1)
    // partition invariance: keep-first is a total order, not arrival
    val out7 = Dedup.paraDedup(docs.repartition(7), idCol = "page_id",
        textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out7.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Dedup.paraDedup(docs, minCount = 1L, idCol = "page_id",
        textCol = "body")
    }
  }

  test("Text.keywords ranks per-doc terms by the exact fixed-point " +
      "tf-idf score with total-order ties") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple durian durian durian"))
      .toDF("page_id", "body")
    val out = Text.keywords(docs, k = 2, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(5)))
    // N=3; idf_fp = (3*2^20) div df: df2 -> 1572864, df1 -> 3145728
    assert(out.toSeq === Seq(
      (1L, 1L, "apple", 3145728L), (1L, 2L, "banana", 1572864L),
      (2L, 1L, "cherry", 3145728L), (2L, 2L, "banana", 1572864L),
      (3L, 1L, "durian", 9437184L), (3L, 2L, "apple", 1572864L)))
    val out7 = Text.keywords(docs.repartition(7), k = 2,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(5)))
    assert(out7.toSeq === out.toSeq)
  }

  test("Embed.pca recovers the dominant direction and is bit-equal " +
      "under any partitioning") {
    // variance almost entirely along dim 1; a little along dim 2
    val vecs = Seq(
      (1L, Array(4.0f, 0.0f)), (2L, Array(-4.0f, 0.0f)),
      (3L, Array(2.0f, 0.1f)), (4L, Array(-2.0f, -0.1f)),
      (5L, Array(0.0f, 0.2f)), (6L, Array(0.0f, -0.2f)))
      .toDF("vid", "v")
    val out = Embed.pca(vecs, k = 2, iters = 8, idCol = "vid",
        vecCol = "v")
      .orderBy("comp", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // comp 0 = fixed-point means (both exactly 0 here), lam = n
    assert(out.take(2).toSeq === Seq((0L, 1L, 0L, 6L), (0L, 2L, 0L, 6L)))
    val c1 = out.filter(_._1 == 1L); val c2 = out.filter(_._1 == 2L)
    // dominant component is the x axis, second the y axis
    assert(math.abs(c1(0)._3) > 50L * math.abs(c1(1)._3),
      s"comp1 should align with dim 1: ${c1.mkString(",")}")
    assert(math.abs(c2(1)._3) > 50L * math.abs(c2(0)._3),
      s"comp2 should align with dim 2: ${c2.mkString(",")}")
    assert(c1.head._4 > c2.head._4, "Rayleigh values must decrease")
    // exact integers: identical under any partitioning
    val out7 = Embed.pca(vecs.repartition(5), k = 2, iters = 8,
        idCol = "vid", vecCol = "v")
      .orderBy("comp", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out7.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Embed.pca(vecs, k = 0, idCol = "vid", vecCol = "v")
    }
  }

  test("Embed.pcaFrame/pcaMerge/pcaFromFrame: merged accumulators " +
      "reproduce from-scratch pca bit-for-bit") {
    val old = Seq(
      (1L, Array(4.0f, 0.3f)), (2L, Array(-4.0f, 0.0f)),
      (3L, Array(2.0f, 0.1f))).toDF("vid", "v")
    val batch = Seq(
      (10L, Array(-2.0f, -0.1f)), (11L, Array(0.5f, 0.2f)),
      (12L, Array(0.0f, -0.2f))).toDF("vid", "v")
    val merged = Embed.pcaMerge(
      Embed.pcaFrame(old, idCol = "vid", vecCol = "v"),
      Embed.pcaFrame(batch, idCol = "vid", vecCol = "v"))
    val inc = Embed.pcaFromFrame(merged, k = 2, iters = 8)
      .orderBy("comp", "dim").collect().map(_.toSeq)
    val scratch = Embed.pca(old.unionByName(batch), k = 2, iters = 8,
        idCol = "vid", vecCol = "v")
      .orderBy("comp", "dim").collect().map(_.toSeq)
    assert(inc.toSeq === scratch.toSeq,
      "merged-artifact PCA must equal from-scratch bit-for-bit")
    // merge is order-insensitive (commutative exact sums)
    val flipped = Embed.pcaFromFrame(Embed.pcaMerge(
        Embed.pcaFrame(batch, idCol = "vid", vecCol = "v"),
        Embed.pcaFrame(old, idCol = "vid", vecCol = "v")),
      k = 2, iters = 8)
      .orderBy("comp", "dim").collect().map(_.toSeq)
    assert(flipped.toSeq === scratch.toSeq)
  }

  test("Embed.pcaExplained reports Rayleigh-vs-trace explained " +
      "variance in exact ppm") {
    val vecs = Seq(
      (1L, Array(4.0f, 0.0f)), (2L, Array(-4.0f, 0.0f)),
      (3L, Array(2.0f, 0.1f)), (4L, Array(-2.0f, -0.1f)),
      (5L, Array(0.0f, 0.2f)), (6L, Array(0.0f, -0.2f)))
      .toDF("vid", "v")
    val out = Embed.pcaExplained(
        Embed.pcaFrame(vecs, idCol = "vid", vecCol = "v"), k = 2,
        iters = 8)
      .orderBy("comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length === 2)
    // same trace denominator on both rows; x dominates the variance
    assert(out(0)._3 === out(1)._3)
    assert(out(0)._4 > 900000L, s"comp1 should explain >90%: $out")
    assert(out(1)._4 < 100000L, s"comp2 should explain <10%: $out")
    // the ppm IS lam/trace under floor division
    assert(out(0)._4 === out(0)._2 * 1000000L / out(0)._3)
  }

  test("Embed.pcaProject computes the exact centered fixed-point " +
      "projection") {
    val vecs = Seq(
      (1L, Array(4.0f, 0.0f)), (2L, Array(-4.0f, 0.0f)),
      (3L, Array(2.0f, 0.5f)), (4L, Array(-2.0f, -0.5f)))
      .toDF("vid", "v")
    val comps = Embed.pca(vecs, k = 1, iters = 8, idCol = "vid",
      vecCol = "v")
    val out = Embed.pcaProject(vecs, comps, idCol = "vid",
        vecCol = "v")
      .orderBy("vid", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // manual replay from the returned component frame
    val rows = comps.orderBy("comp", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mu = rows.filter(_._1 == 0L).map(_._3)
    val w = rows.filter(_._1 == 1L).map(_._3)
    val x = Map(1L -> Seq(4.0, 0.0), 2L -> Seq(-4.0, 0.0),
      3L -> Seq(2.0, 0.5), 4L -> Seq(-2.0, -0.5))
    val expected = x.toSeq.sortBy(_._1).map { case (id, xs) =>
      val p = xs.zipWithIndex.map { case (xv, d) =>
        (math.floor(xv * 16777216.0).toLong - mu(d)) * w(d) }.sum
      (id, 1L, p)
    }
    assert(out.toSeq === expected)
    val out7 = Embed.pcaProject(vecs.repartition(3),
        comps.repartition(2), idCol = "vid", vecCol = "v")
      .orderBy("vid", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out7.toSeq === out.toSeq)
  }

  test("Embed.randomProject derives the exact ±1 hash sign matrix " +
      "over quantized inputs") {
    val vecs = Seq((1L, Array(1.0f, -0.5f)), (2L, Array(0.25f, 0.25f)))
      .toDF("vid", "v")
    val out = Embed.randomProject(vecs, outDim = 2, idCol = "vid",
        vecCol = "v")
      .orderBy("vid", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sgn(j: Int, d: Int): Long = 1L - 2L *
      (graft.functions.Hash60Expr.hash60(s"$j:$d".getBytes("UTF-8")) % 2L)
    val sc = 1L << 24
    val expected = for (id <- Seq(1L, 2L); j <- Seq(1L, 2L)) yield {
      val x = if (id == 1L) Seq(sc, -sc / 2) else Seq(sc / 4, sc / 4)
      (id, j, sgn(j.toInt, 1) * x(0) + sgn(j.toInt, 2) * x(1))
    }
    assert(out.toSeq === expected)
    // exact integers: identical under any partitioning
    val out7 = Embed.randomProject(vecs.repartition(5), outDim = 2,
        idCol = "vid", vecCol = "v")
      .orderBy("vid", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out7.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Embed.randomProject(vecs, outDim = 0, idCol = "vid", vecCol = "v")
    }
    // empty input → empty (id, dim, y_fp) frame, not an opaque NPE
    val empty = Embed.randomProject(vecs.limit(0), outDim = 2,
      idCol = "vid", vecCol = "v")
    assert(empty.columns.toSeq === Seq("vid", "dim", "y_fp"))
    assert(empty.count() === 0L)
  }

  test("Embed.pcaFrame rejects ragged (mixed-dimensionality) " +
      "corpora with a contract error") {
    val ragged = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(4.0f)))
      .toDF("vid", "v")
    val e = intercept[IllegalArgumentException] {
      Embed.pcaFrame(ragged, idCol = "vid", vecCol = "v")
    }
    assert(e.getMessage.contains("uniform dimensionality"))
    // NULL vectors stay excluded (the pre-guard behavior), never
    // false-trip the ragged check as legacy size(-1)
    val withNull = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 5.0f)),
        (3L, null.asInstanceOf[Array[Float]]))
      .toDF("vid", "v")
    val f = Embed.pcaFrame(withNull, idCol = "vid", vecCol = "v")
    assert(f.where(col("i") === 0L && col("j") === 0L)
      .head().getDecimal(2).longValueExact() === 2L,
      "n counts only non-null vectors")
  }

  test("Text.wordVectors on a corpus with no usable text returns an " +
      "empty typed frame, not a crash") {
    val empty = Seq((1L, "   "), (2L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val out = Text.wordVectors(empty, topV = 8, k = 2, textCol = "body")
    assert(out.columns.toSeq ===
      Seq("word", "word_id", "cnt", "comp", "wv_fp"))
    assert(out.count() === 0L)
  }

  test("Curate.leakSafeSplit assigns every cluster member its " +
      "representative's split") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("page_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("page_id", "keep_id")
    val out = Curate.leakSafeSplit(docs, clusters, idCol = "page_id")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // cluster {1, 2} shares keep_id 1 and therefore the split
    assert(out(0)._2 === 1L && out(1)._2 === 1L)
    assert(out(0)._3 === out(1)._3)
    // docs absent from the cluster frame split on their own id
    assert(out(3)._2 === 4L && out(4)._2 === 5L)
    // the rule IS hashSplit keyed on the representative id string
    val ref = Curate.hashSplit(
        out.map(_._2.toString).toSeq.toDF("text"))
      .collect().map(_.getString(1))
    assert(out.map(_._3).toSeq === ref.toSeq)
    intercept[IllegalArgumentException] {
      Curate.leakSafeSplit(docs, clusters, trainPct = 95, valPct = 10,
        idCol = "page_id")
    }
    // string ids are first-class cluster keys (no silent long cast)
    val sdocs = Seq("a", "b", "c").toDF("page_id")
    val sclust = Seq(("a", "a"), ("b", "a")).toDF("page_id", "keep_id")
    val sout = Curate.leakSafeSplit(sdocs, sclust, idCol = "page_id")
      .orderBy("page_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(sout.map(_._2).toSeq === Seq("a", "a", "c"))
    assert(sout(0)._3 === sout(1)._3, "cluster {a, b} must share a split")
    assert(sout.forall(r => Seq("train", "val", "test").contains(r._3)))
    // a malformed clusters frame with duplicate member rows must NOT
    // fan out the join (one doc under two keep_ids/splits would be the
    // exact leakage the op exists to prevent): one row per doc, with
    // the deterministic min keep_id
    val dup = Seq((1L, 1L), (1L, 9L), (2L, 1L)).toDF("page_id", "keep_id")
    val dout = Curate.leakSafeSplit(docs, dup, idCol = "page_id")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dout.length === 5, "duplicate cluster rows must not fan out")
    assert(dout(0) === ((1L, 1L)), "min keep_id wins deterministically")
  }

  test("Dedup.paraDedup normalizeKeys collapses trivially-variant " +
      "copies while output keeps original text") {
    val docs = Seq(
      (1L, "Hello World!\nunique one"),
      (2L, "hello  world\nunique two"),
      (3L, "Hello, WORLD"))
      .toDF("page_id", "body")
    val out = Dedup.paraDedup(docs, normalizeKeys = true,
        idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, "Hello World!\nunique one"), // first copy, ORIGINAL text
      (2L, 1L, "unique two"),
      (3L, 1L, "")))
    // without normalized keys all three variants are distinct
    val raw = Dedup.paraDedup(docs, idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect().map(_.getLong(2))
    assert(raw.toSeq === Seq(0L, 0L, 0L))
  }

  test("Dedup.paraDedupAppend equals from-scratch paraDedup " +
      "restricted to batch docs (the epoch contract)") {
    val old = Seq((1L, "aaa\nbbb"), (2L, "ccc")).toDF("page_id", "body")
    val batch = Seq(
      (10L, "bbb\nnew one\nnew dup"),
      (11L, "new dup\nccc\nnew two"))
      .toDF("page_id", "body")
    val inc = Dedup.paraDedupAppend(batch,
        Dedup.paraFrame(old, idCol = "page_id", textCol = "body"),
        idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect().map(_.toSeq)
    val scratch = Dedup.paraDedup(old.unionByName(batch),
        idCol = "page_id", textCol = "body")
      .where(col("page_id") >= 10L)
      .orderBy("page_id").collect().map(_.toSeq)
    assert(inc.toSeq === scratch.toSeq)
    assert(inc.map(r => (r(0), r(3))).toSeq === Seq(
      (10L, "new one\nnew dup"), // bbb committed; new dup first here
      (11L, "new two")))         // new dup and ccc both removed
  }

  test("Text.normalize canonicalizes case, accents, digits, punct " +
      "and whitespace; each step is switchable") {
    val docs = Seq(
      (1L, "Café  Déjà-Vu!"),
      (2L, "Version 2.1 (beta)"),
      (3L, "naïve £5 piñata"),
      (4L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val out = Text.normalize(docs, idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "cafe deja vu"),
      (2L, "version 0 0 beta"),
      (3L, "naive £0 pinata"), // £ is neither ASCII punct nor a mark
      (4L, null)))
    // switches: everything off leaves only whitespace collapsing
    val raw = Text.normalize(docs, lowercase = false,
        stripAccents = false, digitsToZero = false,
        punctToSpace = false, idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect().map(_.getString(1))
    assert(raw.toSeq === Seq("Café Déjà-Vu!", "Version 2.1 (beta)",
      "naïve £5 piñata", null))
    // char counts: raw length vs normalized length
    val r1 = Text.normalize(docs, idCol = "page_id", textCol = "body")
      .where(col("page_id") === 1L).collect().head
    assert(r1.getLong(2) === 14L && r1.getLong(3) === 12L)
    // the registered SQL function exposes the same expression
    graft.GraftExtensions.register(docs.sparkSession)
    assert(docs.sparkSession.sql("SELECT graft_unaccent('Déjà') AS u")
      .collect().head.getString(0) === "Deja")
  }

  test("Text.tokenizerEval reduces any encode frame to the exact " +
      "corpus battery") {
    val docs = Seq((1L, "ab ab cd"), (2L, "ab x"),
      (3L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    // a fake encode: doc 4 is NOT in the docs base and must not count
    val enc = Seq((1L, "ab</w> ab</w> c d</w>"), (2L, "ab</w> x</w>"),
      (4L, "zz zz")).toDF("page_id", "tokens")
    val out = Text.tokenizerEval(docs, enc, "toy", idCol = "page_id",
      textCol = "body").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "toy")
    // n_docs=2, n_words=5, n_chars=9, n_tokens=6, types=4 (ab</w>,
    // c, d</w>, x</w>), char tokens=3 (c, d</w>, x</w> — symbol
    // length 1 after the </w> marker), fert 6/5, cpt 9/6, char 3/6
    assert((1 to 9).map(r.getLong) === Seq(2L, 5L, 9L, 6L, 4L, 3L,
      1200000L, 1500000L, 500000L))
    // partition invariance
    val r7 = Text.tokenizerEval(docs.repartition(7), enc.repartition(5),
      "toy", idCol = "page_id", textCol = "body").collect().head
    assert(r7.toSeq === r.toSeq)
    intercept[IllegalArgumentException] {
      Text.tokenizerEval(docs, enc, "", idCol = "page_id",
        textCol = "body")
    }
  }

  test("Dedup.trimSpans cuts exactly the span-covered positions and " +
      "reassembles survivors in order") {
    val docs = Seq(
      (1L, "x1 x2 x3 y1 y2 y3"),
      (2L, "b1 x1 x2 x3 b2 b3"),
      (3L, "c1 c2 y1 y2 y3 c3"),
      (4L, "d1 s1 s2 s3 s4 d2"),
      (5L, "e1 e2 s1 s2 s3 s4"),
      (6L, "n1 n2 n3 n4 n5 n6"),
      (7L, null.asInstanceOf[String]))
      .toDF("page_id", "body")
    val spans = Dedup.exactSubstrSpans(docs, k = 3, maxSpan = 8,
      idCol = "page_id", textCol = "body")
    val out = Dedup.trimSpans(docs, spans, idCol = "page_id",
        textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 6L, 6L, ""), // fully duplicated doc trims to empty
      (2L, 6L, 3L, "b1 b2 b3"),
      (3L, 6L, 3L, "c1 c2 c3"),
      (4L, 6L, 4L, "d1 d2"),
      (5L, 6L, 4L, "e1 e2"),
      (6L, 6L, 0L, "n1 n2 n3 n4 n5 n6"))) // span-free doc untouched
    // overlapping spans cut each covered position once (distinct'd);
    // a zero-length span cuts NOTHING (guarded before the explode —
    // sequence(a, a-1) would otherwise step backwards over 2 tokens)
    val manual = Seq((2L, 2L, 3L), (2L, 3L, 3L), (2L, 6L, 0L))
      .toDF("page_id", "start_tok", "n_tok")
    val ovl = Dedup.trimSpans(docs.where(col("page_id") === 2L), manual,
        idCol = "page_id", textCol = "body")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(ovl.toSeq === Seq((6L, 4L, "b1 b3")))
    // partition invariance
    val out7 = Dedup.trimSpans(docs.repartition(7),
        spans.repartition(5), idCol = "page_id", textCol = "body")
      .orderBy("page_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out7.toSeq === out.toSeq,
      "trim must be identical under any input partitioning")
  }
}
