package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusQuality, TextPipeline}

/** Generator-driven equivalence for the corpus-quality operators: a
  * brute-force single-threaded Scala reimplementation (including the
  * rare-gram blocking model, where blocking is part of the operator's
  * definition) must agree with the distributed plans on arbitrary
  * small-vocab corpora — a THIRD formulation, independent of both the
  * Spark plans and the DuckDB oracles. Small vocabularies force heavy
  * shingle overlap, duplicate documents, and boundary df values, the
  * regimes where blocking/collapse bugs would hide. */
class CorpusEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpus-equiv")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val P = 2147483647L

  private def h60(s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
  }

  private def toks(t: String): Array[String] = t.trim.split("\\s+")

  /** Distinct n-gram shingle hashes, docs with ≥ n words only —
    * mirrors TextFunctions.shingleHashRows ∘ distinct. */
  private def shingleSet(t: String, n: Int): Set[Long] = {
    val w = toks(t)
    if (w.length < n) Set.empty
    else w.sliding(n).map(g => h60(g.mkString(" ")) % P).toSet
  }

  /** n-gram shingle hash multiset (with multiplicity). */
  private def shingleBag(t: String, n: Int): Map[Long, Long] = {
    val w = toks(t)
    if (w.length < n) Map.empty
    else w.sliding(n).map(g => h60(g.mkString(" ")) % P).toSeq
      .groupBy(identity).map { case (h, occ) => h -> occ.size.toLong }
  }

  private def bitlen(c: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(c)

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-equiv").toFile.getAbsolutePath
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // Small vocabulary → heavy overlap, duplicate docs, boundary df values.
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu")

  private def corpusGen(minDocs: Int, maxDocs: Int): Gen[Seq[String]] = for {
    nDocs <- Gen.chooseNum(minDocs, maxDocs)
    docs <- Gen.listOfN(nDocs, for {
      n <- Gen.chooseNum(3, 20)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  private def sampled(minDocs: Int, maxDocs: Int, rounds: Int): Seq[Seq[String]] =
    (0 until rounds).flatMap(i =>
      corpusGen(minDocs, maxDocs).apply(Gen.Parameters.default, Seed(11L + i)))

  test("q64 novelty == brute-force first-occurrence computation") {
    for (texts <- sampled(8, 25, 4)) {
      val sets = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t, 3) }
        .filter(_._2.nonEmpty)
      val firstOwner = sets.flatMap { case (id, hs) => hs.map(_ -> id) }
        .groupBy(_._1).map { case (h, owns) => h -> owns.map(_._2).min }
      val expect = sets.map { case (id, hs) =>
        val novel = hs.count(h => firstOwner(h) == id).toLong
        id -> ((hs.size.toLong, novel, novel.toDouble / hs.size.toDouble))
      }.toMap
      val got = CorpusQuality.defs("q64_novelty")(spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expect)
    }
  }

  test("q61 surprisal == brute-force quantized-LM computation") {
    for (texts <- sampled(8, 25, 4)) {
      val perDoc = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> toks(t).toSeq.groupBy(identity)
          .map { case (w, occ) => w -> occ.size.toLong }
      }
      val lm = perDoc.flatMap(_._2).groupBy(_._1)
        .map { case (w, ks) => w -> ks.map(_._2).sum }
      val expect = perDoc.map { case (id, tfm) =>
        val n = tfm.values.sum
        val bits = tfm.map { case (w, k) => k * (bitlen(lm(w)) - 1) }.sum
        id -> ((n, bits, bits.toDouble / n.toDouble))
      }.toMap
      val got = CorpusQuality.defs("q61_unigram_surprisal")(
          spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expect)
    }
  }

  test("q62 containment == brute-force collapse+blocking+expansion") {
    for (texts <- sampled(10, 30, 4)) {
      // exact-group collapse on ≥5-word docs
      val keyed = texts.zipWithIndex.collect {
        case (t, i) if toks(t).length >= 5 =>
          (i.toLong, toks(t).mkString(" "))
      }
      val rep = keyed.groupBy(_._2).map { case (gk, ms) =>
        gk -> ms.map(_._1).min
      }
      val members = keyed.map { case (id, gk) => (id, gk, rep(gk)) }
      val reps = members.collect { case (id, _, r) if id == r => id }.toSet
      val sets = members.collect { case (id, _, r) if id == r =>
        id -> shingleSet(texts(id.toInt), 5)
      }.toMap
      // rare-gram blocking over rep sets
      val df = sets.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
        .groupBy(_._1).map { case (h, o) => h -> o.size }
      val rare = df.collect { case (h, d) if d >= 2 && d <= 8 => h }.toSet
      val repIds = reps.toSeq.sorted
      val repPairs = (for {
        a <- repIds; b <- repIds if a < b
        shared = sets(a) & sets(b)
        if shared.exists(rare)
        cont = shared.size.toDouble /
          math.min(sets(a).size, sets(b).size).toDouble
        if cont >= 0.9
      } yield (a, b, cont))
      // expansion: within-group pairs at 1.0, cross pairs at rep cont
      val byRep = members.groupBy(_._3).map { case (r, ms) =>
        r -> ms.map(_._1).sorted
      }
      val within = byRep.values.flatMap(ms =>
        for (x <- ms; y <- ms if x < y) yield (x, y, 1.0d))
      val cross = repPairs.flatMap { case (r1, r2, c) =>
        for (m1 <- byRep(r1); m2 <- byRep(r2))
          yield (math.min(m1, m2), math.max(m1, m2), c)
      }
      val expect = (within ++ cross).toSet
      val got = TextPipeline.defs("q62_containment")(spark, corpus(texts))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expect)
    }
  }

  test("q63 token budget == brute-force global cumsum at any shard count") {
    // The distributed answer must be shard-count-invariant (shards are
    // contiguous hash ranges, so the per-shard cumsum + offset equals the
    // global cumsum) and budget pruning must be invisible (dropped shards
    // contribute no qualifying rows). Budget 150 forces a real cutoff on
    // these small corpora; shard counts 1/4/16 exercise the degenerate
    // single-shard case, the pruned case, and mostly-empty shards.
    def bpeCount(t: String): Long =
      "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]".r.findAllIn(t).length.toLong
    for (texts <- sampled(8, 25, 3)) {
      val budget = 150L
      val expect = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, bpeCount(t), h60(t)) }
        .sortBy { case (id, _, h) => (h, id) }
        .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n, _)) =>
          (id, n, cum + n)
        }.drop(1)
        .takeWhile(_._3 <= budget)
      val dir = corpus(texts)
      spark.conf.set("graft.budget.tokens", budget.toString)
      try {
        for (shards <- Seq(1, 4, 16)) {
          spark.conf.set("graft.budget.shards", shards.toString)
          val got = CorpusQuality.defs("q63_token_budget")(spark, dir)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
          assert(got === expect, s"shards=$shards")
        }
      } finally {
        spark.conf.unset("graft.budget.tokens")
        spark.conf.unset("graft.budget.shards")
      }
    }
  }

  test("q92 shard manifest == brute global order at any shard count; seed re-permutes") {
    // The manifest must equal the brute-force single-threaded shuffle
    // (shards are contiguous hash-prefix ranges of the global
    // (h, doc_id) order) at every shard count, be bit-identical on
    // rerun, and genuinely re-permute when the seed changes.
    def bpeCount(t: String): Long =
      "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]".r.findAllIn(t).length.toLong
    def brute(texts: Seq[String], seed: String,
        want: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
      val bits = Integer.numberOfTrailingZeros(
        Integer.highestOneBit(want * 2 - 1))
      texts.zipWithIndex
        .map { case (t, i) =>
          (i.toLong, bpeCount(t), h60(t + "#" + seed)) }
        .groupBy { case (_, _, h) => h >>> (60 - bits) }
        .toSeq.map { case (shard, rows) =>
          val ord = rows.sortBy { case (id, _, h) => (h, id) }
          (shard, rows.size.toLong, rows.map(_._2).sum,
            ord.head._1, ord.last._1, rows.map(_._3 % 1000003L).sum)
        }.sortBy(_._1)
    }
    for (texts <- sampled(8, 25, 3)) {
      val dir = corpus(texts)
      def run(): Seq[(Long, Long, Long, Long, Long, Long)] =
        TextPipeline.defs("q92_shuffle_manifest")(spark, dir)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      try {
        for (seed <- Seq("0", "7"); shards <- Seq(1, 4, 16)) {
          spark.conf.set("graft.shuffle.seed", seed)
          spark.conf.set("graft.shuffle.shards", shards.toString)
          assert(run() === brute(texts, seed, shards),
            s"seed=$seed shards=$shards")
        }
        spark.conf.set("graft.shuffle.shards", "16")
        spark.conf.set("graft.shuffle.seed", "0")
        val m0 = run()
        assert(run() === m0, "same seed must be bit-identical on rerun")
        spark.conf.set("graft.shuffle.seed", "7")
        assert(run() !== m0, "a new seed must re-permute the corpus")
      } finally {
        spark.conf.unset("graft.shuffle.seed")
        spark.conf.unset("graft.shuffle.shards")
      }
    }
  }

  test("q68 passage dedup == brute-force 10-word-chunk df computation") {
    for (texts0 <- sampled(8, 25, 3)) {
      // force real boilerplate: duplicate one doc 3× so its passages
      // cross the df ≥ 3 threshold
      val texts = texts0 ++ Seq(texts0.head, texts0.head)
      val segHashes = texts.zipWithIndex.map { case (t, i) =>
        val w = toks(t)
        i.toLong -> (0 until (w.length + 9) / 10).map(k =>
          h60(w.slice(k * 10, k * 10 + 10).mkString(" ")))
      }
      val df = segHashes.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (h, o) => h -> o.size }
      val expect = segHashes.map { case (id, hs) =>
        val boiler = hs.count(h => df(h) >= 3).toLong
        id -> ((hs.size.toLong, boiler,
          boiler.toDouble / hs.size.toDouble))
      }.toMap
      val got = CorpusQuality.defs("q68_passage_dedup")(spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expect)
      assert(got.values.exists(_._2 > 0), "no boilerplate exercised")
    }
  }

  test("q69 incremental LM score == brute-force old-corpus LM, with OOV") {
    for (texts0 <- sampled(8, 25, 3)) {
      // sentinel doc at the highest doc_id: lands in the batch and
      // carries out-of-vocabulary terms, exercising the n_oov path
      val texts = texts0 :+ "qoph resh shin tav alpha beta"
      val cut = (texts.length - 1).toLong * 4 / 5
      val lm = texts.zipWithIndex.filter(_._2 < cut)
        .flatMap(t => toks(t._1)).groupBy(identity)
        .map { case (w, occ) => w -> occ.size.toLong }
      val expect = texts.zipWithIndex.filter(_._2 >= cut)
        .map { case (t, i) =>
          val tfm = toks(t).toSeq.groupBy(identity)
            .map { case (w, occ) => w -> occ.size.toLong }
          val n = tfm.values.sum
          val oov = tfm.collect { case (w, k) if !lm.contains(w) => k }.sum
          val bits = tfm.collect { case (w, k) if lm.contains(w) =>
            k * (bitlen(lm(w)) - 1)
          }.sum
          val mean = if (n - oov > 0) bits.toDouble / (n - oov).toDouble
            else 0.0d
          i.toLong -> ((n, oov, bits, mean))
        }.toMap
      val got = CorpusQuality.defs("q69_incremental_lm_score")(
          spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(got === expect)
      assert(got.values.exists(_._2 > 0), "no OOV exercised")
    }
  }

  /** Brute-force CDC chunking: boundary at hash60(w) % 16 == 0, chunk
    * fingerprint = sequential (acc·31 + h mod p) fold. */
  private def cdcChunks(t: String): Seq[Long] = {
    val w = toks(t)
    val bounds = w.map(x => h60(x) % 16 == 0)
    val chunks = scala.collection.mutable.ArrayBuffer[List[Long]]()
    var cur = List.empty[Long]
    for (j <- w.indices) {
      if (bounds(j) && cur.nonEmpty) { chunks += cur.reverse; cur = Nil }
      cur = (h60(w(j)) % P) :: cur
    }
    if (cur.nonEmpty) chunks += cur.reverse
    chunks.toSeq.map(_.foldLeft(0L)((acc, h) => (acc * 31 + h) % P))
  }

  test("q71 cdc chunks == brute force, and chunking is shift-robust") {
    for (texts0 <- sampled(8, 20, 3)) {
      // duplicate the longest doc, and append a SHIFTED copy (one word
      // prepended): fixed windows would mismatch every passage of the
      // shifted copy, CDC must still share every chunk after the edit
      val donor = texts0.maxBy(t => toks(t).length)
      val texts = texts0 ++ Seq(donor, "inserted " + donor)
      val perDoc = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> cdcChunks(t)
      }
      val df = perDoc.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (h, o) => h -> o.size }
      val expect = perDoc.map { case (id, cs) =>
        val dup = cs.count(c => df(c) >= 2).toLong
        id -> ((cs.size.toLong, dup, dup.toDouble / cs.size.toDouble))
      }.toMap
      val got = CorpusQuality.defs("q71_cdc_chunks")(spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expect)
      // the shift-robustness claim itself: the shifted copy still shares
      // all but at most its first chunk (the one the edit touched) with
      // the duplicate — under 10-word fixed windows a 1-word prepend
      // realigns nothing (unless the inserted word lands on a boundary)
      val shifted = got(texts.length - 1L)
      assert(shifted._2 >= shifted._1 - 1,
        s"CDC lost alignment after a 1-word insertion: $shifted")
    }
  }

  test("q72 incremental novelty == brute-force old-gram-set computation") {
    for (texts <- sampled(10, 30, 3)) {
      val cut = (texts.length - 1).toLong * 4 / 5
      val oldSet = texts.zipWithIndex.filter(_._2 < cut)
        .flatMap(t => shingleSet(t._1, 3)).toSet
      val expect = texts.zipWithIndex.filter(_._2 >= cut)
        .flatMap { case (t, i) =>
          val hs = shingleSet(t, 3)
          if (hs.isEmpty) None
          else {
            val nw = hs.count(h => !oldSet(h)).toLong
            Some(i.toLong -> ((hs.size.toLong, nw,
              nw.toDouble / hs.size.toDouble)))
          }
        }.toMap
      val got = CorpusQuality.defs("q72_incremental_novelty")(
          spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got === expect)
    }
  }

  test("q72/q79 bloom mode: same answers; bloom has no false negatives") {
    // graft.artifacts.bloom=true compiles the membership artifacts
    // (q72's gram set, q79's content keys) into bloom filters that
    // PRUNE the exact joins: a negative probe proves non-membership
    // (novel) and skips verification, a positive probe still verifies
    // against the exact artifact — so both modes must agree
    // bit-for-bit. The no-false-negative half of that argument is also
    // pinned directly: every key actually in the exact artifact must
    // probe bloom-positive.
    import org.apache.spark.sql.functions.{col, expr}
    val dir = "/root/testdata/sf0.001"
    def run72() = CorpusQuality.defs("q72_incremental_novelty")(spark, dir)
      .collect().map(_.toSeq).toSeq
    def run79() = TextPipeline.defs("q79_incremental_triage")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val exact72 = run72(); val exact79 = run79()
    spark.conf.set("graft.artifacts.bloom", "true")
    try {
      assert(run72() === exact72, "bloom mode changed the q72 answer")
      assert(run79() === exact79, "bloom mode changed the q79 answer")
      val cut = spark.read.parquet(s"$dir/documents.parquet")
        .agg(expr("max(doc_id)*4 div 5")).head().getLong(0)
      val gramPath = graft.sources.SideTable.ensure(spark, "gram_set",
          s"$dir#$cut", Some(s"$dir/documents.parquet")) {
        graft.functions.TextFunctions.shingleHashRows(
            spark.read.parquet(s"$dir/documents.parquet")
              .where(col("doc_id") < cut), 3)
          .select(col("h")).distinct()
      }
      val bf = graft.sources.SideTable.ensureBloomOf(spark, "gram_set",
        s"$dir#$cut", Some(s"$dir/documents.parquet"), gramPath, "h")
      val misses = spark.read.parquet(gramPath)
        .where(!graft.functions.Bloom.mightContain(bf, col("h"))).count()
      assert(misses === 0L, s"$misses artifact keys probed bloom-negative")
    } finally spark.conf.unset("graft.artifacts.bloom")
  }

  /** Brute-force 16-perm MinHash + 4×4 band keys — mirrors
    * TextFunctions.minhashes / lshBandKeys arithmetic exactly. */
  private def minhash16(hs: Set[Long]): Seq[Long] =
    (0 until 16).map(j => hs.map(h => (2 * j + 3) * h + j * j + 1).map(_ % P).min)

  private def bandKeys16(m: Seq[Long]): Set[(Int, Long)] =
    (0 until 4).map(b => b -> h60(m.slice(b * 4, b * 4 + 4).mkString(","))).toSet

  test("q74 quality keep == brute-force LSH + union-find + quality argmax") {
    // A third formulation of the full MinHash family (candidates,
    // verify, components, canonical pick), independent of both the
    // Spark plans and the DuckDB oracles. Duplicated + edited donors
    // guarantee real clusters on every generated corpus.
    for (texts0 <- sampled(8, 20, 3)) {
      val donor = texts0.maxBy(t => toks(t).length)
      val texts = texts0 ++ Seq(donor, donor, donor + " extraword")
      val sets = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t, 3) }
        .filter(_._2.nonEmpty).toMap
      val bands = sets.map { case (id, hs) => id -> bandKeys16(minhash16(hs)) }
      val ids = sets.keys.toSeq.sorted
      val pairs = for {
        a <- ids; b <- ids if a < b
        if (bands(a) & bands(b)).nonEmpty
        jac = (sets(a) & sets(b)).size.toDouble /
          (sets(a) | sets(b)).size.toDouble
        if jac >= 0.8
      } yield (a, b)
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      for ((a, b) <- pairs) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      def nWords(id: Long): Long = toks(texts(id.toInt)).length.toLong
      val expect = ids.filter(inPairs).groupBy(find).map { case (root, ms) =>
        val best = ms.maxBy(m => (nWords(m), -m))
        root -> ((ms.size.toLong, best, ms.map(nWords).max))
      }
      val got = TextPipeline.defs("q74_quality_keep")(spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got === expect)
      assert(expect.nonEmpty, "no clusters exercised")
    }
  }

  test("q65 tfidf similarity == brute-force rep-collapsed computation") {
    // The TF-IDF model is defined over DISTINCT CONTENT: exact-dup
    // groups collapse to min-id representatives, df/n_docs count reps,
    // and the doc-level answer is reconstructed (within-group pairs at
    // cos 1.0, cross pairs at their reps' cosine). The appended donor
    // copies force the regime the collapse exists for: a content
    // mirrored ≥9 times used to push every gram it contains past the
    // df≤8 ceiling, suppressing unrelated candidate pairs.
    for (texts0 <- sampled(10, 30, 4)) {
      val donor = texts0.maxBy(t => toks(t).length)
      val texts = texts0 ++ Seq.fill(9)(donor)
      val eligible = texts.zipWithIndex.collect {
        case (t, i) if toks(t).length >= 3 => i.toLong -> toks(t).mkString(" ")
      }
      val groups = eligible.groupBy(_._2).values.map(_.map(_._1).sorted).toSeq
      val members = groups.flatMap(g => g.map(_ -> g.min)).toMap
      val repIds = groups.map(_.min).toSet
      val bags = eligible.collect { case (id, _) if repIds(id) =>
        id -> shingleBag(texts(id.toInt), 3)
      }
      val nDocs = repIds.size.toLong // n_docs counts representatives
      val df = bags.flatMap { case (id, b) => b.keys.map(_ -> id) }
        .groupBy(_._1).map { case (h, o) => h -> o.size.toLong }
      val w = bags.map { case (id, b) =>
        id -> b.map { case (h, tf) =>
          h -> tf * (bitlen(nDocs) - bitlen(df(h)))
        }
      }.toMap
      val nrm = w.map { case (id, v) => id -> v.values.map(x => x * x).sum }
      val rare = df.collect { case (h, d) if d >= 2 && d <= 8 => h }.toSet
      val ids = bags.map(_._1).sorted
      val repPairs = for {
        a <- ids; b <- ids if a < b
        shared = w(a).keySet & w(b).keySet
        if shared.exists(rare)
        if nrm(a) > 0 && nrm(b) > 0
        dot = shared.toSeq.map(h => w(a)(h) * w(b)(h)).sum
        cos = dot.toDouble / (math.sqrt(nrm(a).toDouble) *
          math.sqrt(nrm(b).toDouble))
        if cos >= 0.5
      } yield (a, b, cos)
      val byRep = groups.map(g => g.min -> g).toMap
      val within = groups.flatMap(g =>
        for { a <- g; b <- g if a < b } yield (a, b, 1.0d))
      val cross = repPairs.flatMap { case (ra, rb, cos) =>
        for { a <- byRep(ra); b <- byRep(rb) }
          yield (math.min(a, b), math.max(a, b), cos)
      }
      val expect = (within ++ cross).toSet
      val got = CorpusQuality.defs("q65_tfidf_similarity")(
          spark, corpus(texts))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expect)
      assert(within.nonEmpty, "no dup groups exercised")
    }
  }

  /** Banded MinHash keys of a shingle set — the engine's 16-perm / 4×4
    * layout (band_key = h60 of the comma-joined band mins). */
  private def bandKeys(hs: Set[Long]): Set[(Int, Long)] = {
    val m = (0 until 16).map(j =>
      hs.map(h => (h * (2 * j + 3) + (j * j + 1)) % P).min)
    (0 until 4).map(b =>
      b -> h60((0 until 4).map(r => m(b * 4 + r)).mkString(","))).toSet
  }

  test("q83 decontam == brute-force cross-corpus minhash computation") {
    // ≥ 22 docs so both the eval (id < 20) and train (id ≥ 20) sides
    // are populated; the appended eval copies guarantee verified
    // matches (jac 1.0) so the aggregation path is exercised, not just
    // the empty case.
    for (texts0 <- sampled(22, 30, 4)) {
      val texts = texts0 ++ texts0.take(2)
      val sets = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t, 3) }
        .filter(_._2.nonEmpty).toMap
      val ev = sets.collect { case (id, hs) if id < 20 => id -> bandKeys(hs) }
      val tr = sets.collect { case (id, hs) if id >= 20 => id -> bandKeys(hs) }
      val ver = for {
        (tid, tb) <- tr.toSeq
        (eid, ebb) <- ev.toSeq
        if (tb & ebb).nonEmpty
        inter = (sets(tid) & sets(eid)).size
        jac = inter.toDouble / (sets(tid) | sets(eid)).size.toDouble
        if jac >= 0.5
      } yield (tid, eid, jac)
      val expect = ver.groupBy(_._1).map { case (tid, ms) =>
        val best = ms.maxBy { case (_, eid, jac) => (jac, -eid) }
        tid -> ((ms.size.toLong, best._2, best._3))
      }
      val got = TextPipeline.defs("q83_neardup_decontam")(
          spark, corpus(texts))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      assert(got === expect)
      assert(expect.nonEmpty, "no cross matches exercised")
    }
  }

  test("q84 source report == brute-force per-source aggregation") {
    import spark.implicits._
    // stopword-bearing vocab + 15..30-word docs straddle every q66
    // bound; appended duplicates exercise the dup-rate path.
    val vocabQ = Vector("the", "a", "of", "and", "is", "alpha", "beta",
      "gamma", "delta", "epsilon", "zeta", "koala")
    val gen = for {
      nDocs <- Gen.chooseNum(12, 24)
      docs <- Gen.listOfN(nDocs, for {
        n <- Gen.chooseNum(15, 30)
        ws <- Gen.listOfN(n, Gen.oneOf(vocabQ))
      } yield ws.mkString(" "))
    } yield docs
    val rounds = (0 until 4).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(47L + i)))
    for (texts0 <- rounds) {
      val texts = texts0 ++ texts0.take(3)
      val rows = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, s"src${i % 3}")
      }
      val dir = Files.createTempDirectory("graft-equiv")
        .toFile.getAbsolutePath
      rows.toDF("doc_id", "text", "source").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val stop = Set("the", "a", "of", "and", "is")
      def keep(t: String): Int = {
        val w = toks(t); val n = w.length
        val punct = t.count(c =>
          !(c.isLetterOrDigit || c.isWhitespace)).toDouble /
          (if (t.nonEmpty) t.length else 1)
        val mwl = t.count(!_.isWhitespace).toDouble / n
        val swr = w.count(stop).toDouble / n
        if (n >= 20 && n <= 1000 && mwl >= 3.0 && mwl <= 5.0 &&
          punct <= 0.3 && swr >= 0.02) 1 else 0
      }
      val eligible = rows.collect {
        case (id, t, _) if toks(t).length >= 3 =>
          id -> toks(t).mkString(" ")
      }
      val rep = eligible.groupBy(_._2).values
        .flatMap(g => g.map(_._1 -> g.map(_._1).min)).toMap
      val perSrc = rows.groupBy(_._3).toSeq.map { case (src, rs) =>
        val nDocs = rs.size.toLong
        val nDup = rs.count(r => rep.get(r._1).exists(_ != r._1)).toLong
        val nKeep = rs.map(r => keep(r._2).toLong).sum
        val nGood = rs.count(r =>
          keep(r._2) == 1 && !rep.get(r._1).exists(_ != r._1)).toLong
        (src, nDocs, nDup, nKeep, nGood)
      }
      val totalGood = perSrc.map(_._5).sum
      val expect = perSrc.map { case (src, nd, du, ke, go) =>
        src -> ((nd, du, ke, go,
          du.toDouble / nd.toDouble, ke.toDouble / nd.toDouble,
          if (totalGood > 0) go.toDouble / totalGood.toDouble else 0.0d))
      }.toMap
      val got = CorpusQuality.defs("q84_source_report")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7)))).toMap
      assert(got === expect)
      assert(expect.values.exists(_._2 > 0), "no duplicates exercised")
    }
  }
}
