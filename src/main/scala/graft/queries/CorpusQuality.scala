package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.TextFunctions._

/** Corpus-level quality / curation operators over the `documents` table —
  * the second tranche of LLM-training-data pipeline ops beyond the
  * reference's EL scope (SURVEY.md §7.2 step 7), next to
  * [[TextPipeline]]'s dedup/stats family:
  *
  *  - q61: unigram-LM surprisal score (the CCNet/CCNet-style "perplexity
  *    filter" signal, integer-quantized so it is exactly reproducible
  *    across engines);
  *  - q63: deterministic token-budget sampling (take documents in stable
  *    hash order until a global token budget is exhausted — the "cut a
  *    training mix to N tokens" step), built as a two-level distributed
  *    prefix sum so no single task ever sees the global order;
  *  - q64: first-occurrence novelty (fraction of a document's shingles
  *    never seen in any earlier document — web-crawl snapshots are
  *    mostly-old content, and novelty is the standard freshness signal).
  *
  * Determinism contract (the house rule): every score is integer
  * arithmetic until a single final double division, so results
  * hash-match the DuckDB oracle bit-for-bit.
  */
object CorpusQuality {

  /** q150's Kneser-Ney discount — the ONE definition both the engine
    * binding and the DuckDB oracle interpolate, so the two sides
    * cannot drift; must stay binary-exact (a multiple of 1/256,
    * enforced by [[graft.ops.Text.knScore]]'s require). The
    * `graft.kn.discount` session knob still exists for deployment
    * runs, but the oracle replays THIS value — non-default knobs are
    * not verify-gate material (documented at the binding). */
  private val KnDiscountDefault = 0.75d

  /** q66's C4-style flag battery — one single-pass, fully codegen'd
    * projection shared by q66 (per-doc audit) and q84 (per-source
    * report, `withSource = true`). `source` is only selected when
    * asked for, so q66 keeps its original contract: any frame with
    * (doc_id, text) works. The stopword count is a regex extract
    * (codegen'd) rather than a lambda-HOF token fold — the
    * no-interpreted-HOFs house rule. */
  private def qualityFlags(d: DataFrame,
      withSource: Boolean = false): DataFrame =
    graft.ops.Text.qualityFlags(d, "doc_id", "text",
      if (withSource) Seq("source") else Nil)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q61: unigram-LM surprisal (quantized perplexity proxy) --------
    // CCNet-style quality filtering scores each document under a language
    // model; the unigram LM built from the corpus itself is the in-engine
    // version. Floating-point log-sums are NOT reproducible across
    // engines (summation order changes the ulps), so the per-token
    // surprisal is quantized to the INTEGER bit-length of the token's
    // corpus count: floor(log2 c) = length(bin(c)) - 1 in both engines,
    // summed exactly, with one double division at the end. Low mean bits
    // = rare-token gibberish; high = common-token text.
    //
    // Scale shape: tokens pre-aggregate to (doc, term, k) rows (map-side
    // combinable) BEFORE the LM join, so the join input is distinct pairs,
    // not the raw token stream; the LM itself is a pure wordcount. Both
    // shuffles key on `term`/(doc,term) — uniform by construction. Zipf-
    // head join keys (the few terms in most documents) are exactly the
    // AQE skew-join case; at test SFs the dimension side broadcasts.
    "q61_unigram_surprisal" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val perDoc = d
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("k"))
      val lm = perDoc.groupBy(col("term")).agg(sum(col("k")).as("c"))
      perDoc.join(lm, "term")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_tokens"),
          sum(col("k") * (length(bin(col("c"))) - 1)).as("sum_bits"))
        .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
          (col("sum_bits").cast("double") / col("n_tokens").cast("double"))
            .as("mean_bits"))
        .orderBy("doc_id")
    }),

    // ---- q63: deterministic global token-budget sample -----------------
    // "Cut the corpus to a 10k-token training mix": documents are taken
    // in content-hash order (stable under repartitioning and reruns,
    // unlike rand()) until the cumulative token count passes the budget.
    // A global running sum is the textbook distributed-prefix-sum case:
    // shard by the TOP bits of the hash (shard order ≡ hash order, so
    // shards are contiguous ranges of the global order), cumsum within
    // each shard at full parallelism, then add per-shard offsets computed
    // from the ≤nShards-row shard-total frame — metadata-grade driver
    // work, the only part that is not shard-parallel.
    //
    // Budget pruning: the driver already holds every shard's starting
    // offset, and offsets are monotone in shard id, so shards whose
    // offset exceeds the budget are dropped BEFORE the window — every
    // row there has cum ≥ offset > budget, so the answer is
    // bit-identical. With a 10k-token budget over a 100 TB corpus the
    // sort/cumsum therefore runs over ~one shard, not the whole corpus
    // (a window filter cannot be pushed by Catalyst — the pruning has to
    // happen at plan-construction time, which the collected totals make
    // free). Shard count is `graft.budget.shards` (rounded up to a power
    // of two, default = defaultParallelism), so each shard holds
    // corpus/n — pick n so a shard fits a task at the deployment's
    // scale; the budget itself is `graft.budget.tokens`.
    "q63_token_budget" -> ((s, dir) =>
      tokenBudget(s, Graft.parquetSource(s, dir).table("documents"))),

    // ---- q65: TF-IDF cosine similarity search over shingle features ----
    // "Find related documents" over text alone (no embedding table): each
    // document is a sparse vector of 3-gram-shingle features weighted by
    // tf × idf. Weights are INTEGERS — idf quantizes to bit-lengths
    // (bitlen(n_docs) − bitlen(df)), the q61 trick — so dot products and
    // norms are exact integer sums at any partitioning, and the cosine is
    // deterministic double arithmetic over exact integers (sqrt/×/÷ in a
    // fixed order). The TF-IDF MODEL is built over DISTINCT CONTENT
    // (exact-dup groups collapse to min-id representatives first, the
    // q62 shape): df counts distinct contents and n_docs counts
    // representatives, so a doc mirrored ≥9 times can no longer push
    // every gram it contains past the df≤8 ceiling and suppress
    // unrelated candidate pairs (the r7 recall loss, now closed). The
    // doc-level answer is recovered exactly by expandRepPairs — within-
    // group pairs at cos 1.0 (identical vectors), cross pairs at their
    // representatives' cosine. Candidates come from rare-feature
    // blocking (df 2..8 — the q62 guard: a feature in a million docs
    // generates no candidates); dot/norm vectors are built for candidate
    // reps only (broadcast semi-join), so the corpus-scale feature
    // stream is never cached and never self-joined. Complements q31/q46
    // (embedding ANN) and the dedup family: this is discovery ("what
    // overlaps doc X"), ranked by a weighted measure that downweights
    // boilerplate grams.
    "q65_tfidf_similarity" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val members = TextPipeline.exactGroups(d, 3)
        .localCheckpoint() // one narrow row per doc — corpus-growth, so
        // checkpoint, never cache; read by reps and the final expansion
      val reps = members.where(col("doc_id") === col("rep"))
        .select(col("doc_id"))
      val repDocs = d.join(broadcast(reps), Seq("doc_id"), "left_semi")
      val tf = shingleHashRows(repDocs, 3)
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
      // tf is deliberately LAZY despite three consumers (df model,
      // candidate features, weight build): materializing it was
      // measured SLOWER at sf0.1 (4.9 s vs 3.7 s median — the
      // corpus-scale checkpoint write exceeds what the recomputes
      // cost), and at the design point a corpus-sized executor-disk
      // spill is the q27-lesson anti-pattern. The df model below is
      // the part worth materializing (and, in production, persisting).
      // The df table IS the idf model — the artifact every TF-IDF system
      // materializes once and reuses (a production deployment writes it
      // as a parquet side-table and reads it back; in-session,
      // localCheckpoint). Without materialization, each of its three
      // consumers (rare filter, candidate join, weight join) re-runs the
      // corpus-wide feature aggregation. One row per DISTINCT shingle —
      // and distinct shingles, unlike a word vocabulary (Heaps-law
      // sublinear), grow ~linearly with corpus size, so this is
      // corpus-growth data that must NEVER be `.cache()`d: checkpoint
      // blocks live on executor disk, lineage-truncated, freed on GC.
      val stats = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
      val nDocs = reps.select(count(lit(1)).as("n_docs"))
      val (cand, candDocs) =
        TextPipeline.rareFeatureCandidates(tf, stats, 2, 8)
      // FULL weighted vectors (every feature, not just rare ones) of
      // candidate reps only — norms need the whole vector
      val wC = tf.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .join(stats, "h")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("h"),
          (col("tf") * (length(bin(col("n_docs"))) - length(bin(col("df")))))
            .as("w"))
        .cache() // candidate-bounded; read by nrm + both dot sides
      val nrm = wC.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("nrm"))
      val e1 = wC.select(col("doc_id").as("d1"), col("h"), col("w").as("w1"))
      val e2 = wC.select(col("doc_id").as("d2"), col("h"), col("w").as("w2"))
      val scored = cand.join(e1, "d1").join(e2, Seq("d2", "h"))
        .groupBy(col("d1"), col("d2")).agg(sum(col("w1") * col("w2")).as("dot"))
        .join(nrm.select(col("doc_id").as("d1"), col("nrm").as("nrm1")), "d1")
        .join(nrm.select(col("doc_id").as("d2"), col("nrm").as("nrm2")), "d2")
        // zero-norm guard: a doc whose every feature has weight 0
        // (possible when bitlen(n_docs) == bitlen(df) throughout) would
        // make cos = 0/0 = NaN, and Spark's NaN ordering treats NaN as
        // largest — `cos >= 0.5` would PASS, diverging from IEEE (the
        // brute-force formulation) and DuckDB. Excluded explicitly, and
        // identically in the oracle.
        .where(col("nrm1") > 0 && col("nrm2") > 0)
        .select(col("d1"), col("d2"),
          (col("dot").cast("double") / (sqrt(col("nrm1")) * sqrt(col("nrm2"))))
            .as("cos"))
        .where(col("cos") >= 0.5)
        .localCheckpoint() // eager: allows unpersisting wC NOW
      wC.unpersist()
      TextPipeline.expandRepPairs(members, scored, "cos")
        .orderBy("d1", "d2")
    }),

    // ---- q66: C4-style composite quality filter ------------------------
    // The heuristic keep/drop battery of C4/Gopher-style pipelines as one
    // single-pass, fully codegen'd projection: length bounds, mean word
    // length bounds, punctuation ceiling, stopword-density floor, each
    // reported as its own flag (so downstream can audit WHY a doc
    // dropped) plus the conjunction. The stopword count is a regex
    // extract (codegen'd) rather than a lambda-HOF token fold — the
    // no-interpreted-HOFs-on-hot-paths house rule. Scale: a pure map —
    // no shuffle at all except the presentation sort.
    "q66_quality_filter" -> ((s, dir) =>
      qualityFlags(Graft.parquetSource(s, dir).table("documents"))
        .orderBy("doc_id")),

    // ---- q199: the FULL Gopher quality-rule battery ---------------------
    // Thin binding over [[graft.ops.Text.gopherQuality]] — the
    // published Rae-et-al Table A1 rule set beside q66's compact
    // heuristics and q140's repetition signals: word-count bounds,
    // mean-word-length bounds, symbol/bullet/ellipsis ceilings,
    // alphabetic-word floor, required-stopword floor — every verdict
    // an EXACT integer cross-multiplication, each rule its own flag
    // plus the conjunction (so a deployment can audit WHY a doc
    // dropped).
    "q199_gopher_quality" -> ((s, dir) =>
      graft.ops.Text.gopherQuality(
          Graft.parquetSource(s, dir).table("documents"))
        .orderBy("doc_id")),

    // ---- q68: repeated-passage (boilerplate) detection -----------------
    // The C4/RefinedWeb "line dedup" step adapted to unstructured text:
    // documents are cut into fixed 10-word passages (deterministic
    // segmentation — no layout dependence), and a passage is boilerplate
    // when ≥3 DISTINCT documents contain it (navigation chrome, cookie
    // banners, templated footers). Output is the per-document audit:
    // passage count, boilerplate count, ratio — the signal the cleaning
    // pass drops segments by.
    //
    // Scale shape: segmentation is a pure map (index explode + slice —
    // no lambda HOFs); the df table keys on md5-derived passage hashes
    // (uniform, map-side-combinable count over the distinct (doc, h)
    // pairs); the per-occurrence join keys on the same uniform hash.
    // The boilerplate set grows with corpus content, so it is JOINED on
    // the hash (shuffle on uniform keys), never broadcast — the q57
    // lesson inverted: here the frequent set is the unbounded one.
    "q68_passage_dedup" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      // NULL-text guard: under spark.sql.legacy.sizeOfNull=true a NULL
      // text makes size(ws) = -1 and sequence(0, -1) DESCENDS, emitting
      // two phantom passages the DuckDB oracle doesn't have; the filter
      // keeps both engines at zero rows for NULL docs under any conf
      val segs = d.where(col("text").isNotNull)
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"), col("ws"),
          explode(expr("sequence(0, (size(ws) + 9) div 10 - 1)")).as("i"))
        .select(col("doc_id"),
          hash60(concat_ws(" ",
            slice(col("ws"), col("i") * 10 + 1, lit(10)))).as("h"))
        .localCheckpoint() // one narrow row per passage occurrence
        // (corpus-growth — checkpoint class); feeds both the df
        // aggregate and the per-occurrence flagging join
      val dfT = segs.distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
      segs.join(dfT, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_boiler"))
        .select(col("doc_id"), col("n_segs"), col("n_boiler"),
          (col("n_boiler").cast("double") / col("n_segs").cast("double"))
            .as("boiler_ratio"))
        .orderBy("doc_id")
    }),

    // ---- q71: content-defined chunk dedup (shift-robust passages) ------
    // q68's fixed 10-word windows break under a single-word insertion:
    // every downstream passage shifts and nothing matches. Content-
    // defined chunking (the dedup-storage/rsync idea) cuts at words
    // whose hash ≡ 0 (mod 16) instead — boundaries move WITH the
    // content, so an edit disturbs only the chunk it touches and
    // duplicated passages re-align immediately after. Chunks are
    // fingerprinted with the q25 rolling hash computed positionally
    // (Σ h_i·31^(n−1−i) mod p — codegen'd SUM, no lambda fold), a chunk
    // is duplicated when ≥2 distinct docs contain it, and the per-doc
    // audit mirrors q68. Scale shape: boundary flags and chunk ids are
    // per-doc windows (bounded by doc length, evenly distributed); the
    // df join keys on the uniform fingerprint hash; everything
    // map-side-combines. Expected chunk length is the boundary modulus
    // (16 words) — the resolution/robustness knob.
    "q71_cdc_chunks" -> ((s, dir) => {
      val maxW = 8192
      val pows = {
        val a = new Array[Long](maxW); a(0) = 1L
        for (i <- 1 until maxW) a(i) = a(i - 1) * 31L % HashP
        a.toSeq
      }
      val powArr = typedLit(pows)
      val d = Graft.parquetSource(s, dir).table("documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val tok = d
        .select(col("doc_id"),
          posexplode(words(col("text"))).as(Seq("pos", "w")))
        .select(col("doc_id"), col("pos"),
          pmod(hash60(col("w")), lit(HashP)).as("h"),
          when(pmod(hash60(col("w")), lit(16L)) === 0, 1L).otherwise(0L)
            .as("b"))
      val wCh = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wIn = Window.partitionBy(col("doc_id"), col("chunk"))
        .orderBy(col("pos"))
      val wN = Window.partitionBy(col("doc_id"), col("chunk"))
      val chunkHash = tok
        .withColumn("chunk", sum(col("b")).over(wCh))
        .withColumn("rn", row_number().over(wIn))
        .withColumn("n", count(lit(1)).over(wN))
        .select(col("doc_id"), col("chunk"),
          // exponent n − rn, 1-based table index n − rn + 1; docs past
          // the power table fail loudly (the fingerprintRows contract)
          when(col("n") <= maxW,
            pmod(col("h") * element_at(powArr,
              (col("n") - col("rn") + 1).cast("int")), lit(HashP)))
            .otherwise(raise_error(concat(
              lit(s"q71 supports at most $maxW words per chunk; doc "),
              col("doc_id"), lit(" has "), col("n")))).as("term"))
        .groupBy(col("doc_id"), col("chunk"))
        .agg(pmod(sum(col("term")), lit(HashP)).as("ch"))
        .localCheckpoint() // one narrow row per chunk (corpus-growth —
        // checkpoint class); feeds BOTH the df aggregate and the
        // occurrence join — unmaterialized, each side re-runs the
        // token explode plus three window shuffles
      val dfT = chunkHash.select(col("doc_id"), col("ch")).distinct()
        .groupBy(col("ch")).agg(count(lit(1)).as("df"))
      chunkHash.join(dfT, "ch")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_chunks").cast("double"))
            .as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // ---- q69: incremental LM scoring against a persisted model ---------
    // The scoring-side counterpart of q67's incremental dedup: q61
    // rebuilds its unigram LM from the full corpus every run, but a
    // production pipeline scores each new crawl batch against the LM of
    // the EXISTING corpus — persisted once as a parquet side-table
    // ([[graft.sources.SideTable]]), read back at scoring time. The
    // batch (doc_id ≥ the q67 cut) is tokenized and pre-aggregated to
    // (doc, term, k) alone; the old corpus contributes only the
    // artifact scan. Out-of-vocabulary tokens are reported as their own
    // signal (n_oov — high OOV = topic/language drift or gibberish);
    // mean_bits averages over in-vocab tokens with the same integer
    // bit-length quantization as q61 (cross-engine exact).
    "q69_incremental_lm_score" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val lmPath = graft.sources.SideTable.ensure(
          s, "lm_model", s"$dir#$cut", Some(s"$dir/documents.parquet")) {
        Graft.parquetSource(s, dir).table("documents")
          .where(col("doc_id") < cut)
          .select(explode(words(col("text"))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("c"))
      }
      val lm = s.read.parquet(lmPath)
      val inv = col("n_tokens") - col("n_oov")
      d.where(col("doc_id") >= cut)
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("k"))
        .join(lm, Seq("term"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_tokens"),
          sum(when(col("c").isNull, col("k")).otherwise(0L)).as("n_oov"),
          sum(when(col("c").isNotNull,
            col("k") * (length(bin(col("c"))) - 1)).otherwise(0L))
            .as("sum_bits"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          col("sum_bits"),
          when(inv > 0, col("sum_bits").cast("double") / inv.cast("double"))
            .otherwise(lit(0.0d)).as("mean_bits"))
        .orderBy("doc_id")
    }),

    // ---- q72: incremental novelty against a persisted gram set ---------
    // The crawl-triage metric: what fraction of each new batch document
    // is content the corpus has never seen? q64 answers it corpus-wide
    // (first occurrence by doc_id); the production shape answers it
    // INCREMENTALLY — the old corpus's distinct 3-gram hash set persists
    // as a side-table ([[graft.sources.SideTable]]) and each batch doc
    // left-joins its distinct grams against it. Only the batch is ever
    // shingled; the artifact join keys on the uniform gram hash. With
    // `graft.artifacts.bloom=true` the artifact additionally compiles
    // to a bloom filter ([[graft.sources.SideTable.ensureBloomOf]]):
    // bloom-NEGATIVE grams are proven novel without touching the exact
    // join (no false negatives), so only bloom-positives — the already-
    // seen fraction plus an ε of false positives — reach the
    // artifact-scan join. On a mostly-novel crawl that shrinks the
    // join's probe side toward zero; the exact join stays the verifier
    // for every positive, so the answer is bit-identical in both modes
    // (CorpusEquivalenceSpec). Completes the incremental family: dedup
    // (q67), LM scoring (q69), novelty.
    "q72_incremental_novelty" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val gramPath = graft.sources.SideTable.ensure(
          s, "gram_set", s"$dir#$cut", Some(s"$dir/documents.parquet")) {
        shingleHashRows(
            Graft.parquetSource(s, dir).table("documents")
              .where(col("doc_id") < cut), 3)
          .select(col("h")).distinct()
      }
      val old = s.read.parquet(gramPath).withColumn("seen", lit(1))
      val sh = shingleHashRows(d.where(col("doc_id") >= cut), 3).distinct()
      val flagged =
        if (s.conf.get("graft.artifacts.bloom", "false").toBoolean) {
          val bf = graft.sources.SideTable.ensureBloomOf(s, "gram_set",
            s"$dir#$cut", Some(s"$dir/documents.parquet"), gramPath, "h")
          val probed = sh.withColumn("maybe",
            graft.functions.Bloom.mightContain(bf, col("h")))
          probed.where(col("maybe")).drop("maybe")
            .join(old, Seq("h"), "left")
            .unionByName(probed.where(!col("maybe")).drop("maybe")
              .withColumn("seen", lit(null).cast("int")))
        } else sh.join(old, Seq("h"), "left")
      flagged
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new"))
        .select(col("doc_id"), col("n_grams"), col("n_new"),
          (col("n_new").cast("double") / col("n_grams").cast("double"))
            .as("novelty"))
        .orderBy("doc_id")
    }),

    // ---- q89: bloom-compilation audit — measured FP rate vs exact sets -
    // "Measure, don't guess" for the graft.artifacts.bloom knob (the
    // q70/q73/q82/q87 discipline applied to membership compilation):
    // for each bloom-compiled membership artifact (q72's gram set,
    // q79's content keys), probe EVERY batch key and report the exact,
    // engine-independent set cardinalities (keys, probes, seen, novel)
    // plus a per-engine accuracy boolean — the q35 sketch convention:
    // Spark certifies its measured false-positive rate among
    // TRUE-NOVEL probes stays under 1% (the 16-bit/key sizing predicts
    // ~5·10⁻⁴; a broken filter reads ~100%), DuckDB's exact path is
    // trivially true. The FP count itself is engine-specific state and
    // deliberately not a column. Deterministic: the filter's bit
    // pattern is a pure function of the key set and sizing, so the
    // boolean cannot flap between runs.
    "q89_bloom_audit" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val dataPath = Some(s"$dir/documents.parquet")
      val gramPath = graft.sources.SideTable.ensure(
          s, "gram_set", s"$dir#$cut", dataPath) {
        shingleHashRows(
            Graft.parquetSource(s, dir).table("documents")
              .where(col("doc_id") < cut), 3)
          .select(col("h")).distinct()
      }
      val gramBf = graft.sources.SideTable.ensureBloomOf(s, "gram_set",
        s"$dir#$cut", dataPath, gramPath, "h")
      val keyPath = graft.sources.SideTable.ensure(s, "content_keys",
          s"$dir#$cut", dataPath) {
        Graft.parquetSource(s, dir).table("documents")
          .where(col("doc_id") < cut && col("text").isNotNull)
          .select(md5(concat_ws(" ", words(col("text")))).as("gk"))
          .distinct()
      }
      val keyBf = graft.sources.SideTable.ensureBloomOf(s, "content_keys",
        s"$dir#$cut", dataPath, keyPath, "gk")
      // one audit row: (exact cardinalities, Spark's FP-bound boolean).
      // n_keys comes from the artifact MANIFEST — these artifacts are
      // corpus-growth, and re-counting one per audit would be the
      // second full scan ensureBloomOf's own contract forbids;
      // consistentRows cross-checks the manifest's recorded file count
      // against the directory, so a torn append (delta landed, manifest
      // stale) triggers the recount instead of under-reporting n_keys.
      def audit(name: String, exactPath: String, keyCol: String,
          probes: DataFrame, bf: Array[Byte]): DataFrame = {
        val exact = s.read.parquet(exactPath)
        val nKeys = graft.sources.SideTable.consistentRows(s, exactPath)
        val flagged = probes
          .withColumn("maybe",
            graft.functions.Bloom.mightContain(bf, col(keyCol)))
          .join(exact.withColumn("present", lit(1)), Seq(keyCol), "left")
        flagged.agg(
            count(lit(1)).as("n_probes"),
            sum(when(col("present") === 1, 1L).otherwise(0L)).as("n_seen"),
            sum(when(col("present").isNull && col("maybe"), 1L)
              .otherwise(0L)).as("n_fp"))
          .select(lit(name).as("artifact"), lit(nKeys).as("n_keys"),
            col("n_probes"), col("n_seen"),
            (col("n_probes") - col("n_seen")).as("n_novel"),
            (when(col("n_probes") - col("n_seen") === 0, lit(true))
              .otherwise((col("n_fp").cast("double") /
                (col("n_probes") - col("n_seen")).cast("double"))
                <= lit(0.01d)))
              .as("fp_within_bound"))
      }
      val gramProbes = shingleHashRows(d.where(col("doc_id") >= cut), 3)
        .select(col("h")).distinct()
      val keyProbes = d.where(col("doc_id") >= cut && col("text").isNotNull)
        .select(md5(concat_ws(" ", words(col("text")))).as("gk"))
        .distinct()
      audit("content_keys", keyPath, "gk", keyProbes, keyBf)
        .unionByName(audit("gram_set", gramPath, "h", gramProbes, gramBf))
        .orderBy("artifact")
    }),

    // ---- q77: the curation pipeline, composed --------------------------
    // A production training-mix build runs quality filter → dedup keep
    // list → token budget as ONE job, not three exports: q66's keep
    // predicate drops low-quality docs, q74's quality-canonical keep
    // list drops every near-dup cluster member except its best doc
    // (clusters computed ONCE via the session pair memo — the
    // single-derivation property the memo/artifact seams exist for,
    // counter-pinned in PlanQualitySpec), and the survivors flow into
    // q63's sharded token-budget cut. Composition is by DataFrame: the
    // filter is a codegen predicate on the scan, the drop list is a
    // tiny broadcast anti-join, and the budget stage sees only
    // survivors — no re-derivation, no intermediate materialization
    // beyond what the component operators already own.
    "q77_curation_pipeline" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val drop = TextPipeline.qualityDropList(s, dir)
        .localCheckpoint() // tiny (cluster members only); the budget
        // stage consumes the survivor frame twice (shard totals + the
        // window pass), so the argmax/anti-join build side must not
        // re-derive per pass
      val survivors = d.where(qualityKeepCond)
        .join(broadcast(drop), Seq("doc_id"), "left_anti") // the corpus
        // never shuffles to drop cluster members
      tokenBudget(s, survivors)
    }),

    // ---- q64: first-occurrence novelty ---------------------------------
    // Fraction of a document's distinct 3-gram shingles whose FIRST
    // occurrence (minimum doc_id over the corpus) is this document. A
    // re-crawl of old content scores ~0; genuinely new text scores ~1.
    // Two shuffles, both uniform and map-side combinable: min(doc_id)
    // per gram hash, then per-doc counts over the gram→first-owner join
    // (each gram key has exactly one first-owner row — no skew
    // amplification on the probe side).
    "q64_novelty" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val sh = shingleHashRows(d, 3).distinct()
      val first = sh.groupBy(col("h")).agg(min(col("doc_id")).as("fo"))
      sh.join(first, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("fo") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_sh"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_sh").cast("double"))
            .as("novelty"))
        .orderBy("doc_id")
    }),

    // ---- q84: per-source curation report → mixing weights --------------
    // The domain-reputation step of RefinedWeb/DCLM-style pipelines:
    // aggregate each source's measured curation signals — exact-dup
    // rate (q26's content groups) and quality-keep rate (q66's flag
    // battery) — into ONE report row per source, plus a sampling
    // weight ∝ the source's GOOD docs (kept ∧ non-duplicate), the
    // number q47's weighted mixer consumes as its rate input. Scale:
    // two map-side-combinable aggregations (content groups; per-source
    // counts — |sources| rows), one ≤|sources|-row frame joined against
    // a broadcast 1-row total. Every rate is exact-integer counts until
    // one final double division, so the report is bit-stable — a
    // corpus-wide weight can't be "approximately" reproducible when
    // reruns must produce identical mixes.
    "q84_source_report" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val flags = qualityFlags(d, withSource = true)
        .select(col("doc_id"), col("source"), col("keep"))
      // exact-dup membership (docs under 3 words have no group → never
      // duplicates, same convention as the q27/q62 family)
      val members = TextPipeline.exactGroups(d, 3)
        .select(col("doc_id"), col("rep"))
      val agg = flags.join(members, Seq("doc_id"), "left")
        .select(col("source"), col("keep"),
          (col("rep").isNotNull && col("doc_id") =!= col("rep"))
            .cast("int").as("is_dup"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup")).cast("long").as("n_dup"),
          sum(col("keep")).cast("long").as("n_keep"),
          sum((col("keep") === 1 && col("is_dup") === 0).cast("int"))
            .cast("long").as("n_good"))
        .localCheckpoint() // ≤ |sources| rows; read by the total AND
        // the report projection
      val tot = agg.agg(sum(col("n_good")).cast("long").as("total_good"))
      agg.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_dup"),
          col("n_keep"), col("n_good"),
          (col("n_dup").cast("double") / col("n_docs").cast("double"))
            .as("dup_rate"),
          (col("n_keep").cast("double") / col("n_docs").cast("double"))
            .as("keep_rate"),
          when(col("total_good") > 0,
            col("n_good").cast("double") / col("total_good").cast("double"))
            .otherwise(lit(0.0d)).as("weight"))
        .orderBy("source")
    }),

    // ---- q93: curation provenance ledger -------------------------------
    // "Why is my document (not) in the training set?" — the per-doc
    // lineage row a data owner asks for and a compliance review
    // requires. One row per corpus doc: the FIRST pipeline stage that
    // decided its fate, in q77's exact stage order — 'quality' (fails
    // q66's keep conjunction), 'near_dup' (on q74's quality-canonical
    // drop list), 'budget' (survived both, cut by q63's token budget),
    // or 'kept'. Composition mirrors q77 exactly (same predicate, same
    // memo-backed drop list, same budget stage over the same survivor
    // frame), so ledger['kept'] IS q77's output set — the audit and the
    // artifact cannot drift apart. Scale: one corpus scan labeled by a
    // codegen predicate + two joins — the drop list is cluster-member-
    // bounded (broadcast), the budget keep list is budget-bounded, not
    // corpus-bounded (a trillion-token budget at 100 TB outgrows the
    // hint: drop it and AQE plans the join; the ledger is still one
    // shuffle of the thin 2-col frame at worst).
    "q93_curation_ledger" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val drop = TextPipeline.qualityDropList(s, dir)
        .withColumn("near_dup", lit(1))
        .localCheckpoint() // cluster-member-bounded; read twice (the
        // survivor anti-join and the ledger label join)
      val survivors = d.where(qualityKeepCond)
        .join(broadcast(drop), Seq("doc_id"), "left_anti")
      val kept = tokenBudget(s, survivors)
        .select(col("doc_id"), lit(1).as("in_budget"))
      d.select(col("doc_id"),
          coalesce(qualityKeepCond, lit(false)).as("q"))
        .join(broadcast(drop.select(col("doc_id"), col("near_dup"))),
          Seq("doc_id"), "left")
        .join(broadcast(kept), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(!col("q"), lit("quality"))
            .when(col("near_dup").isNotNull, lit("near_dup"))
            .when(col("in_budget").isNull, lit("budget"))
            .otherwise(lit("kept")).as("outcome"))
        .orderBy("doc_id")
    }),

    // ---- q95: incremental per-source reputation ------------------------
    // q84's report as the crawl loop maintains it: the old corpus's
    // per-source counters (n_docs/n_dup/n_keep/n_good — exact integers,
    // so they MERGE exactly) persist as a ≤|sources|-row side-table,
    // and each batch contributes only its own deltas — quality flags
    // are per-doc local, and a batch doc is a duplicate iff a
    // same-content-key doc with a smaller id exists, i.e. its key is in
    // the old corpus's key artifact (q79's "content_keys" table,
    // SHARED: same name + identity ⇒ built once per snapshot for both
    // operators) or an earlier batch doc has the key. Old docs' dup
    // status never changes when a batch arrives (group reps are minimal
    // ids), so counter merging is associative and the merged report is
    // BIT-IDENTICAL to q84's batch-unaware recompute — which is exactly
    // what the oracle asserts. Scale: zero old-corpus document reads
    // (one ≤|sources|-row counter read + one narrow key-artifact scan
    // probed by the broadcast batch key set — the q79 membership
    // discipline), then |batch|-proportional flag/delta work.
    "q95_incremental_source_report" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val cPath = srcCounterIndex(s, dir, cut)
      val keyPath = TextPipeline.contentKeyIndex(s, dir, cut)
      val batch = d.where(col("doc_id") >= cut)
      val bkeys = batch.where(size(words(col("text"))) >= 3)
        .select(col("doc_id"),
          md5(concat_ws(" ", words(col("text")))).as("gk"))
        .localCheckpoint() // |batch| rows; probe build, first-id agg,
        // and the dup-flag join all read it
      // batch keys broadcast against the artifact scan, never the
      // reverse; hits are ≤ |batch| by construction
      val hitKeys = s.read.parquet(keyPath)
        .join(broadcast(bkeys.select(col("gk")).distinct()),
          Seq("gk"), "left_semi")
        .withColumn("old_hit", lit(1))
      val firstIds = bkeys.groupBy(col("gk"))
        .agg(min(col("doc_id")).as("first_id"))
      val bdup = bkeys
        .join(broadcast(hitKeys), Seq("gk"), "left")
        .join(broadcast(firstIds), Seq("gk"))
        .select(col("doc_id"),
          (col("old_hit").isNotNull || col("doc_id") > col("first_id"))
            .cast("int").as("is_dup"))
      val deltas = qualityFlags(batch, withSource = true)
        .select(col("doc_id"), col("source"), col("keep"))
        .join(broadcast(bdup), Seq("doc_id"), "left")
        .select(col("source"), col("keep"),
          coalesce(col("is_dup"), lit(0)).as("is_dup"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup")).cast("long").as("n_dup"),
          sum(col("keep")).cast("long").as("n_keep"),
          sum((col("keep") === 1 && col("is_dup") === 0).cast("int"))
            .cast("long").as("n_good"))
      lastIncrementalSrcPlan = deltas.queryExecution.executedPlan.toString
      val merged = s.read.parquet(cPath).unionByName(deltas)
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_dup")).cast("long").as("n_dup"),
          sum(col("n_keep")).cast("long").as("n_keep"),
          sum(col("n_good")).cast("long").as("n_good"))
        .localCheckpoint() // ≤ |sources| rows; read by total AND report
      val tot = merged.agg(sum(col("n_good")).cast("long")
        .as("total_good"))
      merged.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_dup"),
          col("n_keep"), col("n_good"),
          (col("n_dup").cast("double") / col("n_docs").cast("double"))
            .as("dup_rate"),
          (col("n_keep").cast("double") / col("n_docs").cast("double"))
            .as("keep_rate"),
          when(col("total_good") > 0,
            col("n_good").cast("double") / col("total_good").cast("double"))
            .otherwise(lit(0.0d)).as("weight"))
        .orderBy("source")
    }),

    // ---- q100: dataset card --------------------------------------------
    // The publish-the-datasheet op: ONE row summarizing the corpus for a
    // dataset card — sizes (docs, tokens, chars, vocabulary), diversity
    // (sources, languages), and health (exact-dup rate, quality keep
    // rate), each reusing the exact semantics of its dedicated operator
    // (dup = q26/q84's rep rule, keep = q66's flag battery, vocab =
    // q56's term stream) so the card can never disagree with the
    // operators it summarizes. Scale: four independent corpus-linear
    // aggregates, each collapsing to ≤1 row BEFORE the broadcast
    // crossJoins compose the card; exact integers until three final
    // divisions in a fixed op order. At 100 TB this is the cheap job you
    // run on every published snapshot.
    "q100_dataset_card" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val docStats = d.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        coalesce(sum(when(col("text").isNull, lit(0))
          .otherwise(size(words(col("text"))))), lit(0)).cast("long")
          .as("n_tokens"),
        coalesce(sum(coalesce(length(col("text")), lit(0))), lit(0))
          .cast("long").as("n_chars"))
      val dup = TextPipeline.exactGroups(d, 3)
        .select(col("doc_id"), col("rep"))
        .agg(coalesce(sum((col("doc_id") =!= col("rep")).cast("int")),
          lit(0)).cast("long").as("n_dup"))
      val keep = qualityFlags(d)
        .agg(coalesce(sum(col("keep")), lit(0)).cast("long").as("n_keep"))
      val vocab = d.select(explode(words(col("text"))).as("term"))
        .agg(countDistinct(col("term")).as("vocab_size"))
      docStats.crossJoin(broadcast(dup)).crossJoin(broadcast(keep))
        .crossJoin(broadcast(vocab))
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("n_tokens"), col("n_chars"), col("vocab_size"),
          col("n_dup"), col("n_keep"),
          (col("n_dup").cast("double") / col("n_docs").cast("double"))
            .as("dup_rate"),
          (col("n_keep").cast("double") / col("n_docs").cast("double"))
            .as("keep_rate"),
          (col("n_tokens").cast("double") / col("n_docs").cast("double"))
            .as("tokens_per_doc"))
    }),

    // ---- q101: incremental vocabulary vs persisted term artifact -------
    // q98's growth audit as the crawl loop maintains it (the incremental
    // family's tokenizer member, next to q67/q69/q72/q78/q95): the old
    // corpus's distinct terms persist once per snapshot as a side-table,
    // and each batch reports how many genuinely-new terms it adds — the
    // "is my tokenizer's vocab budget still sized right?" number, per
    // batch, with ZERO old-corpus document reads. Membership follows the
    // q79/q95 discipline: the batch's (small) distinct-term set
    // broadcasts against the narrow artifact scan, never the reverse;
    // hits are ≤ |batch terms| by construction. The oracle is the
    // strongest equivalence available: a batch-UNAWARE single pass over
    // the whole token stream (first-seen + batch-membership per term)
    // must reproduce the artifact-path counts exactly, at any cut —
    // vocab_size = n_old + n_new is then the same number q98/q56 see.
    "q101_incremental_vocab" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val termPath = vocabTermIndex(s, dir, cut)
      val old = s.read.parquet(termPath)
      val btermsLazy = d.where(col("doc_id") >= cut)
        .select(explode(words(col("text"))).as("term")).distinct()
      val bterms = btermsLazy.localCheckpoint() // ≤ |batch vocab| rows;
        // read by the probe, the anti-join, and the batch count
      val hits = old.join(broadcast(bterms), Seq("term"), "left_semi")
      val newTermsLazy = bterms
        .join(broadcast(hits), Seq("term"), "left_anti")
      lastIncrementalVocabPlan =
        btermsLazy.queryExecution.executedPlan.toString +
          "\n-- probe --\n" +
          newTermsLazy.queryExecution.executedPlan.toString
      val nOld = old.agg(count(lit(1)).as("n_old_terms"))
      val nBatch = bterms.agg(count(lit(1)).as("n_batch_terms"))
      val nNew = newTermsLazy.agg(count(lit(1)).as("n_new_terms"))
      nOld.crossJoin(broadcast(nBatch)).crossJoin(broadcast(nNew))
        .select(col("n_old_terms"), col("n_batch_terms"),
          col("n_new_terms"),
          (col("n_old_terms") + col("n_new_terms")).as("vocab_size"))
    }),

    // ---- q102: BM25 ranked retrieval ----------------------------------
    // Query-set retrieval over the corpus — "find the k most relevant
    // documents for each query" — the retrieval primitive RAG pipelines
    // and dedup-by-retrieval workflows sit on, complementing q65 (TF-IDF
    // cosine SIMILARITY between documents) with a proper ranked-retrieval
    // scoring function. Queries are a deterministic hash sample of the
    // corpus itself (the q39/q52 discipline — no rand()); terms are word
    // 3-gram shingle hashes (the q65 feature space: on a small-vocabulary
    // corpus unigram df saturates and every idf would be 0).
    //
    // Scoring is REAL BM25 (k1=1.2, b=0.75) made bit-exact across
    // engines: with k1=6/5 and b=3/4, the per-term score
    //   idf · tf'(k1+1) / (tf' + k1(1−b+b·dl/avgdl)),  avgdl = T/N
    // multiplies through to the integer ratio
    //   idf · 22·tf'·T / (10·T·tf' + 3·T + 9·dl·N)
    // which both engines evaluate as exact integer floor-division scaled
    // to parts-per-million (DECIMAL(38,0) here, HUGEINT in DuckDB — no
    // bigint overflow at any corpus size; the quotient itself is ≤
    // idf·2.2·10⁶, far under 2^53). idf is the house integer-log2
    // surrogate bitlen(N)−bitlen(df) (q65's grade — no transcendentals
    // anywhere, so no libm divergence), and tf saturates at 15 (BM25's
    // k1-saturation made explicit). Per-(query,doc) scores are then
    // SUMS OF INTEGERS — order-free, partition-invariant, exactly equal
    // to the oracle's.
    //
    // Scale shape: the query set is a broadcast-sized sample; candidate
    // generation joins query terms to the corpus posting lists ONLY for
    // df-capped terms (`graft.bm25.dfCap`) — the WAND-style upper-bound
    // prune: a term in half the corpus contributes ~nothing to BM25 (idf
    // ≈ 0) but would drag the whole corpus into the join. Scoring work
    // is candidate-bounded (|cand| · |query dl| worst case), and the
    // final top-k rides the mergeable TopK aggregate — k rows per query
    // cross the wire, never a per-query sort of the corpus. At
    // deployment, tf/stats/dl/tot persist as a SideTable inverted-index
    // artifact bucketed by `h` (the q78 IVF discipline applied to text);
    // per-batch retrieval then reads only the probed buckets.
    // Thin binding over the public op ([[graft.ops.Retrieval.bm25]] —
    // see the op for the candidate/scoring shape): queries are a
    // deterministic hash sample of the corpus itself (the q39/q52
    // discipline — no rand()), so excludeSelf drops the trivial
    // self-retrieval rows.
    "q102_bm25_retrieval" -> ((s, dir) => {
      val dfCap = s.conf.getOption("graft.bm25.dfCap").map(_.toInt)
        .getOrElse(16)
      val k = s.conf.getOption("graft.bm25.k").map(_.toInt).getOrElse(10)
      val d = Graft.parquetSource(s, dir).table("documents")
      val queries = d.where(pmod(hash60(col("text")), lit(20)) === 0)
        .select(col("doc_id"), col("text"))
      graft.ops.Retrieval.bm25(d, queries, k, dfCap, excludeSelf = true)
    }),

    // ---- q135: hybrid retrieval — RRF fusion of BM25 and dense ANN -----
    // Thin binding over [[graft.ops.Retrieval.rrfFuse]] — the
    // hybrid-search default: q102's sparse BM25 ranking fused with the
    // exact dense cosine ranking over the SAME query ids (vec_id ≡
    // doc_id in the testdata), each contributing ⌊1e6/(60+rank)⌋ ppm.
    // Rank-only fusion is the point: ppm and cosine are incomparable
    // scales, RRF never compares them.
    "q135_hybrid_rrf" -> ((s, dir) => {
      val k = s.conf.getOption("graft.bm25.k").map(_.toInt).getOrElse(10)
      val sparse = defs("q102_bm25_retrieval")(s, dir)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val d = Graft.parquetSource(s, dir).table("documents")
      val qids = d.where(pmod(hash60(col("text")), lit(20)) === 0)
        .select(col("doc_id").as("vec_id"))
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val dense = graft.ops.Embed.cosineTopK(emb,
          emb.join(broadcast(qids), Seq("vec_id"), "left_semi"),
          k, excludeSelf = true)
        .select(col("q_id").as("query_id"), col("vec_id").as("doc_id"),
          col("rank"))
      graft.ops.Retrieval.rrfFuse(Seq(sparse, dense), k)
    }),

    // ---- q103: bigram-LM conditional surprisal -------------------------
    // q61's CCNet-style perplexity filter upgraded to bigram context:
    // per-token conditional surprisal −log₂ p(w₂|w₁) with the corpus
    // itself as the LM, in the house integer grade — p(w₂|w₁) =
    // c(w₁w₂)/ctx(w₁) (ctx counts w₁ only where a bigram follows, so the
    // conditional normalizes), bits = bitlen(ctx)−bitlen(c₂) =
    // ⌊log₂ ctx⌋−⌊log₂ c₂⌋ ≥ 0. Unigram surprisal flags rare WORDS;
    // conditional surprisal flags improbable TRANSITIONS — scrambled or
    // machine-mangled text scores high even when every word is common,
    // which is exactly what q61 cannot see.
    //
    // Scale shape: ONE corpus scan — the dual-window generator emits the
    // unigram and bigram stream per position in a single pass (the q75
    // discipline); everything after is three map-side-combinable
    // aggregates over the per-doc gram frame and two narrow LM joins.
    // Exact integers until the one final division. At deployment the
    // ctx/bigram LM frames persist as a SideTable artifact (the q69
    // incremental-LM discipline extends verbatim: batch docs score
    // against the frozen LM with zero old-corpus reads).
    "q103_bigram_surprisal" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val perDoc = dualShingleHashRows(d, 1, 2)
        .where(col("h2").isNotNull)
        .groupBy(col("doc_id"), col("h1"), col("h2"))
        .agg(count(lit(1)).as("k"))
        .localCheckpoint() // feeds both LM aggregates and the scoring join
      val ctx = perDoc.groupBy(col("h1")).agg(sum(col("k")).as("c1"))
      val big = perDoc.groupBy(col("h2")).agg(sum(col("k")).as("c2"))
      perDoc.join(ctx, "h1").join(big, "h2")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_bigrams"),
          sum(col("k") * (length(bin(col("c1"))) - length(bin(col("c2")))))
            .as("sum_bits"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
          (col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
            .as("mean_bits"))
        .orderBy("doc_id")
    }),

    // ---- q150: Kneser-Ney-smoothed bigram scoring ----------------------
    // Thin binding over [[graft.ops.Text.knScore]] — q103's perplexity
    // signal with the smoothing real LM quality filters use
    // (interpolated absolute discounting + continuation probability):
    // singleton bigrams stop dominating, productive contexts
    // redistribute their held-out mass by how many distinct contexts a
    // word follows. Fixed-point 2^20 scores keep the per-doc sum an
    // exact integer. Knob: graft.kn.discount ∈ (0,1), binary-exact
    // (multiple of 1/256) values only — NOTE the oracle interpolates
    // [[KnDiscountDefault]], so a non-default knob is a deployment
    // setting, not a verify-gate one (the oracle pin).
    "q150_kn_bigram" -> ((s, dir) => {
      val d0 = s.conf.getOption("graft.kn.discount").map(_.toDouble)
        .getOrElse(KnDiscountDefault)
      graft.ops.Text.knScore(
          Graft.parquetSource(s, dir).table("documents"), d0)
        .orderBy("doc_id")
    }),

    // ---- q104: DSIR-style importance selection -------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023): pick
    // raw-pool documents whose hashed-feature distribution looks like a
    // TARGET domain, by per-token LM likelihood ratio. The target is a
    // designated source (`graft.dsir.targetSource` — the "quality domain
    // proxy"; at deployment, a curated corpus like Wikipedia). Faithful
    // to the paper where it matters at scale: features are HASH BUCKETS
    // (`graft.dsir.buckets`, default 10⁴ — collisions intentional), so
    // BOTH LMs are ≤ buckets rows REGARDLESS of corpus size and join as
    // broadcasts; the corpus-growth per-doc frame never shuffles to meet
    // them. The house integer grade replaces log p with bitlen: per
    // token, bits = bitlen(ct+1) − bitlen(cr+1) (Laplace +1 on BOTH
    // LMs, shared with q106 via `dsirScore`, whose frozen raw LM can
    // genuinely miss batch features). The two LM
    // normalizers (log T_target − log T_raw) shift every per-token score
    // by the same constant, so they are dropped — rankings are
    // unchanged, which is all resampling consumes; absolute scores are
    // therefore offset (typically negative when the target is much
    // smaller than the pool). Selection = top `graft.dsir.budget` docs
    // by mean ratio via the global mergeable TopK (budget rows cross the
    // wire — never a corpus sort); n_tokens/sum_bits ride the Scored
    // payload slots (doc_id is unique, so they never decide a tie).
    // Thin binding over the public op ([[graft.ops.Select.dsirTopK]]):
    // pool = every non-target source, target = the designated
    // quality-domain source.
    "q104_dsir_selection" -> ((s, dir) => {
      val target = s.conf.getOption("graft.dsir.targetSource")
        .getOrElse("src0")
      val buckets = s.conf.getOption("graft.dsir.buckets").map(_.toInt)
        .getOrElse(10000)
      val budget = s.conf.getOption("graft.dsir.budget").map(_.toInt)
        .getOrElse(100)
      val d = Graft.parquetSource(s, dir).table("documents")
      graft.ops.Select.dsirTopK(
          d.where(col("source") =!= target),
          d.where(col("source") === target),
          budget, buckets = buckets)
        .orderBy("rank")
    }),

    // ---- q105: incremental BM25 vs persisted inverted-index artifacts --
    // The q102 retrieval engine as the crawl loop runs it: each new batch
    // doc retrieves its BM25 top-k from the OLD corpus, whose retrieval
    // index persists as the four artifacts every real search system
    // materializes — postings (doc,term,tf; PARTITIONED by term-hash
    // bucket, the q78 IVF discipline applied to text), lexicon (df per
    // term), doc lengths, and the 1-row collection stats. Scoring is
    // frozen-LM semantics (old-corpus df/dl/T/N only — the q69 rule), so
    // a batch never shifts the index's statistics between rebuilds.
    //
    // Per-batch cost is batch-proportional everywhere: only the batch is
    // shingled (cut pushed to the scan); the lexicon scan is
    // broadcast-semi-filtered by the batch's term keys (q67 discipline);
    // candidate generation probes the bucket-partitioned postings with a
    // broadcast join — dynamic partition pruning cuts the artifact read
    // to the batch's rare buckets; candidate docs' full postings and dl
    // rows arrive via candidate-bounded broadcast semi-joins. The
    // retrieval use case: route/attribute/near-dup-check every incoming
    // doc against the indexed corpus without touching corpus documents.
    "q105_incremental_bm25" -> ((s, dir) => {
      val dfCap = s.conf.getOption("graft.bm25.dfCap").map(_.toInt)
        .getOrElse(16)
      val k = s.conf.getOption("graft.bm25.k").map(_.toInt).getOrElse(10)
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val (postPath, lexPath, dlPath, totPath) = bm25Index(s, dir, cut)
      val post = s.read.parquet(postPath)
      val qtf = shingleHashRows(d.where(col("doc_id") >= cut), 3)
        .select(col("doc_id").as("query_id"), col("h")).distinct()
        .localCheckpoint() // batch term lists — batch-bounded
      val qDf = s.read.parquet(lexPath)
        .join(broadcast(qtf.select("h").distinct()), Seq("h"), "left_semi")
        .localCheckpoint() // ≤ |batch terms| rows
      val rare = qtf.join(broadcast(qDf.where(col("df") <= dfCap)
          .select("h")), Seq("h"), "left_semi")
        .withColumn("bucket", pmod(col("h"), lit(64)).cast("int"))
      // no self-pair filter needed: query ids are ≥ cut, postings < cut
      val cand = post.join(broadcast(rare), Seq("bucket", "h"))
        .select(col("query_id"), col("doc_id"))
        .distinct()
      lastIncrementalBm25Plan = cand.queryExecution.executedPlan.toString
      val candC = cand.localCheckpoint() // rare-df-bounded
      val candDocs = candC.select(col("doc_id")).distinct()
      // the two candidate-bounded artifact probes are independent given
      // candDocs — materialize them on concurrent futures so neither
      // serializes the other on the driver (guide §2.6; r18)
      val (candPost, dlC) = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.DurationInt
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        val fPost = Future(post
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .localCheckpoint()) // candidate docs' full postings
        val fDl = Future(s.read.parquet(dlPath)
          .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .localCheckpoint()) // ≤ |candidate docs| rows
        (Await.result(fPost, 60.minutes), Await.result(fDl, 60.minutes))
      }
      val tot = s.read.parquet(totPath)
      bm25TopK(candC
        .join(qtf, Seq("query_id"))
        .join(candPost.select(col("doc_id"), col("h"), col("tf")),
          Seq("doc_id", "h"))
        .join(broadcast(qDf), Seq("h"))
        .join(broadcast(dlC), Seq("doc_id"))
        .crossJoin(broadcast(tot)), k)
    }),

    // ---- q106: incremental DSIR scoring vs persisted LM artifacts ------
    // q104 as the crawl loop runs it: the target and raw-pool hashed-
    // feature LMs freeze once per corpus snapshot as two ≤ buckets-row
    // side-tables (target source and bucket count folded into the
    // artifact identity — the q86 rule for conf-dependent artifacts),
    // and each incoming batch's pool docs score against them with ZERO
    // old-corpus reads: the cut is pushed to the batch's documents scan,
    // both LMs broadcast (plan-pinned no SortMergeJoin). Scoring is
    // `dsirScore` — the SAME definition q104 uses — so a batch doc gets
    // the score the full recompute would give it under the frozen LMs;
    // frozen-LM semantics (the q69/q105 rule) mean batch composition
    // never shifts anyone's score between snapshot rebuilds. Output is
    // the per-doc score stream (the resampler's input), not a top-k —
    // the batch is already the unit of work.
    "q106_incremental_dsir" -> ((s, dir) => {
      val target = s.conf.getOption("graft.dsir.targetSource")
        .getOrElse("src0")
      val buckets = s.conf.getOption("graft.dsir.buckets").map(_.toInt)
        .getOrElse(10000)
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val (ctPath, crPath) = dsirLmIndex(s, dir, cut, target, buckets)
      val ct = s.read.parquet(ctPath)
      val cr = s.read.parquet(crPath)
      val perDoc = d
        .where(col("doc_id") >= cut && col("source") =!= target)
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .select(col("doc_id"),
          pmod(hash60(col("term")), lit(buckets)).as("h"))
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("k"))
      val out = dsirScore(perDoc, ct, cr).orderBy("doc_id")
      lastIncrementalDsirPlan = out.queryExecution.executedPlan.toString
      out
    }),

    // ---- q107: incremental bigram-LM scoring vs persisted LM artifacts -
    // q103 as the crawl loop runs it — the bigram member of the
    // frozen-LM family (q69 is the unigram one): the old corpus's
    // context and bigram count tables persist once per snapshot, and
    // each batch doc's conditional surprisal is computed against them
    // with ZERO old-corpus reads. Both LM tables are distinct-gram-
    // growth, so the scans are broadcast-semi-filtered down to the
    // BATCH's gram keys before joining (the q67/q101 membership
    // discipline — the artifact is never broadcast whole, never
    // shuffled). Laplace +1 on both counts keeps the score total for
    // batch-novel grams, and `n_oov` (transitions the frozen LM has
    // never seen) is the drift signal that schedules the next LM
    // rebuild — the q69 rule at bigram grain.
    "q107_incremental_bigram_lm" -> ((s, dir) => {
      val d = Graft.parquetSource(s, dir).table("documents")
      val cut = BatchCut.cut(s, d)
      val (ctxPath, bigPath) = bigramLmIndex(s, dir, cut)
      val ctx = s.read.parquet(ctxPath)
      val big = s.read.parquet(bigPath)
      val batch = d.where(col("doc_id") >= cut)
      val perDoc = dualShingleHashRows(batch, 1, 2)
        .where(col("h2").isNotNull)
        .groupBy(col("doc_id"), col("h1"), col("h2"))
        .agg(count(lit(1)).as("k"))
        .localCheckpoint() // batch-bounded; feeds both key sets + scoring
      val ctxC = ctx.join(broadcast(perDoc.select("h1").distinct()),
        Seq("h1"), "left_semi").localCheckpoint() // ≤ |batch contexts|
      val bigC = big.join(broadcast(perDoc.select("h2").distinct()),
        Seq("h2"), "left_semi").localCheckpoint() // ≤ |batch bigrams|
      val out = perDoc
        .join(broadcast(ctxC), Seq("h1"), "left")
        .join(broadcast(bigC), Seq("h2"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_bigrams"),
          sum(when(col("c2").isNull, col("k")).otherwise(0L)).as("n_oov"),
          sum(col("k") *
            (length(bin(coalesce(col("c1"), lit(0L)) + 1)) -
             length(bin(coalesce(col("c2"), lit(0L)) + 1))))
            .as("sum_bits"))
        .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
          col("sum_bits"),
          (col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
            .as("mean_bits"))
        .orderBy("doc_id")
      lastIncrementalBigramPlan = out.queryExecution.executedPlan.toString
      out
    }),

    // ---- q108: BM25 df-cap recall audit --------------------------------
    // The q70/q73/q82/q87/q89 discipline — every approximation knob gets
    // a measured number — applied to q102/q105's one approximation: the
    // df-capped candidate generation. For a hash-sampled query set
    // (~1.2%), the audit scores the UNCAPPED candidate union (every doc
    // sharing any term — affordable at the sampled-query grain, the q70
    // trade), ranks top-10 both ways from the SAME per-pair scores
    // (scoring is identical in both pipelines by construction — only
    // candidacy differs), and reports overlap as recall plus the raw
    // candidate counts, which show how hard the cap actually bit. A
    // recall below 1.0 means score-relevant mass lives in terms with
    // df > dfCap — the signal to raise the cap or add an impact-ordered
    // fallback tier.
    "q108_bm25_recall_audit" -> ((s, dir) => {
      val dfCap = s.conf.getOption("graft.bm25.dfCap").map(_.toInt)
        .getOrElse(16)
      val k = 10 // fixed audit grain (matches the recall_at_10 column)
      val d = Graft.parquetSource(s, dir).table("documents")
      val tf = shingleHashRows(d, 3)
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val stats = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
      val tot = tf.agg(sum(col("tf")).as("t_tok"),
        countDistinct(col("doc_id")).as("n_docs"))
      // SCALE CONTRACT (loud on purpose): this spine is a 1/80 hash
      // sample of the CORPUS — it grows linearly with input, not with a
      // fixed query set. Every broadcast hint below (queries, candCap,
      // and the per-query aggregates, whose row counts are 1 or k per
      // sampled query) therefore assumes the audit runs on a BOUNDED
      // sample: at 100 TB a 1/80 doc-id sample is tens of GB and the
      // hints must be dropped, or the sample redesigned to a
      // fixed-count one (an output-changing redesign deferred to a
      // BUILD round — see SCALE.md "q108/recall-audit broadcast
      // bound"). At every tested SF the sample is hint-safe.
      val queries = d.where(pmod(hash60(col("text")), lit(80)) === 0)
        .select(col("doc_id"))
        .join(tf.select(col("doc_id")).distinct(), Seq("doc_id"),
          "left_semi")
        .localCheckpoint() // corpus/80 sample — the audit grain
      val qtf = tf.join(broadcast(queries), Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("query_id"), col("h"))
        .localCheckpoint()
      val candTrue = qtf
        .join(tf.select(col("doc_id"), col("h")), "h")
        .where(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id")).distinct()
        .localCheckpoint() // bounded by Σ df over the sample's terms
      val candCap = qtf
        .join(stats.where(col("df") <= dfCap).select(col("h")), "h")
        .join(tf.select(col("doc_id"), col("h")), "h")
        .where(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id")).distinct()
        .localCheckpoint()
      val contrib = candTrue
        .join(qtf, Seq("query_id"))
        .join(tf, Seq("doc_id", "h"))
        .join(stats, "h")
        .join(dl, "doc_id")
        .crossJoin(broadcast(tot))
        .localCheckpoint() // one derivation feeds BOTH rankings
      val trueTop = bm25TopK(contrib, k).localCheckpoint()
      val capTop = bm25TopK(
        contrib.join(broadcast(candCap), Seq("query_id", "doc_id"),
          "left_semi"), k)
      val nTrue = candTrue.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true_cands"))
      val nCap = candCap.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_capped_cands"))
      // assembly joins: every right side is query-set-bounded (one row
      // per sampled query, or k per query for the rank frames), but the
      // checkpointed inputs carry no size stats so Spark would plan
      // SortMergeJoin + 2 exchanges per join — broadcast explicitly
      // (guide §3.1: hint when you KNOW a side is small)
      val hits = trueTop
        .join(broadcast(capTop.select(col("query_id"), col("doc_id"))),
          Seq("query_id", "doc_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      queries.select(col("doc_id").as("query_id"))
        .join(broadcast(nTrue), Seq("query_id"), "left")
        .join(broadcast(nCap), Seq("query_id"), "left")
        .join(broadcast(hits), Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_true_cands"), lit(0L)).as("n_true_cands"),
          coalesce(col("n_capped_cands"), lit(0L)).as("n_capped_cands"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall_at_10",
          when(col("n_true_cands") === 0, lit(1.0d))
            .otherwise(col("n_hit").cast("double") /
              least(lit(k.toLong), col("n_true_cands")).cast("double")))
        .orderBy("query_id")
    })
  )

  /** Physical plan of q95's last batch-delta derivation, captured for
    * the plan test that proves the batch probes the content-key
    * artifact (never a full-corpus re-group) and the batch cut reaches
    * the documents scan. */
  @volatile private[graft] var lastIncrementalSrcPlan: String = ""

  /** Physical plans of q101's batch-term derivation and artifact probe
    * (batch scan + anti-join run eagerly via the localCheckpoint seam),
    * captured for the plan test that proves the cut is pushed to the
    * documents scan and membership probes the persisted term artifact
    * with broadcast joins only. */
  @volatile private[graft] var lastIncrementalVocabPlan: String = ""

  /** Physical plan of q105's candidate probe (broadcast of the batch's
    * rare terms against the bucket-partitioned postings artifact),
    * captured for the plan test that proves dynamic partition pruning
    * reaches the artifact scan and the corpus documents are never read
    * on the index side. */
  @volatile private[graft] var lastIncrementalBm25Plan: String = ""

  /** Physical plan of q106's batch scoring (the returned frame),
    * captured for the plan test: cut pushed to the batch's documents
    * scan, LM artifacts read (not the corpus), broadcast-only joins. */
  @volatile private[graft] var lastIncrementalDsirPlan: String = ""

  /** Physical plan of q107's batch scoring, captured for the plan test:
    * the returned frame reads only the checkpointed batch gram frame
    * and the two batch-key-bounded LM slices — no corpus documents. */
  @volatile private[graft] var lastIncrementalBigramPlan: String = ""

  // ---- persisted snapshot artifacts shared with the composed ingest --
  // Each incremental operator's side-table builder lives HERE as one
  // definition so the composed crawl-ingest job (q109) ensures the SAME
  // artifact (name + identity + builder) as the standalone member —
  // bit-identity between the composed and member paths is then by
  // construction, not by parallel-maintained copies.

  /** q95's per-source counter artifact: exact-integer n_docs/n_dup/
    * n_keep/n_good over the old corpus, ≤ |sources| rows. */
  private[graft] def srcCounterIndex(s: SparkSession, dir: String,
      cut: Long): String =
    graft.sources.SideTable.ensure(s, "src_counters", s"$dir#$cut",
        Some(s"$dir/documents.parquet")) {
      val old = Graft.parquetSource(s, dir).table("documents")
        .where(col("doc_id") < cut)
      val flags = qualityFlags(old, withSource = true)
        .select(col("doc_id"), col("source"), col("keep"))
      val members = TextPipeline.exactGroups(old, 3)
        .select(col("doc_id"), col("rep"))
      flags.join(members, Seq("doc_id"), "left")
        .select(col("source"), col("keep"),
          (col("rep").isNotNull && col("doc_id") =!= col("rep"))
            .cast("int").as("is_dup"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup")).cast("long").as("n_dup"),
          sum(col("keep")).cast("long").as("n_keep"),
          sum((col("keep") === 1 && col("is_dup") === 0).cast("int"))
            .cast("long").as("n_good"))
    }

  /** q101's distinct-term vocabulary artifact over the old corpus. */
  private[graft] def vocabTermIndex(s: SparkSession, dir: String,
      cut: Long): String =
    graft.sources.SideTable.ensure(s, "vocab_terms", s"$dir#$cut",
        Some(s"$dir/documents.parquet")) {
      graft.ops.Ingest.vocabTermFrame(
        Graft.parquetSource(s, dir).table("documents")
          .where(col("doc_id") < cut))
    }

  /** q105's four inverted-index artifacts — postings (bucket-
    * partitioned), lexicon, doc lengths, collection stats. The lexicon/
    * doclen/stats derive from the postings artifact at build time (one
    * scan each) — never from the corpus documents. Returns their paths
    * in that order. */
  private[graft] def bm25Index(s: SparkSession, dir: String,
      cut: Long): (String, String, String, String) = {
    val fp = Some(s"$dir/documents.parquet")
    val postPath = graft.sources.SideTable.ensure(s, "bm25_postings",
        s"$dir#$cut", fp, Seq("bucket")) {
      graft.ops.Ingest.bm25PostingsFrame(
        Graft.parquetSource(s, dir).table("documents")
          .where(col("doc_id") < cut))
    }
    val lexPath = graft.sources.SideTable.ensure(s, "bm25_lexicon",
        s"$dir#$cut", fp) {
      graft.ops.Ingest.bm25LexiconFrame(s.read.parquet(postPath))
    }
    val dlPath = graft.sources.SideTable.ensure(s, "bm25_doclen",
        s"$dir#$cut", fp) {
      graft.ops.Ingest.bm25DocLenFrame(s.read.parquet(postPath))
    }
    val totPath = graft.sources.SideTable.ensure(s, "bm25_stats",
        s"$dir#$cut", fp) {
      graft.ops.Ingest.bm25StatsFrame(s.read.parquet(postPath))
    }
    (postPath, lexPath, dlPath, totPath)
  }

  /** q106's frozen hashed-feature LM artifacts (target, raw) — target
    * source and bucket count folded into the identity (the q86 rule for
    * conf-dependent artifacts). Returns (ctPath, crPath). */
  private[graft] def dsirLmIndex(s: SparkSession, dir: String, cut: Long,
      target: String, buckets: Int): (String, String) = {
    val fp = Some(s"$dir/documents.parquet")
    def lms = graft.ops.Ingest.dsirLmFrames(
      Graft.parquetSource(s, dir).table("documents")
        .where(col("doc_id") < cut), target, buckets)
    def lmOf(name: String, frame: => DataFrame): String =
      graft.sources.SideTable.ensure(s, name,
        s"$dir#$cut#$target#$buckets", fp) { frame }
    (lmOf("dsir_target_lm", lms._1), lmOf("dsir_raw_lm", lms._2))
  }

  /** q107's frozen bigram-LM artifacts (context counts, bigram counts).
    * Returns (ctxPath, bigPath). */
  private[graft] def bigramLmIndex(s: SparkSession, dir: String,
      cut: Long): (String, String) = {
    val fp = Some(s"$dir/documents.parquet")
    def lms = graft.ops.Ingest.bigramLmFrames(
      Graft.parquetSource(s, dir).table("documents")
        .where(col("doc_id") < cut))
    def lm(name: String, frame: => DataFrame): String =
      graft.sources.SideTable.ensure(s, name, s"$dir#$cut", fp) { frame }
    (lm("bigram_ctx_lm", lms._1), lm("bigram_lm", lms._2))
  }

  /** The q104/q106 shared DSIR scorer: per-token importance bits =
    * bitlen(ct+1) − bitlen(cr+1) (Laplace +1 on BOTH LMs — the target
    * side can miss pool features and, in the incremental variant, a
    * frozen raw LM can miss batch features), summed per doc with one
    * final division. Both LM frames are ≤ `graft.dsir.buckets` rows and
    * join as broadcasts. ONE definition, so the incremental operator
    * scores exactly as the full-corpus one. */
  private def dsirScore(perDoc: DataFrame, ct: DataFrame,
      cr: DataFrame): DataFrame =
    graft.ops.Select.score(perDoc, ct, cr)

  /** The q102/q105 shared BM25 tail: per-term integer-ppm scores summed
    * per (query, doc), then per-query top-k via the mergeable TopK.
    * Expects one row per shared term with columns (query_id, doc_id,
    * df, tf, dl, t_tok, n_docs). q105's frozen-LM parity with q102
    * DEPENDS on the scoring expression being this one definition — the
    * ppm ratio is the k1=6/5, b=3/4 BM25 multiplied through to integers
    * (see the q102 entry comment for the derivation). */
  private def bm25TopK(contrib0: DataFrame, k: Int): DataFrame =
    graft.ops.Retrieval.bm25Rank(contrib0, k)

  /** q66's keep conjunction as one predicate over raw `text` — shared
    * by q77's survivor filter (the oracle embeds the identical SQL). */
  private def qualityKeepCond: org.apache.spark.sql.Column =
    graft.ops.Curate.qualityKeep(col("text"))

  /** q63's deterministic global token-budget cut over an arbitrary
    * `doc_id`/`text` frame — the two-level distributed prefix sum (see
    * the q63 entry's comment for the full scale argument). Budget and
    * shard count come from `graft.budget.tokens`/`graft.budget.shards`;
    * shards whose driver-computed offset exceeds the budget are pruned
    * before the window. */
  private def tokenBudget(s: SparkSession, docs: DataFrame): DataFrame =
    graft.ops.Curate.tokenBudget(docs,
      s.conf.get("graft.budget.tokens", "10000").toLong,
      shards0 = s.conf.get("graft.budget.shards",
        s.sparkContext.defaultParallelism.toString).toInt)

  // ---------------------------------------------------------------- oracle

  val oracles: Map[String, String] = Map(
    "q61_unigram_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), per_doc AS (
        |  SELECT doc_id, term, count(*) AS k FROM tok GROUP BY doc_id, term
        |), lm AS (
        |  SELECT term, sum(k)::bigint AS c FROM per_doc GROUP BY term
        |)
        |SELECT doc_id, sum(k)::bigint AS n_tokens,
        |  sum(k * (length(bin(c)) - 1))::bigint AS sum_bits,
        |  sum(k * (length(bin(c)) - 1))::double / sum(k)::double AS mean_bits
        |FROM per_doc JOIN lm USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q63_token_budget" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))::bigint AS n_tokens,
        |    ('0x' || substr(md5(text),1,15))::bigint AS h
        |  FROM documents
        |), cums AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING)::bigint AS cum
        |  FROM base
        |)
        |SELECT doc_id, n_tokens, cum FROM cums
        |WHERE cum <= 10000 ORDER BY cum, doc_id""".stripMargin,

    // Mirrors the engine's rep collapse: the TF-IDF model (tf, df,
    // n_docs) is computed over exact-dup-group REPRESENTATIVES, then the
    // doc-level answer is reconstructed exactly (within-group pairs at
    // cos 1.0, cross pairs at their reps' cosine) — the q62 oracle
    // pattern.
    "q65_tfidf_similarity" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), keyed0 AS (
        |  SELECT doc_id, md5(array_to_string(w, ' ')) gk FROM ws WHERE len(w) >= 3
        |), reps AS (
        |  SELECT gk, min(doc_id) rep FROM keyed0 GROUP BY gk
        |), members AS (
        |  SELECT keyed0.doc_id, keyed0.gk, reps.rep FROM keyed0 JOIN reps USING (gk)
        |), occ AS (
        |  SELECT doc_id, ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
        |      array_to_string(list_slice(w, i, i+2), ' '))) s
        |    FROM ws WHERE len(w) >= 3
        |  ) WHERE doc_id IN (SELECT rep FROM reps)
        |), tf AS (
        |  SELECT doc_id, h, count(*)::bigint AS tf FROM occ GROUP BY doc_id, h
        |), stats AS (
        |  SELECT h, count(*)::bigint AS df FROM tf GROUP BY h
        |), nd AS (SELECT count(*)::bigint AS n_docs FROM reps),
        |w AS (
        |  SELECT doc_id, h, tf * (length(bin(n_docs)) - length(bin(df))) AS w
        |  FROM tf JOIN stats USING (h) CROSS JOIN nd
        |), nrm AS (SELECT doc_id, sum(w*w)::bigint AS nrm FROM w GROUP BY doc_id),
        |rare AS (SELECT h FROM stats WHERE df BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT DISTINCT a.doc_id d1, b.doc_id d2
        |  FROM tf a JOIN tf b ON a.h = b.h AND a.doc_id < b.doc_id
        |  WHERE a.h IN (SELECT h FROM rare)
        |), dotp AS (
        |  SELECT d1, d2, sum(w1.w * w2.w)::bigint AS dot
        |  FROM cand JOIN w w1 ON w1.doc_id = d1
        |  JOIN w w2 ON w2.doc_id = d2 AND w2.h = w1.h
        |  GROUP BY d1, d2
        |), rp AS (
        |  SELECT d1, d2, dot::double / (sqrt(n1.nrm) * sqrt(n2.nrm)) AS cos
        |  FROM dotp JOIN nrm n1 ON n1.doc_id = d1 JOIN nrm n2 ON n2.doc_id = d2
        |  WHERE n1.nrm > 0 AND n2.nrm > 0
        |    AND dot::double / (sqrt(n1.nrm) * sqrt(n2.nrm)) >= 0.5
        |), within AS (
        |  SELECT x.doc_id d1, y.doc_id d2, 1.0::double AS cos
        |  FROM members x JOIN members y
        |    ON x.gk = y.gk AND x.doc_id < y.doc_id
        |), crossp AS (
        |  SELECT least(m1.doc_id, m2.doc_id) d1,
        |    greatest(m1.doc_id, m2.doc_id) d2, rp.cos
        |  FROM rp JOIN members m1 ON m1.rep = rp.d1
        |    JOIN members m2 ON m2.rep = rp.d2
        |)
        |SELECT d1, d2, cos FROM within
        |UNION ALL SELECT d1, d2, cos FROM crossp
        |ORDER BY d1, d2""".stripMargin,

    // the rule battery replayed with identical regexes and the same
    // exact integer cross-multiplied thresholds — no float enters a
    // verdict on either engine. Every count runs on \r-stripped text
    // (Java MULTILINE anchors treat \r/\r\n as line ends, RE2 only
    // \n — stripping on BOTH engines makes line counts identical),
    // and the Table A1 symbol rule tests '#' and '...' ratios
    // INDEPENDENTLY (each ≤ 0.1), per the paper.
    "q199_gopher_quality" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_replace(text, '\r', '', 'g') AS text
        |  FROM documents
        |  WHERE text IS NOT NULL AND len(trim(text)) > 0
        |), pd AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+'))::BIGINT
        |      AS n_words,
        |    length(regexp_replace(text, '\s', '', 'g'))::BIGINT
        |      AS n_word_chars,
        |    len(string_split(text, chr(10)))::BIGINT AS n_lines,
        |    len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]'))::BIGINT
        |      AS n_bullet_lines,
        |    len(regexp_extract_all(text, '(?m)\.\.\.[ \t]*$'))::BIGINT
        |      AS n_ellipsis_lines,
        |    len(regexp_extract_all(text, '#'))::BIGINT AS n_hash,
        |    len(regexp_extract_all(text, '\.\.\.'))::BIGINT
        |      AS n_ellipsis,
        |    (regexp_matches(text, '\bthe\b')::INT +
        |     regexp_matches(text, '\bbe\b')::INT +
        |     regexp_matches(text, '\bto\b')::INT +
        |     regexp_matches(text, '\bof\b')::INT +
        |     regexp_matches(text, '\band\b')::INT +
        |     regexp_matches(text, '\bthat\b')::INT +
        |     regexp_matches(text, '\bhave\b')::INT +
        |     regexp_matches(text, '\bwith\b')::INT)::BIGINT
        |      AS n_stopwords
        |  FROM base
        |), al AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN regexp_matches(w, '[A-Za-z]')
        |        THEN 1 ELSE 0 END)::BIGINT AS n_alpha_words
        |  FROM (
        |    SELECT doc_id,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |    FROM base
        |  ) WHERE w <> '' GROUP BY doc_id
        |)
        |SELECT p.doc_id, p.n_words, p.n_word_chars, p.n_lines,
        |  p.n_bullet_lines, p.n_ellipsis_lines, p.n_hash, p.n_ellipsis,
        |  a.n_alpha_words, p.n_stopwords,
        |  (p.n_words >= 50 AND p.n_words <= 100000) AS r_words,
        |  (3 * p.n_words <= p.n_word_chars AND
        |   p.n_word_chars <= 10 * p.n_words) AS r_mwl,
        |  (10 * p.n_hash <= p.n_words AND
        |   10 * p.n_ellipsis <= p.n_words) AS r_sym,
        |  (10 * p.n_bullet_lines <= 9 * p.n_lines) AS r_bullet,
        |  (10 * p.n_ellipsis_lines <= 3 * p.n_lines) AS r_ellipsis,
        |  (10 * a.n_alpha_words >= 8 * p.n_words) AS r_alpha,
        |  (p.n_stopwords >= 2) AS r_stop,
        |  ((p.n_words >= 50 AND p.n_words <= 100000) AND
        |   (3 * p.n_words <= p.n_word_chars AND
        |    p.n_word_chars <= 10 * p.n_words) AND
        |   (10 * p.n_hash <= p.n_words AND
        |    10 * p.n_ellipsis <= p.n_words) AND
        |   (10 * p.n_bullet_lines <= 9 * p.n_lines) AND
        |   (10 * p.n_ellipsis_lines <= 3 * p.n_lines) AND
        |   (10 * a.n_alpha_words >= 8 * p.n_words) AND
        |   (p.n_stopwords >= 2)) AS keep
        |FROM pd p JOIN al a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q66_quality_filter" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+'))::int AS n_words,
        |    CASE WHEN length(text) > 0
        |      THEN length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::double / length(text)
        |      ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |      THEN length(regexp_replace(text, '\s+', '', 'g'))::double
        |           / len(regexp_split_to_array(trim(text), '\s+'))
        |      ELSE 0.0 END AS mean_word_len,
        |    len(regexp_extract_all(text, '\b(the|a|of|and|is)\b'))::double
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio
        |  FROM documents
        |), flags AS (
        |  SELECT doc_id, n_words, punct_ratio, mean_word_len, stopword_ratio,
        |    CASE WHEN n_words >= 20 AND n_words <= 1000 THEN 1 ELSE 0 END::int AS pass_len,
        |    CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 5.0 THEN 1 ELSE 0 END::int AS pass_mwl,
        |    CASE WHEN punct_ratio <= 0.3 THEN 1 ELSE 0 END::int AS pass_punct,
        |    CASE WHEN stopword_ratio >= 0.02 THEN 1 ELSE 0 END::int AS pass_stop
        |  FROM base
        |)
        |SELECT *,
        |  CASE WHEN pass_len = 1 AND pass_mwl = 1 AND pass_punct = 1
        |    AND pass_stop = 1 THEN 1 ELSE 0 END::int AS keep
        |FROM flags ORDER BY doc_id""".stripMargin,

    "q68_passage_dedup" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), segs AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(array_to_string(list_slice(w, i*10+1, i*10+10), ' ')),1,15))::bigint AS h
        |  FROM (SELECT doc_id, w, unnest(range(0, (len(w)+9)//10)) AS i FROM ws)
        |), df AS (
        |  SELECT h, count(DISTINCT doc_id) AS df FROM segs GROUP BY h
        |)
        |SELECT segs.doc_id, count(*) AS n_segs,
        |  sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END)::bigint AS n_boiler,
        |  sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END)::double / count(*)
        |    AS boiler_ratio
        |FROM segs JOIN df USING (h)
        |GROUP BY segs.doc_id ORDER BY segs.doc_id""".stripMargin,

    // Chunk fingerprint: the positional power-sum Spark computes equals
    // the sequential fold (acc·31 + h) mod p — the q25 equivalence —
    // expressed here as list_reduce over the chunk's ordered hashes.
    "q71_cdc_chunks" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), tok AS (
        |  SELECT doc_id, i, w[i] AS wd
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w)+1)) AS i FROM ws)
        |), tk AS (
        |  SELECT doc_id, i,
        |    ('0x' || substr(md5(wd),1,15))::bigint % 2147483647 AS h,
        |    CASE WHEN ('0x' || substr(md5(wd),1,15))::bigint % 16 = 0
        |      THEN 1 ELSE 0 END AS b
        |  FROM tok
        |), ch AS (
        |  SELECT doc_id, i, h,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS UNBOUNDED PRECEDING) AS chunk
        |  FROM tk
        |), chash AS (
        |  SELECT doc_id, chunk,
        |    list_reduce(list_prepend(0::bigint, list(h ORDER BY i)),
        |      (acc, x) -> (acc * 31 + x) % 2147483647) AS ch
        |  FROM ch GROUP BY doc_id, chunk
        |), df AS (
        |  SELECT ch, count(DISTINCT doc_id) AS df FROM chash GROUP BY ch
        |)
        |SELECT chash.doc_id, count(*) AS n_chunks,
        |  sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::bigint AS n_dup,
        |  sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::double / count(*)
        |    AS dup_ratio
        |FROM chash JOIN df USING (ch)
        |GROUP BY chash.doc_id ORDER BY chash.doc_id""".stripMargin,

    // The oracle recomputes the LM from scratch over doc_id < cut (it
    // has no artifact); equivalence holds because the artifact rows ARE
    // that aggregation, persisted.
    "q69_incremental_lm_score" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), lm AS (
        |  SELECT term, count(*)::bigint AS c FROM tok
        |  WHERE doc_id < (SELECT c FROM cut) GROUP BY term
        |), delta AS (
        |  SELECT doc_id, term, count(*) AS k FROM tok
        |  WHERE doc_id >= (SELECT c FROM cut) GROUP BY doc_id, term
        |)
        |SELECT doc_id, sum(k)::bigint AS n_tokens,
        |  sum(CASE WHEN c IS NULL THEN k ELSE 0 END)::bigint AS n_oov,
        |  sum(CASE WHEN c IS NOT NULL THEN k * (length(bin(c)) - 1) ELSE 0 END)::bigint AS sum_bits,
        |  CASE WHEN sum(CASE WHEN c IS NOT NULL THEN k ELSE 0 END) > 0
        |    THEN sum(CASE WHEN c IS NOT NULL THEN k * (length(bin(c)) - 1) ELSE 0 END)::double
        |         / sum(CASE WHEN c IS NOT NULL THEN k ELSE 0 END)::double
        |    ELSE 0.0 END AS mean_bits
        |FROM delta LEFT JOIN lm USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q72_incremental_novelty" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), sg AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
        |      array_to_string(list_slice(w, i, i+2), ' '))) s
        |    FROM ws WHERE len(w) >= 3
        |  )
        |), old AS (SELECT DISTINCT h FROM sg WHERE doc_id < (SELECT c FROM cut)),
        |delta AS (SELECT doc_id, h FROM sg WHERE doc_id >= (SELECT c FROM cut))
        |SELECT delta.doc_id, count(*) AS n_grams,
        |  sum(CASE WHEN old.h IS NULL THEN 1 ELSE 0 END)::bigint AS n_new,
        |  sum(CASE WHEN old.h IS NULL THEN 1 ELSE 0 END)::double / count(*)
        |    AS novelty
        |FROM delta LEFT JOIN old ON delta.h = old.h
        |GROUP BY delta.doc_id ORDER BY delta.doc_id""".stripMargin,

    // q89: exact cardinalities compared directly; each engine certifies
    // its own membership filter (the q35 sketch convention — DuckDB's
    // exact path has zero false positives by construction)
    "q89_bloom_audit" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents
        |), sg AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
        |      array_to_string(list_slice(w, i, i+2), ' '))) s
        |    FROM ws WHERE len(w) >= 3
        |  )
        |),
        |g_old AS (SELECT DISTINCT h FROM sg WHERE doc_id < (SELECT c FROM cut)),
        |g_new AS (SELECT DISTINCT h FROM sg WHERE doc_id >= (SELECT c FROM cut)),
        |keys AS (
        |  SELECT doc_id,
        |    md5(array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) gk
        |  FROM documents WHERE text IS NOT NULL
        |),
        |k_old AS (SELECT DISTINCT gk FROM keys WHERE doc_id < (SELECT c FROM cut)),
        |k_new AS (SELECT DISTINCT gk FROM keys WHERE doc_id >= (SELECT c FROM cut))
        |SELECT * FROM (
        |  SELECT 'content_keys' AS artifact,
        |    (SELECT count(*) FROM k_old)::bigint AS n_keys,
        |    (SELECT count(*) FROM k_new)::bigint AS n_probes,
        |    (SELECT count(*) FROM k_new JOIN k_old USING (gk))::bigint AS n_seen,
        |    ((SELECT count(*) FROM k_new)
        |      - (SELECT count(*) FROM k_new JOIN k_old USING (gk)))::bigint AS n_novel,
        |    true AS fp_within_bound
        |  UNION ALL
        |  SELECT 'gram_set',
        |    (SELECT count(*) FROM g_old)::bigint,
        |    (SELECT count(*) FROM g_new)::bigint,
        |    (SELECT count(*) FROM g_new JOIN g_old USING (h))::bigint,
        |    ((SELECT count(*) FROM g_new)
        |      - (SELECT count(*) FROM g_new JOIN g_old USING (h)))::bigint,
        |    true
        |) ORDER BY artifact""".stripMargin,

    "q64_novelty" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), sg AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
        |      array_to_string(list_slice(w, i, i+2), ' '))) s
        |    FROM ws WHERE len(w) >= 3
        |  )
        |), fo AS (SELECT h, min(doc_id) AS fo FROM sg GROUP BY h)
        |SELECT sg.doc_id, count(*) AS n_sh,
        |  sum(CASE WHEN fo.fo = sg.doc_id THEN 1 ELSE 0 END)::bigint AS n_novel,
        |  sum(CASE WHEN fo.fo = sg.doc_id THEN 1 ELSE 0 END)::double
        |    / count(*)::double AS novelty
        |FROM sg JOIN fo USING (h)
        |GROUP BY sg.doc_id ORDER BY sg.doc_id""".stripMargin,

    // The composition chained as CTEs: q74's components + argmax keep
    // (drop = non-keep cluster members), q66's keep conjunction, then
    // q63's global cumsum over the survivors.
    "q77_curation_pipeline" ->
      (curationCtes +
        """
          |SELECT doc_id, n_tokens, cum FROM cums
          |WHERE cum <= 10000 ORDER BY cum, doc_id""".stripMargin),

    // The ledger reuses q77's CTE chain verbatim: outcome = the first
    // stage (quality → near_dup → budget) that dropped the doc.
    "q93_curation_ledger" ->
      (curationCtes +
        """
          |SELECT d.doc_id,
          |  CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM qual) THEN 'quality'
          |       WHEN d.doc_id IN (SELECT doc_id FROM dropset) THEN 'near_dup'
          |       WHEN d.doc_id NOT IN (SELECT doc_id FROM cums WHERE cum <= 10000)
          |         THEN 'budget'
          |       ELSE 'kept' END AS outcome
          |FROM documents d ORDER BY doc_id""".stripMargin),

    "q84_source_report" -> sourceReportSql,

    // The incremental path must be indistinguishable from the
    // batch-unaware recompute: same oracle as q84.
    "q95_incremental_source_report" -> sourceReportSql,

    "q100_dataset_card" ->
      """WITH ds AS (
        |  SELECT count(*)::bigint AS n_docs,
        |    count(DISTINCT source)::bigint AS n_sources,
        |    count(DISTINCT lang)::bigint AS n_langs,
        |    coalesce(sum(coalesce(
        |      len(regexp_split_to_array(trim(text), '\s+')), 0)), 0)::bigint
        |      AS n_tokens,
        |    coalesce(sum(coalesce(length(text), 0)), 0)::bigint AS n_chars
        |  FROM documents
        |), dup AS (
        |  SELECT coalesce(sum(CASE WHEN doc_id <> rep THEN 1 ELSE 0 END), 0)::bigint
        |    AS n_dup
        |  FROM (
        |    SELECT doc_id, min(doc_id) OVER (PARTITION BY gk) AS rep FROM (
        |      SELECT doc_id,
        |        md5(array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) gk
        |      FROM documents
        |      WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3
        |    )
        |  )
        |), kp AS (
        |  SELECT coalesce(sum(CASE WHEN n_words >= 20 AND n_words <= 1000
        |      AND mean_word_len >= 3.0 AND mean_word_len <= 5.0
        |      AND punct_ratio <= 0.3 AND stopword_ratio >= 0.02
        |      THEN 1 ELSE 0 END), 0)::bigint AS n_keep
        |  FROM (
        |    SELECT len(regexp_split_to_array(trim(text), '\s+'))::int AS n_words,
        |      CASE WHEN length(text) > 0
        |        THEN length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::double / length(text)
        |        ELSE 0.0 END AS punct_ratio,
        |      CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |        THEN length(regexp_replace(text, '\s+', '', 'g'))::double
        |             / len(regexp_split_to_array(trim(text), '\s+'))
        |        ELSE 0.0 END AS mean_word_len,
        |      len(regexp_extract_all(text, '\b(the|a|of|and|is)\b'))::double
        |        / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio
        |    FROM documents
        |  )
        |), vc AS (
        |  SELECT count(DISTINCT term)::bigint AS vocab_size FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents
        |  )
        |)
        |SELECT n_docs, n_sources, n_langs, n_tokens, n_chars, vocab_size,
        |  n_dup, n_keep,
        |  n_dup::double / n_docs::double AS dup_rate,
        |  n_keep::double / n_docs::double AS keep_rate,
        |  n_tokens::double / n_docs::double AS tokens_per_doc
        |FROM ds CROSS JOIN dup CROSS JOIN kp CROSS JOIN vc""".stripMargin,

    // The batch-unaware recompute: ONE pass over the token stream
    // derives per-term first-seen + batch membership — it must equal
    // the artifact path's counts exactly, at any cut.
    "q101_incremental_vocab" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), agg AS (
        |  SELECT term, min(doc_id) AS first_id,
        |    max(CASE WHEN doc_id >= (SELECT c FROM cut) THEN 1 ELSE 0 END)
        |      AS in_batch
        |  FROM tok GROUP BY term
        |)
        |SELECT
        |  coalesce(sum(CASE WHEN first_id < (SELECT c FROM cut)
        |    THEN 1 ELSE 0 END), 0)::bigint AS n_old_terms,
        |  coalesce(sum(in_batch), 0)::bigint AS n_batch_terms,
        |  coalesce(sum(CASE WHEN first_id >= (SELECT c FROM cut)
        |    THEN 1 ELSE 0 END), 0)::bigint AS n_new_terms,
        |  count(*)::bigint AS vocab_size
        |FROM agg""".stripMargin,

    // Mirrors q102 op for op: same shingle hash space, same integer-ratio
    // BM25 (HUGEINT floor-division == the engine's DECIMAL(38,0) div),
    // same df cap and tf saturation, same (score DESC, doc_id) total
    // order.
    "q102_bm25_retrieval" ->
      (bm25RankedCtes + """
        |SELECT query_id, rank::bigint AS rank, doc_id, score_ppm
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    // Fused oracle: the full BM25 ranked chain plus an inline cosine
    // chain over the same sampled query ids, both cut to rank ≤ 10,
    // RRF-summed with the identical integer floor division.
    "q135_hybrid_rrf" ->
      (bm25RankedCtes + """
        |, e0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::double) v
        |  FROM embeddings
        |), e AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(0.0::double,
        |      list_transform(v, x -> x*x)), (acc, x) -> acc + x)) nrm
        |  FROM e0
        |), qv AS (
        |  SELECT e.* FROM e JOIN q ON q.doc_id = e.vec_id
        |), sxy AS (
        |  SELECT qv.vec_id AS query_id, e.vec_id AS doc_id,
        |    (list_reduce(list_prepend(0.0::double,
        |       list_transform(list_zip(qv.v, e.v), p -> p[1]*p[2])),
        |       (acc, x) -> acc + x) / (qv.nrm * e.nrm)) AS cos
        |  FROM e JOIN qv ON e.vec_id <> qv.vec_id
        |), rankedv AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, doc_id) AS rank
        |  FROM sxy
        |), contribf AS (
        |  SELECT query_id, doc_id, 1000000 // (60 + rank) AS ppm
        |  FROM ranked WHERE rank <= 10
        |  UNION ALL
        |  SELECT query_id, doc_id, 1000000 // (60 + rank) AS ppm
        |  FROM rankedv WHERE rank <= 10
        |), fused AS (
        |  SELECT query_id, doc_id, sum(ppm)::bigint AS score_ppm
        |  FROM contribf GROUP BY query_id, doc_id
        |), franked AS (
        |  SELECT query_id, doc_id, score_ppm,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_ppm DESC, doc_id) AS rank
        |  FROM fused
        |)
        |SELECT query_id, rank::bigint AS rank, doc_id, score_ppm
        |FROM franked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    "q103_bigram_surprisal" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), pos AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(g[1]),1,15))::bigint % 2147483647 AS h1,
        |    ('0x' || substr(md5(g[1] || ' ' || g[2]),1,15))::bigint % 2147483647 AS h2
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i ->
        |      list_slice(w, i, i+1))) g
        |    FROM ws WHERE len(w) >= 2
        |  )
        |), per_doc AS (
        |  SELECT doc_id, h1, h2, count(*)::bigint AS k FROM pos GROUP BY 1, 2, 3
        |), ctx AS (
        |  SELECT h1, sum(k)::bigint AS c1 FROM per_doc GROUP BY h1
        |), big AS (
        |  SELECT h2, sum(k)::bigint AS c2 FROM per_doc GROUP BY h2
        |)
        |SELECT doc_id, sum(k)::bigint AS n_bigrams,
        |  sum(k * (length(bin(c1)) - length(bin(c2))))::bigint AS sum_bits,
        |  sum(k * (length(bin(c1)) - length(bin(c2))))::double
        |    / sum(k)::double AS mean_bits
        |FROM per_doc JOIN ctx USING (h1) JOIN big USING (h2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q150_kn_bigram" ->
      raw"""WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents WHERE text IS NOT NULL AND len(trim(text)) > 0
        |), bg AS MATERIALIZED (
        |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |  FROM ws, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2
        |), pc AS MATERIALIZED (
        |  SELECT w1, w2, count(*)::bigint AS c12 FROM bg GROUP BY 1, 2
        |), lm AS (
        |  SELECT w1, sum(c12)::bigint AS c1, count(*)::bigint AS n1l
        |  FROM pc GROUP BY 1
        |), rm AS (SELECT w2, count(*)::bigint AS n1r FROM pc GROUP BY 1),
        |bt AS (SELECT count(*)::bigint AS bt FROM pc),
        |dp AS (
        |  SELECT doc_id, w1, w2, count(*)::bigint AS k FROM bg
        |  GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT doc_id, k,
        |    floor((((c12 - $KnDiscountDefault) + ($KnDiscountDefault * n1l)
        |      * (n1r::double / bt::double)) / c1) * 1048576)::bigint
        |      AS kn20
        |  FROM dp JOIN pc USING (w1, w2) JOIN lm USING (w1)
        |    JOIN rm USING (w2) CROSS JOIN bt
        |)
        |SELECT doc_id, sum(k)::bigint AS n_bigrams,
        |  sum(k * kn20)::bigint AS sum_kn20,
        |  sum(k * kn20)::bigint::double / sum(k)::bigint::double
        |    AS mean_kn20
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q104_dsir_selection" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(t),1,15))::bigint % 10000 AS h
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |    FROM documents
        |  )
        |), perdoc AS (
        |  SELECT doc_id, h, count(*)::bigint AS k FROM tok
        |  WHERE source <> 'src0' GROUP BY doc_id, h
        |), ct AS (
        |  SELECT h, count(*)::bigint AS ct FROM tok
        |  WHERE source = 'src0' GROUP BY h
        |), cr AS (
        |  SELECT h, sum(k)::bigint AS cr FROM perdoc GROUP BY h
        |), scored AS (
        |  SELECT doc_id, sum(k)::bigint AS n_tokens,
        |    sum(k * (length(bin(coalesce(ct, 0) + 1))
        |           - length(bin(coalesce(cr, 0) + 1))))::bigint AS sum_bits
        |  FROM perdoc LEFT JOIN cr USING (h) LEFT JOIN ct USING (h)
        |  GROUP BY doc_id
        |), ranked AS (
        |  SELECT doc_id, n_tokens, sum_bits,
        |    sum_bits::double / n_tokens::double AS score,
        |    row_number() OVER (ORDER BY sum_bits::double / n_tokens::double
        |      DESC, doc_id) AS rank
        |  FROM scored
        |)
        |SELECT rank::bigint AS rank, doc_id, n_tokens, sum_bits, score
        |FROM ranked WHERE rank <= 100 ORDER BY rank""".stripMargin,

    // Batch-unaware recompute of q105: corpus = docs below the default
    // cut, queries = the batch above it; identical integer-ratio BM25.
    "q105_incremental_bm25" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), occ AS (
        |  SELECT doc_id, ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
        |      array_to_string(list_slice(w, i, i+2), ' '))) s
        |    FROM ws WHERE len(w) >= 3
        |  )
        |), tfo AS (
        |  SELECT doc_id, h, count(*)::bigint AS tf FROM occ
        |  WHERE doc_id < (SELECT c FROM cut) GROUP BY doc_id, h
        |), tfb AS (
        |  SELECT DISTINCT doc_id, h FROM occ
        |  WHERE doc_id >= (SELECT c FROM cut)
        |), dl AS (
        |  SELECT doc_id, sum(tf)::bigint AS dl FROM tfo GROUP BY doc_id
        |), stats AS (
        |  SELECT h, count(*)::bigint AS df FROM tfo GROUP BY h
        |), tot AS (
        |  SELECT sum(tf)::bigint AS t_tok,
        |    count(DISTINCT doc_id)::bigint AS n_docs FROM tfo
        |), cand AS (
        |  SELECT DISTINCT b.doc_id AS query_id, t2.doc_id AS doc_id
        |  FROM tfb b
        |  JOIN stats s ON s.h = b.h AND s.df <= 16
        |  JOIN tfo t2 ON t2.h = b.h
        |), contrib AS (
        |  SELECT c.query_id, c.doc_id,
        |    ((length(bin(n_docs)) - length(bin(st.df)))::hugeint
        |      * 22 * least(t2.tf, 15) * t_tok * 1000000)
        |    // (10*t_tok*least(t2.tf,15) + 3*t_tok + 9*d.dl*n_docs) AS ppm
        |  FROM cand c
        |  JOIN tfb tq ON tq.doc_id = c.query_id
        |  JOIN tfo t2 ON t2.doc_id = c.doc_id AND t2.h = tq.h
        |  JOIN stats st ON st.h = tq.h
        |  JOIN dl d ON d.doc_id = c.doc_id
        |  CROSS JOIN tot
        |), scored AS (
        |  SELECT query_id, doc_id, sum(ppm)::bigint AS score_ppm
        |  FROM contrib GROUP BY query_id, doc_id
        |), ranked AS (
        |  SELECT query_id, doc_id, score_ppm,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_ppm DESC, doc_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank::bigint AS rank, doc_id, score_ppm
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // Batch-unaware recompute of q106 under the frozen old-corpus LMs.
    "q106_incremental_dsir" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |tok AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(t),1,15))::bigint % 10000 AS h
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |    FROM documents
        |  )
        |), ct AS (
        |  SELECT h, count(*)::bigint AS ct FROM tok
        |  WHERE source = 'src0' AND doc_id < (SELECT c FROM cut)
        |  GROUP BY h
        |), cr AS (
        |  SELECT h, count(*)::bigint AS cr FROM tok
        |  WHERE source <> 'src0' AND doc_id < (SELECT c FROM cut)
        |  GROUP BY h
        |), perdoc AS (
        |  SELECT doc_id, h, count(*)::bigint AS k FROM tok
        |  WHERE source <> 'src0' AND doc_id >= (SELECT c FROM cut)
        |  GROUP BY doc_id, h
        |)
        |SELECT doc_id, sum(k)::bigint AS n_tokens,
        |  sum(k * (length(bin(coalesce(ct, 0) + 1))
        |         - length(bin(coalesce(cr, 0) + 1))))::bigint AS sum_bits,
        |  sum(k * (length(bin(coalesce(ct, 0) + 1))
        |         - length(bin(coalesce(cr, 0) + 1))))::double
        |    / sum(k)::double AS score
        |FROM perdoc LEFT JOIN cr USING (h) LEFT JOIN ct USING (h)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Batch-unaware recompute of q107 under the frozen old-corpus LMs.
    "q107_incremental_bigram_lm" ->
      """WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
        |ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), pos AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(g[1]),1,15))::bigint % 2147483647 AS h1,
        |    ('0x' || substr(md5(g[1] || ' ' || g[2]),1,15))::bigint % 2147483647 AS h2
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i ->
        |      list_slice(w, i, i+1))) g
        |    FROM ws WHERE len(w) >= 2
        |  )
        |), ctx AS (
        |  SELECT h1, count(*)::bigint AS c1 FROM pos
        |  WHERE doc_id < (SELECT c FROM cut) GROUP BY h1
        |), big AS (
        |  SELECT h2, count(*)::bigint AS c2 FROM pos
        |  WHERE doc_id < (SELECT c FROM cut) GROUP BY h2
        |), per_doc AS (
        |  SELECT doc_id, h1, h2, count(*)::bigint AS k FROM pos
        |  WHERE doc_id >= (SELECT c FROM cut) GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, sum(k)::bigint AS n_bigrams,
        |  sum(CASE WHEN c2 IS NULL THEN k ELSE 0 END)::bigint AS n_oov,
        |  sum(k * (length(bin(coalesce(c1, 0) + 1))
        |         - length(bin(coalesce(c2, 0) + 1))))::bigint AS sum_bits,
        |  sum(k * (length(bin(coalesce(c1, 0) + 1))
        |         - length(bin(coalesce(c2, 0) + 1))))::double
        |    / sum(k)::double AS mean_bits
        |FROM per_doc LEFT JOIN ctx USING (h1) LEFT JOIN big USING (h2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors q108: same scores for both pipelines, candidacy differs.
    "q108_bm25_recall_audit" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
        |), occ AS (
        |  SELECT doc_id, ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
        |      array_to_string(list_slice(w, i, i+2), ' '))) s
        |    FROM ws WHERE len(w) >= 3
        |  )
        |), tf AS (
        |  SELECT doc_id, h, count(*)::bigint AS tf FROM occ GROUP BY doc_id, h
        |), dl AS (
        |  SELECT doc_id, sum(tf)::bigint AS dl FROM tf GROUP BY doc_id
        |), stats AS (
        |  SELECT h, count(*)::bigint AS df FROM tf GROUP BY h
        |), tot AS (
        |  SELECT sum(tf)::bigint AS t_tok,
        |    count(DISTINCT doc_id)::bigint AS n_docs FROM tf
        |), q AS (
        |  SELECT d.doc_id FROM documents d
        |  WHERE ('0x' || substr(md5(d.text),1,15))::bigint % 80 = 0
        |    AND d.doc_id IN (SELECT doc_id FROM dl)
        |), cand_true AS (
        |  SELECT DISTINCT q.doc_id AS query_id, t2.doc_id AS doc_id
        |  FROM q JOIN tf t1 ON t1.doc_id = q.doc_id
        |  JOIN tf t2 ON t2.h = t1.h AND t2.doc_id <> q.doc_id
        |), cand_cap AS (
        |  SELECT DISTINCT q.doc_id AS query_id, t2.doc_id AS doc_id
        |  FROM q JOIN tf t1 ON t1.doc_id = q.doc_id
        |  JOIN stats s ON s.h = t1.h AND s.df <= 16
        |  JOIN tf t2 ON t2.h = t1.h AND t2.doc_id <> q.doc_id
        |), contrib AS (
        |  SELECT c.query_id, c.doc_id,
        |    ((length(bin(n_docs)) - length(bin(st.df)))::hugeint
        |      * 22 * least(t2.tf, 15) * t_tok * 1000000)
        |    // (10*t_tok*least(t2.tf,15) + 3*t_tok + 9*d.dl*n_docs) AS ppm
        |  FROM cand_true c
        |  JOIN tf tq ON tq.doc_id = c.query_id
        |  JOIN tf t2 ON t2.doc_id = c.doc_id AND t2.h = tq.h
        |  JOIN stats st ON st.h = tq.h
        |  JOIN dl d ON d.doc_id = c.doc_id
        |  CROSS JOIN tot
        |), scored AS (
        |  SELECT query_id, doc_id, sum(ppm)::bigint AS score_ppm
        |  FROM contrib GROUP BY query_id, doc_id
        |), rt AS (
        |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_ppm DESC, doc_id) AS rank
        |  FROM scored
        |), rc AS (
        |  SELECT s.query_id, s.doc_id,
        |    row_number() OVER (PARTITION BY s.query_id
        |      ORDER BY s.score_ppm DESC, s.doc_id) AS rank
        |  FROM scored s JOIN cand_cap c
        |    ON c.query_id = s.query_id AND c.doc_id = s.doc_id
        |), nt AS (
        |  SELECT query_id, count(*)::bigint AS n_true_cands
        |  FROM cand_true GROUP BY query_id
        |), nc AS (
        |  SELECT query_id, count(*)::bigint AS n_capped_cands
        |  FROM cand_cap GROUP BY query_id
        |), hits AS (
        |  SELECT rt.query_id, count(*)::bigint AS n_hit
        |  FROM rt JOIN rc ON rt.query_id = rc.query_id
        |    AND rt.doc_id = rc.doc_id
        |  WHERE rt.rank <= 10 AND rc.rank <= 10
        |  GROUP BY rt.query_id
        |)
        |SELECT q.doc_id AS query_id,
        |  coalesce(n_true_cands, 0) AS n_true_cands,
        |  coalesce(n_capped_cands, 0) AS n_capped_cands,
        |  coalesce(n_hit, 0) AS n_hit,
        |  CASE WHEN coalesce(n_true_cands, 0) = 0 THEN 1.0::double
        |    ELSE coalesce(n_hit, 0)::double
        |      / least(10, n_true_cands)::double END AS recall_at_10
        |FROM q LEFT JOIN nt ON nt.query_id = q.doc_id
        |LEFT JOIN nc ON nc.query_id = q.doc_id
        |LEFT JOIN hits ON hits.query_id = q.doc_id
        |ORDER BY query_id""".stripMargin
  )

  /** The q77 curation chain as shared CTEs (pairs → components → drop
    * set → quality filter → survivors → budget cumsum) — the tail
    * differs per consumer: q77 emits the kept rows, q93 the per-doc
    * ledger. */
  private lazy val curationCtes: String =
      s"""WITH RECURSIVE pairs AS (${TextPipeline.minhashPairsSql}),
         |edges AS (SELECT d1 a, d2 b FROM pairs UNION SELECT d2, d1 FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |),
         |comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
         |nww AS (
         |  SELECT doc_id,
         |    len(regexp_split_to_array(trim(text), '\\s+'))::bigint AS n_words
         |  FROM documents
         |),
         |keepq AS (
         |  SELECT cluster_id,
         |    first(comp.doc_id ORDER BY n_words DESC, comp.doc_id ASC) AS keep_id
         |  FROM comp JOIN nww ON nww.doc_id = comp.doc_id
         |  GROUP BY cluster_id
         |),
         |dropset AS (
         |  SELECT comp.doc_id FROM comp JOIN keepq USING (cluster_id)
         |  WHERE comp.doc_id <> keepq.keep_id
         |),
         |qual AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      len(regexp_split_to_array(trim(text), '\\s+'))::int AS n_words,
         |      CASE WHEN length(text) > 0
         |        THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::double / length(text)
         |        ELSE 0.0 END AS punct_ratio,
         |      CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
         |        THEN length(regexp_replace(text, '\\s+', '', 'g'))::double
         |             / len(regexp_split_to_array(trim(text), '\\s+'))
         |        ELSE 0.0 END AS mean_word_len,
         |      len(regexp_extract_all(text, '\\b(the|a|of|and|is)\\b'))::double
         |        / len(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio
         |    FROM documents)
         |  WHERE n_words BETWEEN 20 AND 1000
         |    AND mean_word_len BETWEEN 3.0 AND 5.0
         |    AND punct_ratio <= 0.3 AND stopword_ratio >= 0.02
         |),
         |surv AS (
         |  SELECT doc_id, text FROM qual
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dropset)
         |),
         |base AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))::bigint AS n_tokens,
         |    ('0x' || substr(md5(text),1,15))::bigint AS h
         |  FROM surv
         |),
         |cums AS (
         |  SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING)::bigint AS cum
         |  FROM base
         |)""".stripMargin

  /** The q102 BM25 pipeline as a WITH-chain ending at `ranked` —
    * shared by the q102 oracle and q116's negatives oracle (which
    * filters the same ranking through the near-dup pair set). */
  private[queries] lazy val bm25RankedCtes: String =
    """WITH ws AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w FROM documents
      |), occ AS (
      |  SELECT doc_id, ('0x' || substr(md5(s),1,15))::bigint % 2147483647 h FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i ->
      |      array_to_string(list_slice(w, i, i+2), ' '))) s
      |    FROM ws WHERE len(w) >= 3
      |  )
      |), tf AS (
      |  SELECT doc_id, h, count(*)::bigint AS tf FROM occ GROUP BY doc_id, h
      |), dl AS (
      |  SELECT doc_id, sum(tf)::bigint AS dl FROM tf GROUP BY doc_id
      |), stats AS (
      |  SELECT h, count(*)::bigint AS df FROM tf GROUP BY h
      |), tot AS (
      |  SELECT sum(tf)::bigint AS t_tok,
      |    count(DISTINCT doc_id)::bigint AS n_docs FROM tf
      |), q AS (
      |  SELECT d.doc_id FROM documents d
      |  WHERE ('0x' || substr(md5(d.text),1,15))::bigint % 20 = 0
      |    AND d.doc_id IN (SELECT doc_id FROM dl)
      |), cand AS (
      |  SELECT DISTINCT q.doc_id AS query_id, t2.doc_id AS doc_id
      |  FROM q
      |  JOIN tf t1 ON t1.doc_id = q.doc_id
      |  JOIN stats s ON s.h = t1.h AND s.df <= 16
      |  JOIN tf t2 ON t2.h = t1.h AND t2.doc_id <> q.doc_id
      |), contrib AS (
      |  SELECT c.query_id, c.doc_id,
      |    ((length(bin(n_docs)) - length(bin(st.df)))::hugeint
      |      * 22 * least(t2.tf, 15) * t_tok * 1000000)
      |    // (10*t_tok*least(t2.tf,15) + 3*t_tok + 9*d.dl*n_docs) AS ppm
      |  FROM cand c
      |  JOIN tf tq ON tq.doc_id = c.query_id
      |  JOIN tf t2 ON t2.doc_id = c.doc_id AND t2.h = tq.h
      |  JOIN stats st ON st.h = tq.h
      |  JOIN dl d ON d.doc_id = c.doc_id
      |  CROSS JOIN tot
      |), scored AS (
      |  SELECT query_id, doc_id, sum(ppm)::bigint AS score_ppm
      |  FROM contrib GROUP BY query_id, doc_id
      |), ranked AS (
      |  SELECT query_id, doc_id, score_ppm,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_ppm DESC, doc_id) AS rank
      |  FROM scored
      |)""".stripMargin

  private lazy val sourceReportSql: String =
      """WITH base AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+'))::int AS n_words,
        |    CASE WHEN length(text) > 0
        |      THEN length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::double / length(text)
        |      ELSE 0.0 END AS punct_ratio,
        |    CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |      THEN length(regexp_replace(text, '\s+', '', 'g'))::double
        |           / len(regexp_split_to_array(trim(text), '\s+'))
        |      ELSE 0.0 END AS mean_word_len,
        |    len(regexp_extract_all(text, '\b(the|a|of|and|is)\b'))::double
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio
        |  FROM documents
        |), flags AS (
        |  SELECT doc_id, source,
        |    CASE WHEN n_words >= 20 AND n_words <= 1000
        |      AND mean_word_len >= 3.0 AND mean_word_len <= 5.0
        |      AND punct_ratio <= 0.3 AND stopword_ratio >= 0.02
        |      THEN 1 ELSE 0 END AS keep
        |  FROM base
        |), grp AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY gk) AS rep FROM (
        |    SELECT doc_id,
        |      md5(array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) gk
        |    FROM documents
        |    WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 3
        |  )
        |), j AS (
        |  SELECT f.source, f.keep,
        |    CASE WHEN g.rep IS NOT NULL AND f.doc_id <> g.rep
        |      THEN 1 ELSE 0 END AS is_dup
        |  FROM flags f LEFT JOIN grp g ON g.doc_id = f.doc_id
        |), agg AS (
        |  SELECT source, count(*)::bigint AS n_docs,
        |    sum(is_dup)::bigint AS n_dup, sum(keep)::bigint AS n_keep,
        |    sum(CASE WHEN keep = 1 AND is_dup = 0 THEN 1 ELSE 0 END)::bigint AS n_good
        |  FROM j GROUP BY source
        |), tot AS (SELECT sum(n_good)::bigint AS total_good FROM agg)
        |SELECT source, n_docs, n_dup, n_keep, n_good,
        |  n_dup::double / n_docs::double AS dup_rate,
        |  n_keep::double / n_docs::double AS keep_rate,
        |  CASE WHEN total_good > 0 THEN n_good::double / total_good::double
        |    ELSE 0.0 END AS weight
        |FROM agg CROSS JOIN tot ORDER BY source""".stripMargin
}
