package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** The composed crawl-ingest pipeline as a public DataFrame API: build
  * the frozen per-snapshot index frames from an old corpus, then score
  * any new batch against them — the q109 record semantics
  * (triage/keep/dup/new-terms/bigram-surprisal/DSIR/BM25-routing) over
  * caller-named columns, with zero testdata-layout assumptions.
  *
  * Persistence is the CALLER's choice: every index is a plain DataFrame
  * (write it with your own writer, or [[graft.sources.SideTable]] for
  * the atomic-manifest artifact lifecycle the q-entries use). The
  * q-side snapshot builders derive their artifacts through THESE frame
  * definitions, so a batch scored here against indexes built here is
  * bit-identical to the verified q109 record (CrawlIngestSpec pins the
  * member parity; the composed oracle covers the values).
  *
  * Scale shape (unchanged from q109, argued in SCALE.md): scoring work
  * is |batch| + |candidates| — the old corpus is touched only through
  * the index frames, each broadcast-semi-filtered down to the batch's
  * keys before any join, and the one direct old-corpus read (the dedup
  * verify's re-shingle) is candidate-pruned before shingling.
  */
object Ingest {

  /** The frozen per-snapshot index frames a crawl loop maintains.
    * Column contracts: sigBands (doc_id, band_idx, band_key);
    * contentKeys (gk); vocabTerms (term); bm25Postings (doc_id, h, tf,
    * bucket); bm25Lexicon (h, df); bm25DocLens (doc_id, dl); bm25Stats
    * (t_tok, n_docs); dsirTargetLm (h, ct); dsirRawLm (h, cr);
    * bigramCtxLm (h1, c1); bigramLm (h2, c2). */
  case class Indexes(
      sigBands: DataFrame, contentKeys: DataFrame, vocabTerms: DataFrame,
      bm25Postings: DataFrame, bm25Lexicon: DataFrame,
      bm25DocLens: DataFrame, bm25Stats: DataFrame,
      dsirTargetLm: DataFrame, dsirRawLm: DataFrame,
      bigramCtxLm: DataFrame, bigramLm: DataFrame)

  private def canon(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      col(textCol).as("text"))

  // ---- index frame definitions ----------------------------------------
  // Single definitions: the q67/q79/q95/q101/q105/q106/q107 snapshot
  // builders ensure their artifacts through these, so the public API
  // and the verified queries can never drift apart.

  /** Banded MinHash signature index rows — the q67 artifact layout. */
  def sigBandFrame(docs: DataFrame): DataFrame =
    Dedup.minhashBands(docs)

  /** Distinct content keys (md5 of the word sequence) — q79/q95's. */
  def contentKeyFrame(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(md5(concat_ws(" ", words(col("text")))).as("gk"))
      .distinct()

  /** Distinct vocabulary terms — q101's. */
  def vocabTermFrame(docs: DataFrame): DataFrame =
    docs.select(explode(words(col("text"))).as("term")).distinct()

  /** Term-hash-bucketed postings (tf per doc×term 3-gram) — q105's;
    * partition the persisted table by `bucket`. */
  def bm25PostingsFrame(docs: DataFrame): DataFrame =
    shingleHashRows(docs, 3)
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(col("h"), lit(64)).cast("int"))

  /** Document frequencies from the postings frame (never the corpus). */
  def bm25LexiconFrame(postings: DataFrame): DataFrame =
    postings.groupBy(col("h")).agg(count(lit(1)).as("df"))

  /** Per-document lengths from the postings frame. */
  def bm25DocLenFrame(postings: DataFrame): DataFrame =
    postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

  /** One-row collection statistics from the postings frame. */
  def bm25StatsFrame(postings: DataFrame): DataFrame =
    postings.agg(sum(col("tf")).as("t_tok"),
      countDistinct(col("doc_id")).as("n_docs"))

  /** The frozen hashed-feature DSIR LMs (target, raw) — q106's. Both
    * are ≤ `buckets` rows at ANY corpus size (that is the point). */
  def dsirLmFrames(docs: DataFrame, target: String,
      buckets: Int = 10000): (DataFrame, DataFrame) = {
    def lm(cond: org.apache.spark.sql.Column, cName: String): DataFrame =
      docs.where(cond)
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .select(pmod(hash60(col("term")), lit(buckets)).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as(cName))
    (lm(col("source") === target, "ct"),
      lm(col("source") =!= target, "cr"))
  }

  /** The frozen bigram LMs (context counts, bigram counts) — q107's,
    * from ONE dual-window generator pass. */
  def bigramLmFrames(docs: DataFrame): (DataFrame, DataFrame) = {
    val dual = dualShingleHashRows(docs, 1, 2)
      .where(col("h2").isNotNull)
    (dual.groupBy(col("h1")).agg(count(lit(1)).as("c1")),
      dual.groupBy(col("h2")).agg(count(lit(1)).as("c2")))
  }

  /** Derive every index frame from an old corpus under caller-named
    * columns. The postings frame is materialized once
    * (localCheckpoint) because three dependent frames derive from it;
    * everything else stays lazy — persist what you keep. */
  def buildIndexes(old: DataFrame, target: String, buckets: Int = 10000,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source"): Indexes = {
    val o = canon(old, idCol, textCol, srcCol)
    val post = bm25PostingsFrame(o).localCheckpoint()
    val (ct, cr) = dsirLmFrames(o, target, buckets)
    val (ctx, big) = bigramLmFrames(o)
    Indexes(
      sigBands = sigBandFrame(o),
      contentKeys = contentKeyFrame(o),
      vocabTerms = vocabTermFrame(o),
      bm25Postings = post,
      bm25Lexicon = bm25LexiconFrame(post),
      bm25DocLens = bm25DocLenFrame(post),
      bm25Stats = bm25StatsFrame(post),
      dsirTargetLm = ct, dsirRawLm = cr,
      bigramCtxLm = ctx, bigramLm = big)
  }

  /** Score a crawl batch against frozen indexes — the q109 per-doc
    * ingest record (batch-view semantics: both sides of a within-batch
    * near-dup pair triage 'near'): (<id>, <src>, triage, keep, is_dup,
    * n_new_terms, n_bigrams, n_oov, lm_bits, lm_mean, dsir_tokens,
    * dsir_bits, dsir_score, top1_doc, top1_ppm). `old` is read ONLY
    * for the dedup verify's candidate-pruned re-shingle — every other
    * old-corpus fact comes from the index frames. One TriShingles
    * generator pass feeds every member (the q109 single-derivation
    * discipline); members run serially here — the q109 entry overlaps
    * them as concurrent actions, an orchestration choice, not a
    * semantics one.
    *
    * PRECONDITION (enforced): every old id must be strictly below
    * every batch id — the cut discipline the whole incremental family
    * assumes (dedup candidate pairs order old-before-batch by id, and
    * a shared id would merge two documents' shingle sets into a
    * chimera). The check compares max(old)/min(batch) on the RAW id
    * column with Spark's `<` — the SAME ordering the pair construction
    * uses — so caller-chosen id types (strings, decimals) are checked
    * under their real ordering, never a silently-null long cast; null
    * ids on either side fail outright. Still min/max-probe grain (the
    * O7 grain), not a data scan. */
  def scoreBatch(old: DataFrame, batch: DataFrame, idx: Indexes,
      target: String, buckets: Int = 10000, dfCap: Int = 16,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    import graft.queries.CrawlIngest
    val s = batch.sparkSession
    val o = canon(old, idCol, textCol, srcCol)
    val b = canon(batch, idCol, textCol, srcCol)
    val cut = o.agg(max(col("doc_id")).as("mx"), count(lit(1)).as("on"),
        count(col("doc_id")).as("onid"))
      .crossJoin(b.agg(min(col("doc_id")).as("mn"),
        count(lit(1)).as("bn"), count(col("doc_id")).as("bnid")))
      .select(col("mx"), col("mn"), (col("mx") < col("mn")).as("ok"),
        (col("on") === col("onid")).as("oc"),
        (col("bn") === col("bnid")).as("bc"))
      .head()
    require(cut.getAs[Boolean]("oc") && cut.getAs[Boolean]("bc"),
      "scoreBatch found null ids — the cut discipline orders documents " +
        "by id, so every row needs one")
    if (!cut.isNullAt(2)) // either side empty → nothing to order
      require(cut.getAs[Boolean]("ok"),
        s"scoreBatch needs every old id < every batch id (the cut " +
          s"discipline); got max(old)=${cut.get(0)} >= " +
          s"min(batch)=${cut.get(1)} — renumber the batch")
    val meta = CrawlIngest.metaFrame(b).localCheckpoint()
    val grams = triShingleHashRows(b, Seq("source")).localCheckpoint()
    val (_, perDocNew) = CrawlIngest.vocabMember(idx.vocabTerms, grams)
    val sh3 = grams.where(col("h3").isNotNull)
      .select(col("doc_id"), col("h3").as("h"))
    val (_, pairs, _, _) = CrawlIngest.dedupMember(s, idx.sigBands, sh3,
      "ingest batch bands") { candDocs =>
      shingleHashRows(
        o.join(broadcast(candDocs), Seq("doc_id"), "left_semi"), 3)
    }
    val bIds = b.select(col("doc_id"))
    val nearDocs = pairs.select(col("d1").as("doc_id"))
      .unionByName(pairs.select(col("d2").as("doc_id")))
      .join(broadcast(bIds), Seq("doc_id"), "left_semi").distinct()
      .withColumn("near_hit", lit(1))
    val batchKeys = meta.where(col("gk").isNotNull)
      .select(col("doc_id"), col("gk"))
    val hitKeys = CrawlIngest.keyProbe(idx.contentKeys,
      batchKeys.select(col("gk")).distinct())
    val dsir = CrawlIngest.dsirMember(idx.dsirTargetLm, idx.dsirRawLm,
      grams, target, buckets)
    val bigram = CrawlIngest.bigramMember(idx.bigramCtxLm, idx.bigramLm,
      grams)
    val top1 = CrawlIngest.bm25Member(idx.bm25Postings, idx.bm25Lexicon,
      idx.bm25DocLens, idx.bm25Stats, grams, dfCap)
    val (triage, bdup) =
      CrawlIngest.batchTriageAndDup(batchKeys, meta, hitKeys, nearDocs)
    CrawlIngest.record(meta, triage, bdup, perDocNew, bigram, dsir, top1)
      .withColumnRenamed("doc_id", idCol)
      .withColumnRenamed("source", srcCol)
  }
}
