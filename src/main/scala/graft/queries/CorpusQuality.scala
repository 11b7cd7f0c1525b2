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
    // from the 32-row shard-total frame — metadata-grade driver work, the
    // only part that is not shard-parallel. No task ever holds more than
    // its shard; the window's partition count scales with the shard
    // count, not with 1.
    "q63_token_budget" -> ((s, dir) => {
      val budget = 10000L
      val nShards = 32
      val d = Graft.parquetSource(s, dir).table("documents")
      val base = d.select(col("doc_id"),
          bpeTokenCount(col("text")).cast("long").as("n_tokens"),
          hash60(col("text")).as("h"))
        // hash60 is 60 bits; the top 5 bits are monotone in h, so
        // (shard, h, doc_id) order ≡ global (h, doc_id) order
        .withColumn("shard", shiftright(col("h"), 55))
      val totals = base.groupBy(col("shard"))
        .agg(sum(col("n_tokens")).as("t"))
        .collect() // ≤ nShards rows — metadata, same grain as O7's
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val offsets = (0 until nShards).map { sh =>
        (sh.toLong, (0 until sh).map(p => totals.getOrElse(p.toLong, 0L)).sum)
      }
      import s.implicits._
      val offDf = offsets.toDF("shard", "off")
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.join(broadcast(offDf), "shard")
        .withColumn("cum", sum(col("n_tokens")).over(w) + col("off"))
        .where(col("cum") <= budget)
        .select(col("doc_id"), col("n_tokens"), col("cum"))
        .orderBy("cum", "doc_id")
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
    })
  )

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
        |GROUP BY sg.doc_id ORDER BY sg.doc_id""".stripMargin
  )
}
