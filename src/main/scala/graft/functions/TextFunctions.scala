package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline workloads
  * (SURVEY.md §7.2 step 7 — north-star extensions beyond the reference).
  *
  * Every function here is built from native Catalyst expressions (string
  * ops, regex, higher-order array functions) — no UDFs, so the whole
  * pipeline stays inside whole-stage codegen and scales linearly with
  * partitions at 100 TB.
  *
  * Determinism contract: each function has an exact DuckDB-SQL equivalent
  * (integer/IEEE arithmetic in a fixed order), so results hash-match the
  * correctness oracle bit-for-bit.
  */
object TextFunctions {

  /** Mersenne prime 2^31-1 — modulus for rolling/minhash arithmetic.
    * Keeps products under 2^37, far from Long overflow. */
  val HashP: Long = 2147483647L

  /** 60-bit deterministic string hash: first 15 hex chars of md5 → bigint.
    * md5 is identical in every engine, so this is the cross-engine hash
    * primitive (DuckDB: `cast('0x' || substr(md5(s),1,15) as bigint)`).
    * Computed by the native [[Hash60Expr]] straight from digest bytes —
    * the equivalent built-in chain `conv(substring(md5(c),1,15),16,10)`
    * allocates and re-parses a hex string per row. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(Hash60Expr(
      org.apache.spark.sql.GraftArrowBridge.expression(c)))

  /** Accent stripping (Unicode NFD + combining-mark removal) via the
    * native [[UnaccentExpr]] — DuckDB-equivalent: `strip_accents(s)`.
    * Pure-ASCII rows take a byte-scan fast path with no allocation. */
  def unaccent(c: Column): Column =
    org.apache.spark.sql.GraftArrowBridge.column(UnaccentExpr(
      org.apache.spark.sql.GraftArrowBridge.expression(c)))

  /** Whitespace tokenization of trimmed text. */
  def words(c: Column): Column = split(trim(c), "\\s+")

  def wordCount(c: Column): Column = size(words(c))

  def charCount(c: Column): Column = length(c)

  /** BPE-ish token count: alpha runs are chunked to ≤4 chars, digits and
    * punctuation tokenize singly — a deterministic approximation of BPE
    * vocabulary behavior with no model file. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation ratio: non-alphanumeric-non-space chars / total chars. */
  def punctRatio(c: Column): Column = {
    val stripped = regexp_replace(c, "[A-Za-z0-9\\s]", "")
    when(length(c) > 0, length(stripped).cast("double") / length(c))
      .otherwise(lit(0.0d))
  }

  /** Mean word length — long-word gibberish shows up as an outlier. */
  def meanWordLen(c: Column): Column =
    when(wordCount(c) > 0,
      length(regexp_replace(c, "\\s+", "")).cast("double") /
        wordCount(c)).otherwise(lit(0.0d))

  /** Number of tokens of `c` that appear in `vocab` (with multiplicity). */
  def tokensInSet(c: Column, vocab: Seq[String]): Column = {
    val set = array(vocab.map(lit): _*)
    aggregate(words(c), lit(0),
      (acc, w) => acc + when(array_contains(set, w), 1).otherwise(0))
  }

  /** Stopword ratio against a given stopword list. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    when(wordCount(c) > 0,
      tokensInSet(c, stopwords).cast("double") / wordCount(c))
      .otherwise(lit(0.0d))

  /** Rolling document fingerprint: polynomial hash over the 60-bit hashes
    * of the token stream, mod 2^31-1. Order-sensitive (a permuted document
    * fingerprints differently), cheap, and exactly reproducible in SQL. */
  def fingerprint(c: Column): Column =
    aggregate(words(c), lit(0L),
      (acc, w) => (acc * 31L + pmod(hash60(w), lit(HashP))) % HashP)

  /** Rolling fingerprints for a whole `doc_id`/`text` DataFrame — the
    * codegen formulation of [[fingerprint]] (equivalence property-tested):
    * the fold acc·31 + h_i mod p expands to Σ h_i·31^(n−1−i) mod p, so
    * each exploded token contributes one term via a precomputed power
    * table and a commutative SUM aggregate (map-side partial agg) replaces
    * the interpreted sequential lambda fold. Documents longer than the
    * power table (8192 words) are not supported by this formulation. */
  def fingerprintRows(docs: DataFrame): DataFrame = {
    val maxW = 8192
    val pows = {
      val a = new Array[Long](maxW); a(0) = 1L
      for (i <- 1 until maxW) a(i) = a(i - 1) * 31L % HashP
      a.toSeq
    }
    val powArr = typedLit(pows)
    val w = Window.partitionBy("doc_id")
    docs
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"),
        pmod(hash60(col("w")), lit(HashP)).as("h"),
        count(lit(1)).over(w).as("nw"))
      .select(col("doc_id"),
        // beyond the power table, element_at would yield null and the SUM
        // would silently skip the term → a wrong fingerprint; fail loudly
        when(col("nw") <= maxW,
          pmod(col("h") * element_at(powArr,
            (col("nw") - col("pos")).cast("int")), lit(HashP)))
          .otherwise(raise_error(concat(lit(
            s"fingerprintRows supports at most $maxW words per document; doc "),
            col("doc_id"), lit(" has "), col("nw")))).as("term"))
      .groupBy(col("doc_id"))
      .agg(pmod(sum(col("term")), lit(HashP)).as("fp"))
  }

  /** Word n-gram shingles: `n`-token windows joined by single spaces.
    * Documents shorter than `n` tokens yield an empty array. */
  def shingles(c: Column, n: Int): Column = {
    val ws = words(c)
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle hashes (mod p) — the MinHash input set. */
  def shingleHashes(c: Column, n: Int): Column =
    array_distinct(transform(shingles(c, n),
      s => pmod(hash60(s), lit(HashP))))

  /** Shingle hashes as ROWS with multiplicity, via the native
    * [[ShinglesExpr]] generator — one iterator per input row, rows out
    * MAP-SIDE with no shuffle at all (equivalence property-tested against
    * the HOF formulation; lambda HOFs are interpreted AND JIT-unstable —
    * 3 s to 90 s run-to-run for the same plan). An earlier formulation
    * stitched posexploded tokens with window `lead`: fully codegen'd, but
    * it paid a corpus-wide hash-shuffle + sort of every TOKEN row before
    * any shingle existed. The generator needs neither; only the small
    * repartition of raw documents (testdata is a single row group — at
    * real scale with many input files even that drops away). Expects
    * `doc_id`/`text` columns; keeps docs with ≥ 3 words; returns
    * (doc_id, <extra...>, h) — `extra` columns (e.g. a source label)
    * ride through the generator projection like
    * [[triShingleHashRows]]'s. */
  def shingleHashRows(docs: DataFrame, n: Int,
      extra: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.GraftArrowBridge.{column, expression}
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    spread.where(size(words(col("text"))) >= 3)
      .select((col("doc_id") +: extra.map(col)) :+
        column(ShinglesExpr(expression(col("text")),
          expression(lit(n)))).as("s"): _*)
      .select((col("doc_id") +: extra.map(col)) :+
        pmod(hash60(col("s")), lit(HashP)).as("h"): _*)
  }

  /** Shingle hashes at TWO window sizes from one corpus pass, via the
    * native [[DualShinglesExpr]] generator: (doc_id, h1, h2) with one
    * row per `n1`-gram position; `h2` is null at positions with no full
    * `n2`-gram (`n1 < n2`). The multi-window-probe primitive (q75):
    * two [[shingleHashRows]] passes would scan and re-tokenize the
    * corpus once per window size. */
  def dualShingleHashRows(docs: DataFrame, n1: Int, n2: Int): DataFrame = {
    import org.apache.spark.sql.GraftArrowBridge.{column, expression}
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    spread
      .select(col("doc_id"),
        column(DualShinglesExpr(expression(col("text")),
          expression(lit(n1)), expression(lit(n2))))
          .as(Seq("s1", "s2")))
      .select(col("doc_id"),
        pmod(hash60(col("s1")), lit(HashP)).as("h1"),
        when(col("s2").isNotNull, pmod(hash60(col("s2")), lit(HashP)))
          .as("h2"))
  }

  /** Uni-, bi- and tri-gram streams from ONE corpus pass, via the
    * native [[TriShinglesExpr]] generator: one row per TOKEN position
    * with the token itself (`term` — vocabulary/DSIR consumers need the
    * string, not just a hash), its unigram/bigram hashes (`h1`/`h2`,
    * the q103/q107 LM feature space) and its word-3-gram hash (`h3`,
    * the MinHash/BM25 shingle space; null at the last two positions).
    * The composed crawl-ingest derivation (q109): the non-null `h3`
    * rows are exactly [[shingleHashRows]](docs, 3) and the (h1, h2)
    * pairs are exactly [[dualShingleHashRows]](docs, 1, 2) — one batch
    * scan replaces one scan per incremental-family member. `extra`
    * columns (e.g. `source`) ride along per row. */
  def triShingleHashRows(docs: DataFrame,
      extra: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.GraftArrowBridge.{column, expression}
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    spread
      .select((col("doc_id") +: extra.map(col)) :+
        column(TriShinglesExpr(expression(col("text")),
          expression(lit(1)), expression(lit(2)), expression(lit(3))))
          .as(Seq("s1", "s2", "s3")): _*)
      .select((col("doc_id") +: extra.map(col)) ++ Seq(
        col("s1").as("term"),
        pmod(hash60(col("s1")), lit(HashP)).as("h1"),
        when(col("s2").isNotNull, pmod(hash60(col("s2")), lit(HashP)))
          .as("h2"),
        when(col("s3").isNotNull, pmod(hash60(col("s3")), lit(HashP)))
          .as("h3")): _*)
  }

  /** k MinHash signatures over a distinct-hash set: permutation j is
    * h -> ((2j+3)·h + j²+1) mod p. Products stay < 2^36 (h < p ≈ 2^31,
    * a_j ≤ 33) — no Long overflow. */
  def minhashes(hs: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(hs, h => ((j * 2 + 3) * h + j * j + lit(1)) % HashP)))

  /** LSH band keys: the signature is cut into `bands` runs of `rows`
    * values; each run is comma-joined and re-hashed to a 60-bit band key.
    * Two documents are candidate duplicates iff they share ≥1 band key —
    * the bucket-join replaces the O(n²) all-pairs comparison at scale. */
  def lshBandKeys(mh: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      hash60(concat_ws(",",
        transform(slice(mh, b * rows + 1, lit(rows)), _.cast("string")))))

  /** 48-bit SimHash over a distinct-hash set. Bit b is the sign of
    * Σ_h (2·(((h·(2b+1)+b) mod p) & 1) − 1): each set element votes ±1
    * per bit through a per-bit rehash (the raw hashes are < 2^31, so
    * their high bits carry no signal — rehashing restores it). */
  def simhash48(hs: Column): Column = {
    val pow2 = array((0 until 48).map(b => lit(1L << b)): _*)
    aggregate(
      transform(sequence(lit(0), lit(47)), b =>
        when(aggregate(hs, lit(0L), (acc, h) =>
          acc + (((h * (b * 2 + 1) + b) % HashP).bitwiseAND(lit(1L)) * 2 - 1)) > 0,
          element_at(pow2, b + 1)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Jaccard similarity of two distinct-hash sets, as double. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Distinct lowercase character trigrams of the text. */
  def charTrigrams(c: Column): Column = {
    val lc = lower(c)
    when(length(lc) >= 3,
      array_distinct(transform(sequence(lit(1), length(lc) - 2),
        i => substr(lc, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Character-n-gram language signal: |trigrams(text) ∩ profile| /
    * |trigrams(text)| — the classic n-gram language-ID heuristic over a
    * fixed per-language trigram profile. */
  def trigramOverlap(c: Column, profile: Seq[String]): Column = {
    val tg = charTrigrams(c)
    when(size(tg) > 0,
      size(array_intersect(tg, array(profile.map(lit): _*))).cast("double") /
        size(tg).cast("double"))
      .otherwise(lit(0.0d))
  }
}
