package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Public data-selection operators: DSIR-style importance scoring
  * (Xie et al. 2023) of a raw pool against a target domain. The
  * q104/q106 entries bind to these cores; [[score]] is the ONE scoring
  * definition both the full-corpus and the incremental (frozen-LM
  * artifact) paths share.
  */
object Select {

  /** Hashed-feature frame of a `doc_id`/`text` frame: (doc_id, h, k) —
    * token counts per hash bucket. Collisions are intentional: both LMs
    * stay ≤ `buckets` rows at ANY corpus size, so they broadcast. */
  private def features(d: DataFrame, buckets: Int): DataFrame =
    d.select(col("doc_id"), explode(words(col("text"))).as("term"))
      .select(col("doc_id"),
        pmod(hash60(col("term")), lit(buckets)).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("k"))

  /** The shared DSIR scorer: per-token importance bits =
    * bitlen(ct+1) − bitlen(cr+1) (Laplace +1 on BOTH LMs — the target
    * side can miss pool features and, in the incremental variant, a
    * frozen raw LM can miss batch features), summed per doc with one
    * final division. `perDoc` is (doc_id, h, k); `ct`/`cr` are the
    * (h, ct)/(h, cr) LM frames, ≤ buckets rows each, joined as
    * broadcasts. Output: (doc_id, n_tokens, sum_bits, score). */
  def score(perDoc: DataFrame, ct: DataFrame, cr: DataFrame): DataFrame =
    perDoc
      .join(broadcast(cr), Seq("h"), "left")
      .join(broadcast(ct), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k") *
          (length(bin(coalesce(col("ct"), lit(0L)) + 1)) -
           length(bin(coalesce(col("cr"), lit(0L)) + 1)))).as("sum_bits"))
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
        (col("sum_bits").cast("double") / col("n_tokens").cast("double"))
          .as("score"))

  /** Per-document DSIR importance scores of `pool` docs against the
    * `target` domain corpus. Output: (<id>, n_tokens, sum_bits, score)
    * — higher = more target-like. The corpus-growth pool never shuffles
    * to meet the LMs (both broadcast).
    *
    * Tokenization convention (shared with every DuckDB oracle in the
    * engine): an empty/whitespace-only document splits to ONE empty
    * token, so it scores n_tokens=1 rather than dropping out — filter
    * such docs upstream (e.g. [[Curate.qualityFilter]] or a length
    * predicate) if they should not compete for selection budget. */
  def dsir(pool: DataFrame, target: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 10000): DataFrame = {
    val p = pool.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val t = target.select(col(idCol).as("doc_id"),
      col(textCol).as("text"))
    val perDoc = features(p, buckets)
      .localCheckpoint() // feeds the raw LM and the scoring join
    val ct = features(t, buckets).groupBy(col("h"))
      .agg(sum(col("k")).as("ct"))
    val cr = perDoc.groupBy(col("h")).agg(sum(col("k")).as("cr"))
    score(perDoc, ct, cr).withColumnRenamed("doc_id", idCol)
  }

  /** [[dsir]] plus the selection step: the global top-`budget` docs by
    * score via the mergeable TopK (budget rows cross the wire — never a
    * corpus sort). Output: (rank, <id>, n_tokens, sum_bits, score). */
  def dsirTopK(pool: DataFrame, target: DataFrame, budget: Int,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 10000): DataFrame = {
    val scored = dsir(pool, target, idCol, textCol, buckets)
      .withColumnRenamed(idCol, "doc_id")
    val topk = udaf(new graft.functions.TopK.TopKAgg(budget),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        graft.functions.TopK.Scored]())
    scored
      .agg(topk(col("score"), col("doc_id"), col("n_tokens"),
        col("sum_bits"), lit(0L)).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "r")))
      .select((col("i") + 1).cast("long").as("rank"),
        col("r.k1").as("doc_id"), col("r.k2").as("n_tokens"),
        col("r.k3").as("sum_bits"), col("r.score").as("score"))
      .withColumnRenamed("doc_id", idCol)
  }
}
