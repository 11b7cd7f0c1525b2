package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.TextFunctions._

/** Public data-selection operators: DSIR-style importance scoring
  * (Xie et al. 2023) of a raw pool against a target domain, and the
  * trained model-based quality classifier (fastText/DCLM-style
  * discriminator) modern curation pipelines run as their primary
  * filter. The q104/q106 entries bind to the DSIR cores; q151–q153
  * bind to the classifier. [[score]] is the ONE DSIR scoring
  * definition both the full-corpus and the incremental (frozen-LM
  * artifact) paths share; [[classifierScore]] is the one classifier
  * scoring definition shared by in-session scoring and the
  * frozen-model incremental path.
  */
object Select {

  /** 2²⁰ — the house fixed-point scale (probabilities, weights). */
  val Fp20: Long = 1048576L

  /** 2⁴⁰ — the z-denominator: zn is a (weight·feature) sum at
    * 2²⁰·2²⁰ scale. */
  private val Fp40d: Double = 1099511627776.0d

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

  // ------------------------------------------------ quality classifier

  /** Hashed-tf feature frame shared by [[classifierTrain]] and
    * [[classifierScore]]: (doc_id, h, t20, n) — per doc, the hashed
    * token buckets (the [[features]] discipline: both model and
    * feature space stay ≤ `buckets` REGARDLESS of corpus size) with
    * fixed-point term frequency t20 = ⌊k·2²⁰/n⌋ (exact integer
    * division — order-free), plus ONE bias row (h = −1, t20 = 2²⁰).
    * Σ_h t20 ≤ 2²⁰ per doc by construction, so with the bias every
    * doc's feature mass is ≤ 2²¹ — the bound the exactness argument
    * in [[classifierTrain]] rests on. */
  private def tf20(d: DataFrame, buckets: Int): DataFrame = {
    val pd = features(d, buckets)
    val n = pd.groupBy(col("doc_id")).agg(sum(col("k")).as("n"))
    pd.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("h"),
        expr(s"k * ${Fp20}L div n").as("t20"), col("n"))
      .unionByName(n.select(col("doc_id"), lit(-1L).as("h"),
        lit(Fp20).as("t20"), col("n")))
  }

  /** p20 = ⌊2²⁰·σ̃(zn/2⁴⁰)⌋ with the ALGEBRAIC sigmoid
    * σ̃(z) = ½ + ½·z/(1+|z|): every op in the chain is a
    * correctly-rounded IEEE primitive (abs/add/div are; exp is NOT —
    * libm exp differs across engines in the last ulp, which a floor
    * can amplify into an off-by-one integer), so the fixed-point
    * probability is bit-identical in Spark and DuckDB. Monotone
    * squashing to (0,1) is all a threshold filter consumes. */
  private def p20Of(zn: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val z = zn.cast("double") / lit(Fp40d)
    floor(lit(Fp20.toDouble) *
      (lit(0.5d) + lit(0.5d) * z / (lit(1.0d) + abs(z))))
  }

  private val wSchema = StructType(Seq(StructField("h", LongType),
    StructField("w20", LongType)))

  /** Train a hashed-bag-of-words quality classifier — the
    * fastText/DCLM-style model-based filter (Li et al.,
    * "DataComp-LM", arXiv:2406.11794; Penedo et al., "FineWeb",
    * arXiv:2406.17557, the FineWeb-Edu classifier) in the engine's
    * fixed-point deterministic grade: logistic-style regression over
    * the [[tf20]] features, trained by `iters` full-batch
    * per-coordinate-normalized gradient iterations
    *
    *   w20_h ← w20_h − trunc(lr20·g_h / (S_h·2²⁰)),
    *   g_h = Σ_d e_d·t20_{d,h},  S_h = Σ_d t20_{d,h},
    *   e_d = p20_d − y_d·2²⁰,
    *
    * all EXACT integers (the q146 fixed-point discipline): g/S are
    * order-free integer sums (decimal(38,0) so no corpus size
    * overflows them), p20 is one fixed-shape IEEE expression
    * ([[p20Of]]), and the update runs in driver BigInt — the ONLY
    * driver-side data is the ≤ buckets+1-row model per iteration
    * (model grain, constant in corpus size — the spark.ml
    * treeAggregate shape). Per-coordinate normalization (divide by
    * the feature's own mass S_h) is what makes one lr work for the
    * 2²⁰-scale bias AND the ~2²⁰/vocab-scale word features — an
    * unnormalized full-batch step makes the bias coordinate
    * oscillate (measured: ±3.8e6 flip-flop at lr=16 unnormalized vs
    * monotone convergence normalized).
    *
    * Exactness bound: |delta| ≤ lr20 per iteration, so
    * |w20| ≤ iters·lr20; with Σ_h t20 ≤ 2²¹ per doc, |zn| ≤
    * iters·lr20·2²¹ — for the default 16·2²¹·2²¹ = 2²⁵⁺²¹ < 2⁵³ the
    * long sum AND its double cast are exact. The require below pins
    * the bound.
    *
    * `labeled` must carry (idCol, textCol, labelCol) with labelCol
    * integer 0/1 — the caller chooses the seed (the q151 binding
    * balances positives against a deterministic hash-sample of
    * negatives, the practice fastText curation classifiers follow).
    * Output: (h, w20) — h = −1 is the bias; feed to
    * [[classifierScore]]. Per iteration: one broadcast join of the
    * model, two co-partitioned doc-grain aggregates riding the
    * checkpointed feature frame, one bucket-bounded gradient
    * aggregate (map-side combinable) — the only corpus-scale shuffle
    * is the feature frame's own construction, paid once. */
  def classifierTrain(labeled: DataFrame, labelCol: String = "y",
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 8192, iters: Int = 16,
      lr20: Long = 2L * Fp20): DataFrame = {
    // The per-iteration gradient is a ≤ buckets+1-row driver collect
    // (two decimal(38,0) cells per row) — the cap keeps that collect at
    // metadata grain so the scaladoc's "model-grain" claim stays true at
    // the knob's own boundary. 2^18 hashed-ngram buckets is already
    // generous for an LR curation filter (fastText-style filters ship
    // with 10^5–10^6 buckets); above 2^16 the collect still works but
    // deserves a visible note.
    require(buckets >= 2 && buckets <= (1 << 18),
      s"need 2 <= buckets <= 2^18 (got $buckets) — each iteration " +
        "collects a <= buckets+1-row gradient to the driver")
    if (buckets > (1 << 16))
      System.err.println(s"[graft] classifierTrain: buckets=$buckets — " +
        s"each of $iters iterations collects a ~$buckets-row gradient " +
        "to the driver (~48 bytes/row); still metadata-grain, but " +
        "consider whether > 2^16 hashed features is intentional")
    require(iters >= 1 && iters <= 64, s"need 1 <= iters <= 64 (got $iters)")
    require(lr20 >= 1L && iters.toLong * lr20 <= (1L << 31),
      s"need 1 <= lr20 and iters*lr20 <= 2^31 (got lr20=$lr20, " +
        s"iters=$iters) — the zn-exactness bound")
    val spark = labeled.sparkSession
    val d = labeled.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(labelCol).cast("long").as("y"))
    val feats = tf20(d.select(col("doc_id"), col("text")), buckets)
      .join(d.select(col("doc_id"), col("y")), Seq("doc_id"))
      .repartition(col("doc_id"))
      .localCheckpoint() // read twice per iteration; lineage truncated
    var w = Map.empty[Long, BigInt]
    for (_ <- 1 to iters) {
      val wDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          w.toSeq.map { case (h, v) => Row(h, v.toLong) }, 1), wSchema)
      val e = feats
        .join(broadcast(wDf), Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(coalesce(col("w20"), lit(0L)) * col("t20")).as("zn"),
          max(col("y")).as("y"))
        .select(col("doc_id"),
          (p20Of(col("zn")).cast("long") - col("y") * Fp20).as("e"))
      val g = feats.select(col("doc_id"), col("h"), col("t20"))
        .join(e, Seq("doc_id"))
        .groupBy(col("h"))
        .agg(sum((col("e") * col("t20")).cast("decimal(38,0)")).as("g"),
          sum(col("t20").cast("decimal(38,0)")).as("s"))
        .collect()
      w = g.map { r =>
        val h = r.getLong(0)
        val gv = BigInt(r.getDecimal(1).toBigInteger)
        val sv = BigInt(r.getDecimal(2).toBigInteger)
        // BigInt / truncates toward zero — the oracle's sign-split
        // nonnegative // replays it exactly
        val delta = (BigInt(lr20) * gv) / (sv * BigInt(Fp20))
        h -> (w.getOrElse(h, BigInt(0)) - delta)
      }.toMap
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        w.toSeq.sortBy(_._1).map { case (h, v) => Row(h, v.toLong) }, 1),
      wSchema)
  }

  /** Score documents under a trained classifier model ((h, w20) from
    * [[classifierTrain]] — in-session or read back from a persisted
    * artifact, the frozen-model incremental path): per doc,
    * zn = Σ_h w20_h·t20_h (exact long sum, see the train bound),
    * p20 = [[p20Of]], prob = p20/2²⁰, keep = p20 ≥ threshold20.
    * Output: (<id>, n_tokens, p20, prob, keep). The model joins as a
    * broadcast (≤ buckets+1 rows at ANY corpus size); everything else
    * rides the per-doc feature aggregate — batch-proportional, zero
    * training-corpus reads. */
  def classifierScore(docs: DataFrame, model: DataFrame,
      threshold20: Long = Fp20 / 2, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 8192): DataFrame = {
    require(threshold20 >= 0L && threshold20 <= Fp20,
      s"need 0 <= threshold20 <= 2^20 (got $threshold20)")
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    tf20(d, buckets)
      .join(broadcast(model.select(col("h"), col("w20"))), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w20"), lit(0L)) * col("t20")).as("zn"),
        max(col("n")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        p20Of(col("zn")).cast("long").as("p20"))
      .withColumn("prob", col("p20").cast("double") / lit(Fp20.toDouble))
      .withColumn("keep", col("p20") >= threshold20)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Threshold-sweep evaluation of a trained classifier — the audit
    * companion to [[classifierScore]] (the recall-audit discipline the
    * ANN family follows): given the scored frame (`<id>`, p20, … from
    * [[classifierScore]]) and a labels frame (`<id>`, `<labelCol>` ∈
    * {0,1}), emit one row per candidate threshold with the confusion
    * matrix and integer-ppm precision/recall/F1/keep-rate. This is the
    * curve a deployment reads to PICK threshold20 — fastText/DCLM-style
    * filters are tuned by exactly this sweep, not by the 0.5 default.
    *
    * Thresholds are the `n` interior (i·2²⁰)//(n+1) grid points,
    * i = 1..n (n = 9 → the probability deciles 0.1..0.9).
    *
    * 100 TB shape: the ONLY corpus-scale work is one join + one
    * aggregate collapsing docs to the (p20, y) histogram (≤ 2·(2²⁰+1)
    * keys at ANY corpus size — map-side combinable); the sweep itself
    * is a broadcast nested-loop over histogram × n rows. Metrics are
    * exact integer floor-division ppm (all terms nonnegative, so
    * Spark's `div` ≡ DuckDB's `//`), never a double in the hash path.
    *
    * Output: (thr20, tp, fp, fn, tn, precision_ppm, recall_ppm,
    * f1_ppm, keep_ppm), ordered by thr20. F1 is computed from the ppm
    * precision/recall (the only exact-integer formulation both engines
    * replay bit-for-bit); docs missing from `labels` are ignored
    * (inner join — audit what you can label). */
  def classifierEval(scored: DataFrame, labels: DataFrame,
      nThresholds: Int = 9, idCol: String = "doc_id",
      labelCol: String = "y"): DataFrame = {
    require(nThresholds >= 1 && nThresholds <= 1024,
      s"need 1 <= nThresholds <= 1024 (got $nThresholds)")
    val spark = scored.sparkSession
    val hist = scored.select(col(idCol).as("doc_id"), col("p20"))
      .join(labels.select(col(idCol).as("doc_id"),
        col(labelCol).cast("long").as("y")), Seq("doc_id"))
      .groupBy(col("p20"), col("y")).agg(count(lit(1)).as("c"))
    val thr = spark.range(1, nThresholds + 1L)
      .select(expr(s"id * ${Fp20}L div ${nThresholds + 1}").as("thr20"))
    hist.crossJoin(broadcast(thr))
      .groupBy(col("thr20"))
      .agg(
        sum(when(col("p20") >= col("thr20") && col("y") === 1L,
          col("c")).otherwise(0L)).as("tp"),
        sum(when(col("p20") >= col("thr20") && col("y") === 0L,
          col("c")).otherwise(0L)).as("fp"),
        sum(when(col("p20") < col("thr20") && col("y") === 1L,
          col("c")).otherwise(0L)).as("fn"),
        sum(when(col("p20") < col("thr20") && col("y") === 0L,
          col("c")).otherwise(0L)).as("tn"))
      .select(col("thr20"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0L" +
          " ELSE tp * 1000000L div (tp + fp) END").as("precision_ppm"),
        expr("CASE WHEN tp + fn = 0 THEN 0L" +
          " ELSE tp * 1000000L div (tp + fn) END").as("recall_ppm"),
        expr("CASE WHEN tp + fp + fn + tn = 0 THEN 0L ELSE" +
          " (tp + fp) * 1000000L div (tp + fp + fn + tn) END")
          .as("keep_ppm"))
      .withColumn("f1_ppm",
        expr("CASE WHEN precision_ppm + recall_ppm = 0 THEN 0L ELSE" +
          " 2 * precision_ppm * recall_ppm" +
          " div (precision_ppm + recall_ppm) END"))
      .select(col("thr20"), col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"),
        col("keep_ppm"))
      .orderBy(col("thr20"))
  }
}
