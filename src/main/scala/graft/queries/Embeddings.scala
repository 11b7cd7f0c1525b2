package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.EmbeddingFunctions._

/** Similarity search over the `embeddings` table (Array[Float], 64-dim)
  * — ANN baseline + LSH scale path (SURVEY.md §7.2 step 7).
  *
  * Scale design (100 TB): vectors are L2-normalized ONCE per row (so a
  * pairwise cosine is a single dot-product fold, not three), and cached;
  * q30 brute-force broadcasts the small query set against the corpus
  * with per-partition top-k; q31's candidate generation is an LSH band
  * bucket-join (no all-pairs shuffle) followed by exact verification.
  * All arithmetic is a fixed-order left fold on doubles — bit-identical
  * to the DuckDB oracle and invariant under repartitioning.
  */
object Embeddings {

  private val Bits = 16
  private val Dim = 64
  private val Bands = 4
  private val Rows = 4
  private val planes: Seq[Seq[Double]] = hyperplanes(Bits, Dim)

  /** vec_id + raw double vector + its L2 norm. Cosines are computed as
    * dot(a,b)/(‖a‖·‖b‖) rather than normalizing each vector up front:
    * per-element normalization needs a lambda `transform` (interpreted,
    * outside codegen), while dot and norm are the native codegen
    * [[DotProductExpr]] — so this keeps the whole plan codegen'd at the
    * cost of one extra double multiply+divide per pair. The oracle
    * computes the identical formula, so doubles stay bit-identical.
    * Repartition first: the testdata parquet is one row group, and the
    * per-row folds must spread across the full parallelism — the same
    * shape that matters on a cluster with few large input files. */
  private def normalized(s: SparkSession, dir: String): DataFrame =
    graft.ops.Embed.normalize(
      Graft.parquetSource(s, dir).table("embeddings"))

  /** (q_id, vec_id, cos) → top-k per q_id via the mergeable TopK
    * Aggregator: each task keeps a k-row buffer and only those k rows
    * shuffle per (q_id, task) — vs `row_number() OVER (PARTITION BY
    * q_id)`, which shuffles EVERY scored corpus row into |queries|
    * partitions and sorts the whole corpus inside a handful of straggler
    * tasks. With 5 query vectors at 100× corpus scale the window shape is
    * 5 tasks sorting everything; this shape is a partial-agg whose shuffle
    * volume is k·|tasks| rows, independent of corpus size. */
  private[graft] def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopK.TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        graft.functions.TopK.Scored]())
    scored.groupBy(col("q_id"))
      .agg(topk(col("cos"), col("vec_id"), lit(0L), lit(0L), lit(0L))
        .as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("q_id"), col("r.k1").as("vec_id"),
        col("r.score").as("cos"), (col("i") + 1).as("rank"))
      .orderBy("q_id", "rank")
  }

  /** The int8 quantization pipeline shared by q82/q90/q110 and
    * [[graft.ops.Embed.rerankTopK]] — the grid definition lives in ONE
    * place: per-vector symmetric max-abs scale via the codegen
    * [[graft.functions.MaxAbsExpr]]/[[graft.functions.QuantizeExpr]],
    * zero vectors dropped (no quantization scale), quantized L2 norm
    * attached. Input needs (vec_id, v) plus `extra` passthrough
    * columns; output (vec_id, <extra...>, qv, qn). */
  private[graft] def quantizedOf(e: DataFrame,
      extra: Seq[String] = Nil): DataFrame = {
    val ex = extra.map(col)
    e.select(col("vec_id") +: ex :+ col("v") :+
        maxAbsNative(col("v")).as("mx"): _*)
      .where(col("mx") > 0) // zero vectors have no quantization scale
      .select(col("vec_id") +: ex :+
        quantizeNative(col("v"), col("mx")).as("qv"): _*)
      .select(col("vec_id") +: ex :+ col("qv") :+
        sqrt(dotNative(col("qv"), col("qv"))).as("qn"): _*)
  }

  /** Session-level memo of [[computeAnnPairs]] results, keyed by
    * (session, dir). Same producer/consumer convention as
    * [[TextPipeline]]'s pair memo: q31 (the DETECTOR) always recomputes
    * and refreshes the entry — its benchmarked cost is the real
    * pipeline — while q60 (the dedup CONSUMER) reuses the session's last
    * computation, so detect-then-dedup sessions pay the LSH pipeline
    * once. Entries are localCheckpoint-materialized with no cached
    * catalog tables left behind. */
  /** Session memo of the q169 PCA component frame — metadata grain
    * ((k+1)·|dims| rows); q169 the DETECTOR refreshes, q170 the
    * projection CONSUMER reuses (the pairMemo discipline). */
  private val pcaMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def clearPcaMemo(): Unit = pcaMemo.clear()

  private[graft] def pcaMemoSize: Int = pcaMemo.size()

  private def pcaCompsOf(s: SparkSession, dir: String,
      refresh: Boolean): DataFrame = {
    val key = (s, dir)
    def compute = graft.ops.Embed.pca(
      Graft.parquetSource(s, dir).table("embeddings"), 2, 6)
    if (refresh) { val f = compute; pcaMemo.put(key, f); f }
    else pcaMemo.computeIfAbsent(key, _ => compute)
  }

  private val annMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def clearAnnMemo(): Unit = annMemo.clear()

  private[graft] def annMemoSize: Int = annMemo.size

  /** Physical plan of q46's last cell-assignment aggregate, captured for
    * plan-quality tests (the assignment runs eagerly inside the
    * localCheckpoint, so it no longer appears in q46's returned plan). */
  @volatile private[graft] var lastCellPlan: String = ""

  /** Physical plan of q78's last index-probe join, captured for the
    * plan test that proves the cell-partitioned artifact scan is
    * partition-pruned to the probed cells. */
  @volatile private[graft] var lastIncrementalAnnPlan: String = ""

  /** Physical plan of q80's last centroid-update aggregate, captured for
    * the plan test that proves the (cid, i) sum combines map-side. */
  @volatile private[graft] var lastKmUpdatePlan: String = ""

  /** Physical plan of q80's last init hash-sample, captured for the plan
    * test that proves seeding is a per-task top-k merge, not a global
    * sort. */
  @volatile private[graft] var lastKmInitPlan: String = ""

  /** Physical plan of q80's last (final) assignment pass — the argmax
    * runs eagerly inside the localCheckpoint, so it is asserted on this
    * capture, not on q80's returned plan. */
  @volatile private[graft] var lastKmAssignPlan: String = ""

  /** Physical plan of q86's last batch assignment, captured for the
    * plan test that proves the batch assigns against the persisted
    * centroid artifact with no per-batch Lloyd iteration. */
  @volatile private[graft] var lastIncrementalAssignPlan: String = ""

  /** Physical plan of q97's last assignment+occupancy aggregate (it runs
    * eagerly inside the localCheckpoint), captured for the plan test
    * that proves both aggregates combine map-side. */
  @volatile private[graft] var lastIvfBalancePlan: String = ""

  /** Physical plan of q88's last batch-vs-members dedup join, captured
    * for the plan test that proves the batch broadcasts against the
    * cluster-partitioned member artifact (dynamic partition pruning)
    * with no per-batch Lloyd iteration. */
  @volatile private[graft] var lastIncrementalSemPlan: String = ""

  /** Physical plans of q110's last stage-1 quantized probe and stage-2
    * exact fetch, captured for the plan test that proves the stage-1
    * scan touches only the int8 artifact (batch embeddings enter with
    * the cut pushed; the index side never reads raw embeddings) and the
    * exact-vector fetch is candidate-bounded (broadcast semi-join
    * against the exact-payload artifact). */
  @volatile private[graft] var lastIncrementalRerankPlan: String = ""

  // ------------------------------------------------------- k-means (q80)

  /** Defaults for the clustering family — the values the static DuckDB
    * oracles are written against. The confs are the DEPLOYMENT knobs:
    * SemDeDup's scale rule is k ∝ N (constant expected cluster size, so
    * q81's Σ|cluster|² pairwise work stays linear in the corpus), which
    * makes k a per-corpus parameter, never a constant, at 100 TB. A
    * non-default value changes the operator's defined answer — the
    * driver's oracle harness runs at the defaults; KMeansSpec covers the
    * conf-driven variants against the brute-force reimplementation. */
  private[queries] val KmKDefault = 8
  private[queries] val KmItersDefault = 3
  private val SemTauDefault = 0.45

  private val RerankCDefault = 20

  /** q117 PQ defaults: 4 subspaces × 16 centroids over Dim=64 — the
    * oracle unrolls exactly these (conf knobs graft.pq.m/ksub exist for
    * deployments; changing them parts ways with the oracle, like kmK). */
  private[graft] val PqMDefault = 4
  private[graft] val PqKsubDefault = 16
  private val OodTauDefault = 0.12

  private[graft] def kmK(s: SparkSession): Int =
    s.conf.get("graft.kmeans.k", KmKDefault.toString).toInt
  private[graft] def kmIters(s: SparkSession): Int =
    s.conf.get("graft.kmeans.iters", KmItersDefault.toString).toInt
  private[graft] def semTau(s: SparkSession): Double =
    s.conf.get("graft.semdedup.tau", SemTauDefault.toString).toDouble
  private[graft] def rerankC(s: SparkSession): Int =
    s.conf.get("graft.ann.rerankCandidates", RerankCDefault.toString).toInt
  private[graft] def oodTau(s: SparkSession): Double =
    s.conf.get("graft.ood.tau", OodTauDefault.toString).toDouble

  /** Fixed-point scale (2^20) for centroid accumulation. Multiplying a
    * double by a power of two is EXACT in binary floating point (no
    * rounding step), and `floor` of a double is exact — so
    * `floor(x * 2^20)` is a deterministic integer in every engine, and
    * summing those integers is order-independent. This is what makes a
    * DISTRIBUTED k-means bit-stable: the naive centroid mean sums doubles
    * in partition order (nondeterministic under re-planning); the
    * fixed-point sum is an exact bigint reduction, and the final
    * `(sum / n) / 2^20` division is a fixed two-op IEEE sequence. The
    * 2^-20 centroid quantization (~1e-6) is far below the data's own
    * noise floor and is part of the operator's defined semantics —
    * mirrored exactly by the DuckDB oracle. */
  private val FpScale = 1048576.0d

  /** Nearest-centroid score: argmin ‖v−c‖² = argmax (v·c − ‖c‖²/2); the
    * dot form skips the per-pair ‖v‖² term (constant within a vector's
    * argmax) so assignment is one codegen dot per (vector, centroid). */
  private def kmScore(v: org.apache.spark.sql.Column,
      cv: org.apache.spark.sql.Column,
      cn: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dotNative(v, cv) - (lit(0.5d) * (cn * cn))

  /** One Lloyd assignment pass: corpus × broadcast(k centroids), then a
    * map-side-combinable max_by argmax (ties → lowest cid; the (score,
    * −cid) key is unique per group, so the argmax is deterministic and
    * identical to the oracle's `ORDER BY score DESC, cid`). */
  private[graft] def kmAssign(e: DataFrame, cents: DataFrame): DataFrame =
    e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        kmScore(col("v"), col("cv"), col("cn")).as("score"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("v"), col("nrm"), col("cid"), col("score")),
        struct(col("score"), (-col("cid")).as("nc"))).as("r"))
      .select(col("vec_id"), col("r.v").as("v"), col("r.nrm").as("nrm"),
        col("r.cid").as("cid"), col("r.score").as("score"))

  /** One Lloyd update pass: posexplode to (cid, i, x), exact fixed-point
    * sums on k·dim keys (map-side combine reduces every task to ≤ k·dim
    * rows before the shuffle — shuffle volume is independent of corpus
    * size), then rebuild each centroid array in component order. An
    * empty cluster simply drops out of the centroid table (deterministic;
    * the oracle's GROUP BY does the same). */
  private def kmUpdate(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(sum(floor(col("x") * lit(FpScale)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("i").as("i"),
        ((col("s").cast("double") / col("n").cast("double")) / lit(FpScale))
          .as("c")))).as("ps"))
      .select(col("cid"), transform(col("ps"), p => p.getField("c")).as("cv"))
      .select(col("cid"), col("cv"),
        sqrt(dotNative(col("cv"), col("cv"))).as("cn"))

  /** [[kmAssign]] without the vector payload: only (vec_id, cid, score)
    * cross the argmax shuffle — the per-batch hot-path shape for q86,
    * which discards v/nrm (q80's loop keeps [[kmAssign]] because the
    * update step consumes v downstream). */
  private[graft] def kmAssignSlim(e: DataFrame, cents: DataFrame): DataFrame =
    e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cid"),
        kmScore(col("v"), col("cv"), col("cn")).as("score"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("score")),
        struct(col("score"), (-col("cid")).as("nc"))).as("r"))
      .select(col("vec_id"), col("r.cid").as("cid"),
        col("r.score").as("score"))

  /** Session memo of the final k-means frame (vec_id, cluster, score, v,
    * nrm), keyed by (session, dir, k, iters) — the inputs that determine
    * the clustering, so a conf change can never serve a memo entry
    * computed under the old parameters. q80 (the CLUSTERING) always
    * recomputes and refreshes; q81/q85 (the CONSUMERS) reuse the
    * session's last run, same convention as [[annMemo]]. */
  private val kmMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int, Int), DataFrame]()

  private def kmMemoKey(s: SparkSession, dir: String) =
    (s, dir, kmK(s), kmIters(s))

  private[graft] def clearKmMemo(): Unit = kmMemo.clear()

  private[graft] def kmMemoSize: Int = kmMemo.size

  /** The labeled, cluster-capped pair scaffold shared by the
    * contrastive-mining pair (q96, q99): session k-means join labels,
    * capBuckets on the cluster key (`graft.semdedup.maxCluster`), and
    * the b-aliased mate projection. ONE definition — KMeansSpec pins
    * q99's negative side bit-identical to q96, and that equality must
    * hold by construction, not by parallel edits. Returns
    * (km, labels, capped, mates). */
  private def labeledClusterPairFrames(s: SparkSession, dir: String,
      what: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val km = kmMemo.computeIfAbsent(kmMemoKey(s, dir),
      _ => computeKmeans(s, dir))
    val labels = Graft.parquetSource(s, dir).table("embeddings")
      .select(col("vec_id"), col("label"))
    val m = km.select(col("vec_id"), col("cluster"), col("v"),
        col("nrm"))
      .join(labels, Seq("vec_id"))
    val capped = TextPipeline.capBuckets(m, Seq("cluster"), s,
      what, "graft.semdedup.maxCluster")
    val b = capped.select(col("vec_id").as("b_id"), col("cluster"),
      col("label").as("b_label"), col("v").as("bv"),
      col("nrm").as("bn"))
    (km, labels, capped, b)
  }

  /** `iters` Lloyd rounds over `e` → the final k-row centroid table
    * (cid, cv, cn). Shared by q80 (in-session clustering, which captures
    * the update plan for PlanQualitySpec) and q86 (the centroid ARTIFACT
    * build over the old corpus — `capture = false` so the artifact build
    * can't clobber q80's pinned capture). */
  private[graft] def kmeansCentroids(e: DataFrame, k: Int, iters: Int,
      capture: Boolean = true): DataFrame = {
    // Deterministic hash-sampled init: the k rows with the smallest
    // (hash60(vec_id) mod 2^31−1, vec_id) rank — a uniform, seedless
    // sample of the whole corpus (the q40/q85 content-hash discipline,
    // bit-identical in the oracle). The k-lowest-ids init this replaces
    // is a locality trap at 100 TB: the lowest ids all live in the
    // oldest crawl shard, so every seed came from one slice of the
    // distribution. orderBy+limit plans as TakeOrderedAndProject — each
    // task keeps its own k best rows and one merge of |tasks|·k rows
    // follows; never a global sort, never a window.
    val initLazy = e
      .orderBy((graft.functions.TextFunctions.hash60(
          col("vec_id").cast("string")) % lit(2147483647L)).asc,
        col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    if (capture)
      lastKmInitPlan = initLazy.queryExecution.executedPlan.toString
    var cents = initLazy.localCheckpoint()
    (1 to iters).foreach { _ =>
      val upd = kmUpdate(kmAssign(e, cents))
      if (capture)
        lastKmUpdatePlan = upd.queryExecution.executedPlan.toString
      cents = upd.localCheckpoint()
    }
    cents
  }

  /** Deterministic distributed Lloyd's: init = a seedless uniform
    * hash-sample of k vectors (see [[kmeansCentroids]]), then
    * `iters` × (assign → fixed-point update). Every per-iteration
    * frame is either k rows (centroids, localCheckpoint-materialized so
    * iteration N+1's plan doesn't re-derive N) or corpus-growth
    * (checkpoint class, never `.cache()`). */
  private def computeKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = normalized(s, dir).localCheckpoint()
    val cents = kmeansCentroids(e, kmK(s), kmIters(s))
    val fin = kmAssign(e, cents)
      .select(col("vec_id"), col("cid").as("cluster"), col("score"),
        col("v"), col("nrm"))
    lastKmAssignPlan = fin.queryExecution.executedPlan.toString
    fin.localCheckpoint()
  }

  /** Hyperplane-LSH near-duplicate pairs (v1, v2, cos ≥ 0.45): band
    * bucket-join candidates over 16 sign bits, exact cosine verification.
    * Runs EAGERLY — the returned frame and both reused intermediates are
    * localCheckpoint-materialized (checkpoint blocks free on GC), so no
    * cached tables are left behind. */
  private def computeAnnPairs(s: SparkSession, dir: String): DataFrame = {
    val e = normalized(s, dir)
      .localCheckpoint() // one row per corpus vector (payload included)
      // — corpus-growth, so checkpoint, never cache; read by the band
      // derivation and both verify sides
    // sign(dot(v/‖v‖, p)) = sign(dot(v, p)) since ‖v‖ > 0 — the raw
    // dot skips normalization entirely (oracle computes the same)
    val bits: Seq[org.apache.spark.sql.Column] = planes.map { p =>
      when(dotNative(col("v"), typedLit(p)) > 0, 1L).otherwise(0L)
    }
    val bandKeys = array((0 until Bands).map { b =>
      (0 until Rows).map(r => bits(b * Rows + r) * (1L << r))
        .reduce(_ + _)
    }: _*)
    val keyed = e.select(col("vec_id"),
      posexplode(bandKeys).as(Seq("band_idx", "band_key")))
      .localCheckpoint() // 16 hyperplane folds per row, computed once
      // for both self-join sides; 4 narrow rows per corpus vector —
      // the checkpoint class, not the cache class
    val a = keyed.as("a"); val b = keyed.as("b")
    val cand = a.join(b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    val e1 = e.select(col("vec_id").as("v1"), col("v").as("x1"),
      col("nrm").as("nr1"))
    val e2 = e.select(col("vec_id").as("v2"), col("v").as("x2"),
      col("nrm").as("nr2"))
    val pairs = cand.join(e1, "v1").join(e2, "v2")
      .select(col("v1"), col("v2"),
        (dotNative(col("x1"), col("x2")) / (col("nr1") * col("nr2")))
          .as("cos"))
      .where(col("cos") >= 0.45)
      .localCheckpoint()
    pairs
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q30: brute-force cosine top-10 for query vectors vec_id < 5 ---
    // Thin binding over the public op ([[graft.ops.Embed.cosineTopK]]).
    "q30_cosine_topk" -> ((s, dir) => {
      val t = Graft.parquetSource(s, dir).table("embeddings")
      graft.ops.Embed.cosineTopK(t, t.where(col("vec_id") < 5),
        k = 10, excludeSelf = true)
    }),

    // ---- q31: hyperplane-LSH near-duplicate pairs, cosine ≥ 0.45 -------
    "q31_ann_lsh" -> ((s, dir) => {
      val pairs = computeAnnPairs(s, dir)
      annMemo.put((s, dir), pairs)
      pairs.orderBy("v1", "v2")
    }),

    // ---- q60: embedding-cosine near-dup dedup — clusters + keep list ---
    // The embedding-space member of the dedup family (next to exact q26,
    // MinHash q27, SimHash q28, n-gram q29): connected components over
    // the verified cosine-≥0.45 pair graph, keep_id = each component's
    // minimum vec_id. Pairs come from the session memo when q31 already
    // derived them; clustering is the shared
    // [[graft.plans.Components]] loop (pointer doubling, O(log d)
    // rounds). Oracle: recursive-CTE transitive closure over the same
    // pair SQL — an independent formulation of the same components.
    "q60_embedding_dedup" -> ((s, dir) => {
      val pairs = annMemo.computeIfAbsent((s, dir),
        _ => computeAnnPairs(s, dir))
      graft.plans.Components.keepList(pairs.select(col("v1"), col("v2")))
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),

    // ---- q46: IVF-style ANN — cell-partitioned search ------------------
    // Coarse quantizer: 16 deterministic centroids (vec_id < 16); every
    // vector is assigned to its nearest centroid cell; a query probes only
    // its 2 nearest cells. At 100 TB, `cell` becomes the table's physical
    // partition key, so a query reads 2/16ths of the corpus — the IVF
    // scale path next to q31's LSH (both approximate, both verified by an
    // oracle that replicates the exact same search).
    "q46_ivf_ann" -> ((s, dir) => {
      val e = normalized(s, dir)
      val cents = e.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
      // Nearest-centroid assignment (argmax cosine, tie on lowest cid) as
      // a map-side-combinable max_by aggregate: each task reduces its 16
      // candidate rows per vector to 1 BEFORE the shuffle — vs the
      // row_number window, which shuffled and sorted all |corpus|×16 rows.
      // The ordering key (sim, -cid) is unique per group (cids differ), so
      // the argmax is deterministic and identical to the oracle's
      // `ORDER BY sim DESC, cid` ranking.
      val cellsLazy = e.join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
          (dotNative(col("v"), col("cv")) / (col("nrm") * col("cn")))
            .as("sim"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("v"), col("nrm"), col("cid")),
          struct(col("sim"), (-col("cid")).as("nc"))).as("r"))
        .select(col("vec_id"), col("r.v").as("v"), col("r.nrm").as("nrm"),
          col("r.cid").as("cell"))
      lastCellPlan = cellsLazy.queryExecution.executedPlan.toString
      val cells = cellsLazy
        .localCheckpoint() // feeds q/probes/scored — materialized, but
        // via checkpoint, never `.cache()`: one row per CORPUS vector
        // (with the vector payload), the corpus-growth storage class
        // SCALE.md forbids caching. At the 100 TB design point this
        // frame is instead the physically cell-partitioned table itself.
      // queries probe their 2 nearest cells (5×16 rows — trivial window)
      val q = cells.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(col("qsim").desc, col("cid"))
      val probes = q.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("qv"), col("qn"), col("cid"),
          (dotNative(col("qv"), col("cv")) / (col("qn") * col("cn")))
            .as("qsim"))
        .withColumn("rnk", row_number().over(wProbe))
        .where(col("rnk") <= 2)
        .select(col("q_id"), col("qv"), col("qn"), col("cid").as("cell"))
      // search only the probed cells; mergeable top-k, no corpus-wide sort
      val scored = probes.join(cells, "cell")
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("nrm")))
            .as("cos"))
      topkPerQuery(scored, 5)
    }),

    // ---- q78: incremental ANN — batch searches a persisted IVF index ---
    // The embedding-side member of the incremental family (q67 dedup,
    // q69 LM, q72 novelty): a production vector store does NOT rebuild
    // its index per crawl batch — the old corpus's IVF index (vector,
    // norm, nearest-centroid cell) persists as a parquet side-table
    // PARTITIONED BY CELL ([[graft.sources.SideTable]] with
    // partitionBy), and each new batch vector searches it for its top-5
    // old neighbors: assign the batch to its 2 nearest cells against
    // the PERSISTED centroids (read from the artifact — vec_id < 16
    // rows carry their own vectors), then score only the probed cells.
    // The cell is a real DIRECTORY partition, so the probe join prunes
    // the index scan to the probed cells' files (Spark's dynamic
    // partition pruning — the 2/16ths-of-the-corpus read q46's comment
    // promises, made physical). Only the batch touches the embeddings
    // table (cut pushed to the scan, plan-pinned). Two probe-join modes,
    // `graft.ann.broadcastProbes` (both plan-pinned, both the same
    // pruned scan): true (default) broadcasts the probe set — right
    // while probes fit a broadcast; false shuffles probes by cell with a
    // static isin partition prune — the 100 TB shape once the batch
    // outgrows broadcasting.
    "q78_incremental_ann" -> ((s, dir) => {
      val cut = BatchCut.cut(s,
        Graft.parquetSource(s, dir).table("embeddings"), "vec_id")
      val idxPath = graft.sources.SideTable.ensure(s, "ivf_index",
          s"$dir#$cut", Some(s"$dir/embeddings.parquet"), Seq("cell")) {
        val old = normalized(s, dir).where(col("vec_id") < cut)
        val cents = old.where(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("v").as("cv"),
            col("nrm").as("cn"))
        old.join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
            (dotNative(col("v"), col("cv")) / (col("nrm") * col("cn")))
              .as("sim"))
          .groupBy(col("vec_id"))
          .agg(max_by(struct(col("v"), col("nrm"), col("cid")),
            struct(col("sim"), (-col("cid")).as("nc"))).as("r"))
          .select(col("vec_id"), col("r.v").as("v"),
            col("r.nrm").as("nrm"), col("r.cid").cast("int").as("cell"))
      }
      val idx = s.read.parquet(idxPath)
      val cents = idx.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
        .localCheckpoint() // 16 rows; read by the probe ranking
      val batch = normalized(s, dir).where(col("vec_id") >= cut)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(col("qsim").desc, col("cid"))
      val probes = batch.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("qv"), col("qn"), col("cid"),
          (dotNative(col("qv"), col("cv")) / (col("qn") * col("cn")))
            .as("qsim"))
        .withColumn("rnk", row_number().over(wProbe))
        .where(col("rnk") <= 2)
        .select(col("q_id"), col("qv"), col("qn"),
          col("cid").cast("int").as("cell"))
      val scoredLazy =
        if (s.conf.get("graft.ann.broadcastProbes", "true").toBoolean)
          idx.join(broadcast(probes), "cell")
            .select(col("q_id"), col("vec_id"),
              (dotNative(col("qv"), col("v")) / (col("qn") * col("nrm")))
                .as("cos"))
        else {
          // 100 TB mode: probes SHUFFLE by cell instead of broadcasting —
          // a batch-proportional probe set outgrows a broadcast long
          // before the index does. The probed-CELL list stays bounded by
          // the quantizer codebook (nlist: 16 here, thousands in a
          // deployment), so collecting it is a metadata-grain probe (the
          // capBuckets class), and the isin predicate prunes the
          // cell-partitioned artifact scan STATICALLY — the same
          // pruned-directories read as the broadcast mode's dynamic
          // pruning, minus the broadcast. The checkpoint keeps the probe
          // derivation out of both join inputs (cells collect + join
          // would otherwise derive it twice).
          val p = probes.localCheckpoint()
          val cells = p.select(col("cell")).distinct()
            .collect().map(_.getInt(0)).sorted
          idx.where(col("cell").isin(cells.toIndexedSeq: _*))
            .join(p.hint("shuffle_hash"), Seq("cell"))
            .select(col("q_id"), col("vec_id"),
              (dotNative(col("qv"), col("v")) / (col("qn") * col("nrm")))
                .as("cos"))
        }
      lastIncrementalAnnPlan =
        scoredLazy.queryExecution.executedPlan.toString
      topkPerQuery(scoredLazy, 5)
    }),

    // ---- q70: ANN recall audit — IVF vs exact ground truth -------------
    // "Measure, don't guess" as an operator: recall@5 of the q46 IVF
    // search against the q30 exact brute-force ranking, per query
    // vector. Production ANN deployments run exactly this audit on a
    // sampled query set after every index (re)build — the knob that
    // justifies nprobe/cell-count choices with a number instead of a
    // hunch. Composes the two existing pipelines (both mergeable-top-k,
    // no new corpus-scale work: the audit's own joins touch ≤ k rows
    // per query); the recall denominator is the fixed k, so a query
    // whose probed cells miss everything still reports (as 0), via the
    // left join against the exact side's query set.
    // ---- q188: LSH-bucketed ANN (random hyperplanes, multi-probe) ------
    // [[graft.ops.Embed.lshTopK]]: 8 sign bits of the deterministic
    // JL projections as the bucket, exact bucket + Hamming-1 probes,
    // exact cosine re-rank. The training-free member of the ANN
    // family (vs IVF/PQ): the bucket function is corpus-independent,
    // so appends never drift the index.
    "q188_lsh_ann" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      graft.ops.Embed.lshTopK(emb, emb.where(col("vec_id") < 5),
          k = 10, bits = 8, excludeSelf = true)
        .orderBy("q_id", "rank")
    }),

    // ---- q189: LSH recall audit vs exact ground truth ------------------
    // The q70 discipline on the LSH member: recall@5 of q188 against
    // the q30 exact ranking, per query. On the near-isotropic
    // synthetic embeddings it honestly reports MODEST recall
    // (0.0–0.6 at sf0.01): a single 8-bit table at probe radius 1 is
    // the cheap training-free rung, and random-hyperplane buckets
    // only concentrate genuinely clustered corpora — the audit IS the
    // knob that tells a deployment to widen probes, add tables, or
    // step up to IVF/PQ (the q70/q121/q124-audited members). q201
    // sweeps those knobs: (tables=8, radius=1) reaches 0.80 recall@5
    // at ~26% candidates on this corpus, (8, 2) reaches 1.00.
    "q189_lsh_recall" -> ((s, dir) => {
      val exact = defs("q30_cosine_topk")(s, dir)
        .where(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ 5 rows per query; read by hits AND qids
      val approx = defs("q188_lsh_ann")(s, dir)
        .select(col("q_id"), col("vec_id"))
      // approx is k-per-query and hits one-per-query; the checkpointed
      // inputs carry no size stats, so hint both joins broadcast
      // (guide §3.1 — else each is a SortMergeJoin + 2 exchanges)
      val hits = exact.join(broadcast(approx), Seq("q_id", "vec_id"),
          "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      exact.select(col("q_id")).distinct()
        .join(broadcast(hits), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
            .as("recall"))
        .orderBy("q_id")
    }),

    // ---- q201: LSH recall/cost sweep over (tables, radius) -------------
    // The r15 verdict's ask made a query: q189 honestly reported
    // 0.0–0.6 recall@5 for the single-table radius-1 rung, so this
    // sweep runs [[graft.ops.Embed.lshCandidatePairs]] over the
    // (tables ∈ 1,2,4,8) × (radius ∈ 1,2) grid at 8 bits and reports,
    // PER CELL PER QUERY, the candidate count (the cost column that
    // proves the search stays bucketed) and recall@5 vs the exact
    // ground truth — the table a deployment picks its operating point
    // from. Because the re-rank is exact cosine, candidate-set
    // recall@5 IS the re-ranked top-k recall@5 for any k ≥ 9 (a
    // global top-5 member can be outranked only by the other four).
    // On these near-isotropic synthetic embeddings the measured knee
    // is (tables=8, radius=1): recall 0.80 at ~26% candidates;
    // (8, 2) reaches 1.00 at ~69% — the audit shows BOTH numbers, so
    // the cost of the last 0.2 of recall is a printed fact. Scale:
    // each cell is one bucketed candidate join (broadcast probes) at
    // candidate grain — never all-pairs; the sweep's own joins touch
    // ≤ 5 rows per query per cell on the ground-truth side.
    "q201_lsh_recall_sweep" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val exact = defs("q30_cosine_topk")(s, dir)
        .where(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ 5 rows/query; read by hits AND the spine
      val qids = exact.select(col("q_id")).distinct()
        .localCheckpoint() // ≤ |queries| rows; spine of every cell
      // index ONCE at the widest cell: table t of the maxTables index
      // IS table t of every narrower cell (the lshBuckets slicing
      // construction), so the 8-cell sweep pays one projection pass
      val maxT = LshSweepGrid.map(_._1).max
      val cb = graft.ops.Embed.lshBuckets(emb, LshSweepBits, maxT,
          "vec_id", "embedding")
        .select(col("vec_id").cast("long").as("vec_id"), col("t"),
          col("bucket"))
        .localCheckpoint() // maxT rows per vector; read by all 8 cells
      val qb = cb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("t"), col("bucket"))
        .localCheckpoint() // tiny; probe side of all 8 cells
      LshSweepGrid.map { case (l, r) =>
        val cand = graft.ops.Embed.lshCandidatePairsFrom(cb, qb,
            bits = LshSweepBits, tables = l, radius = r,
            excludeSelf = true)
          .localCheckpoint() // read by the count AND the hit join
        // per-query aggregates over checkpointed (stats-free) inputs:
        // broadcast explicitly or every cell pays 3 SortMergeJoins
        // (24 across the sweep — guide §3.1)
        val nc = cand.groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_cand"))
        // hit count = |exact ∩ cand| per query; both sides are sets on
        // (q_id, vec_id) (exact = top-5 ranks, cand = distinct pairs by
        // the lshCandidatePairsFrom construction), so the semi-join
        // counts the same intersection from either side — probe from
        // cand so the BROADCAST side is the k-bounded exact frame
        // (≤ 5 rows/query), never the collision-bounded candidate set
        // (whose size is the very quantity n_cand measures, and which a
        // wide-radius cell could grow past broadcast limits at 100 TB)
        val nh = cand.join(broadcast(exact), Seq("q_id", "vec_id"),
            "left_semi")
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
        qids
          .join(broadcast(nc), Seq("q_id"), "left")
          .join(broadcast(nh), Seq("q_id"), "left")
          .select(lit(l).as("tables"), lit(r).as("radius"), col("q_id"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
              .as("recall"))
      }.reduce(_.unionByName(_)).orderBy("tables", "radius", "q_id")
    }),

    // ---- q203: incremental LSH — the zero-drift index append -----------
    // The ANN family's last crawl-loop square, and the one where the
    // incremental claim is STRUCTURAL rather than proven-by-merge: the
    // LSH bucket is a pure function of the vector (hash-derived signs,
    // no training), so the persisted snapshot index plus a per-batch
    // bucket delta IS the from-scratch index bit-for-bit — no router
    // drift (q123's concern), no codebook retrain, no re-read of old
    // vectors. Artifacts: the old-corpus (vec_id, t, bucket) frame and
    // the batch delta, both through SideTable (manifest-keyed,
    // cross-session); search = [[graft.ops.Embed.lshTopKFrom]] over
    // their union at (bits=8, tables=2, radius=1), queries = the
    // batch's first five arrivals, k=10. The oracle replays the
    // FULL-corpus LSH from scratch — equality proves the append
    // path end-to-end.
    "q203_incremental_lsh" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val fp = Some(s"$dir/embeddings.parquet")
      def bucketsOf(src: org.apache.spark.sql.DataFrame) =
        graft.ops.Embed.lshBuckets(src, LshSweepBits, 2,
            "vec_id", "embedding")
          .select(col("vec_id").cast("long").as("vec_id"), col("t"),
            col("bucket"))
      val oldP = graft.sources.SideTable.ensure(s, "lsh_index",
        s"$dir#$cut#b${LshSweepBits}t2", fp) {
        bucketsOf(emb.where(col("vec_id") < cut))
      }
      val deltaP = graft.sources.SideTable.ensure(s, "lsh_index_delta",
        s"$dir#$cut#b${LshSweepBits}t2", fp) {
        bucketsOf(emb.where(col("vec_id") >= cut))
      }
      val cb = s.read.parquet(oldP).unionByName(s.read.parquet(deltaP))
      val queries = emb.where(col("vec_id") >= cut &&
        col("vec_id") < cut + 5)
      val qb = cb.where(col("vec_id") >= cut && col("vec_id") < cut + 5)
        .select(col("vec_id").as("q_id"), col("t"), col("bucket"))
      graft.ops.Embed.lshTopKFrom(cb, qb, emb, queries, k = 10,
          bits = LshSweepBits, tables = 2, radius = 1,
          excludeSelf = true)
        .orderBy("q_id", "rank")
    }),

    "q70_ann_recall" -> ((s, dir) => {
      val exact = defs("q30_cosine_topk")(s, dir)
        .where(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ 5 rows per query; read by hits AND qids
      val approx = defs("q46_ivf_ann")(s, dir)
        .select(col("q_id"), col("vec_id"))
      // approx is k-per-query and hits one-per-query; the checkpointed
      // inputs carry no size stats, so hint both joins broadcast
      // (guide §3.1 — else each is a SortMergeJoin + 2 exchanges)
      val hits = exact.join(broadcast(approx), Seq("q_id", "vec_id"),
          "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      exact.select(col("q_id")).distinct()
        .join(broadcast(hits), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
            .as("recall"))
        .orderBy("q_id")
    }),

    // ---- q80: deterministic distributed k-means (Lloyd's) --------------
    // The clustering member of the embedding family: k and the
    // iteration count are confs (`graft.kmeans.k` / `graft.kmeans
    // .iters`, folded into the memo and artifact identities),
    // deterministic hash-sample init (the hash60-ranked top-k — see
    // [[kmeansCentroids]]), FIXED-POINT centroid accumulation (see
    // [[FpScale]]) so the result is bit-stable under any partitioning —
    // the property that makes a distributed k-means oracle-checkable at
    // all. Per iteration: one broadcast of k
    // centroids + one shuffle of ≤ k·dim·tasks partial-sum rows; corpus
    // rows never shuffle. At 100 TB this is the standard pre-step for
    // cluster-based curation (SemDeDup, cluster-balanced sampling).
    "q80_kmeans" -> ((s, dir) => {
      val km = computeKmeans(s, dir)
      kmMemo.put(kmMemoKey(s, dir), km)
      km.select(col("vec_id"), col("cluster"), col("score"))
        .orderBy("vec_id")
    }),

    // ---- q81: SemDeDup — within-cluster semantic dedup -----------------
    // Semantic near-dup pruning with the published SemDeDup drop rule:
    // after clustering, a vector is DROPPED if its cluster holds ANY
    // earlier-id vector with cosine ≥ τ — whether or not that neighbor
    // itself survived. On a similarity chain (1~2, 2~3, 1≁3) this
    // drops BOTH 2 and 3: deliberate, matching the reference SemDeDup
    // implementation (one matrix pass, no transitivity bookkeeping);
    // a pipeline that needs every dropped doc to have a KEPT
    // near-duplicate uses q60's connected-components member instead.
    // Pairwise work is bounded PER CLUSTER: the candidate join's
    // equi-key is the cluster id, so complexity is Σ|cluster|²,
    // controlled at scale by growing k with the corpus (k ∝ N keeps
    // expected cluster size constant — the SemDeDup deployment knob,
    // `graft.kmeans.k`). Against the degenerate case that knob can't
    // anticipate — one semantic mega-cluster — the capBuckets guard
    // drops clusters over `graft.semdedup.maxCluster` from pairwise
    // candidate generation LOUDLY (DedupGuard counters + WARN; their
    // members surface as kept, never silently quadratic). Clusters come
    // from the session memo when q80 already ran.
    "q81_semdedup" -> ((s, dir) => {
      val km = kmMemo.computeIfAbsent(kmMemoKey(s, dir),
        _ => computeKmeans(s, dir))
      val capped = TextPipeline.capBuckets(
        km.select(col("vec_id"), col("cluster"), col("v"), col("nrm")),
        Seq("cluster"), s, "q81 semdedup clusters",
        "graft.semdedup.maxCluster")
      val a = capped
      val b = capped.select(col("vec_id").as("b_id"), col("cluster"),
        col("v").as("bv"), col("nrm").as("bn"))
      val dom = a.join(b, Seq("cluster"))
        .where(col("b_id") < col("vec_id") &&
          (dotNative(col("v"), col("bv")) / (col("nrm") * col("bn")))
            >= lit(semTau(s)))
        .groupBy(col("vec_id")).agg(min(col("b_id")).as("dropped_by"))
      km.select(col("vec_id"), col("cluster"))
        .join(dom, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          col("dropped_by").isNull.as("kept"), col("dropped_by"))
        .orderBy("vec_id")
    }),

    // ---- q82: int8 quantization audit — recall + worst-case error ------
    // "Measure, don't guess" for index compression (q70's sibling): each
    // vector is symmetrically quantized to the int8 grid (per-vector
    // max-abs scale; floor(x·s + 0.5) so rounding is an exact floor,
    // identical in every engine), the top-5 search runs ENTIRELY on
    // quantized values, and the audit reports recall@5 against the
    // exact ranking plus the worst |quantized − exact| cosine error
    // among retrieved neighbors (max, not mean — order-free, so
    // deterministic without a sorted fold). Deployment story: the
    // quantized corpus persists as int8 (8× smaller than the double
    // vectors searched here, 4× vs float32), the audit is what justifies switching
    // the fleet to it. Quantization is one pass; the search hot path
    // stays the codegen dot fold.
    "q82_quantized_ann" -> ((s, dir) => {
      val e = normalized(s, dir)
        .localCheckpoint() // read by the quantizer AND the exact-error join
      val qz = quantizedOf(e)
        .localCheckpoint() // quantized index: both search sides
      val qq = qz.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
          col("qn").as("qqn"))
      val qtop = topkPerQuery(
        qz.join(broadcast(qq), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (dotNative(col("qqv"), col("qv")) / (col("qqn") * col("qn")))
              .as("cos")), 5)
        .localCheckpoint() // ≤ 5 rows per query; read by hits AND errs
      val e1 = e.select(col("vec_id").as("q_id"), col("v").as("x1"),
        col("nrm").as("nr1"))
      val e2 = e.select(col("vec_id"), col("v").as("x2"),
        col("nrm").as("nr2"))
      val errs = qtop.join(e1, "q_id").join(e2, "vec_id")
        .select(col("q_id"),
          abs(col("cos") - (dotNative(col("x1"), col("x2"))
            / (col("nr1") * col("nr2")))).as("err"))
        .groupBy(col("q_id")).agg(max(col("err")).as("max_abs_err"))
      // exact ground truth from the SAME checkpointed corpus frame —
      // q30's formula verbatim, but without re-deriving the
      // normalization pass its def would run fresh
      val eq = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val exact = topkPerQuery(
          e.join(broadcast(eq), col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id"),
              (dotNative(col("qv"), col("v")) / (col("qn") * col("nrm")))
                .as("cos")), 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint()
      val hits = exact
        .join(broadcast(qtop.select(col("q_id"), col("vec_id"))),
          Seq("q_id", "vec_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      exact.select(col("q_id")).distinct()
        .join(broadcast(hits), Seq("q_id"), "left")
        .join(broadcast(errs), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
            .as("recall"),
          col("max_abs_err"))
        .orderBy("q_id")
    }),

    // ---- q90: two-stage ANN — quantized candidates, exact re-rank ------
    // The deployment retrieval shape q82's audit justifies: stage 1
    // searches ONLY the int8-quantized index — at 100 TB the sole
    // full-corpus pass, over vectors 8× smaller than the doubles — for
    // `graft.ann.rerankCandidates` (default 20) candidates per query;
    // stage 2 fetches EXACT vectors for the candidates alone (their
    // ≤ C·|queries| ids broadcast against the corpus scan as a
    // semi-join — the corpus never shuffles) and re-ranks by exact
    // cosine to the final top-5. Quantization can still cost recall
    // (bounded by C; q82 measures it) but never ranking error: the
    // output order is exact cosine over the candidate set.
    "q90_rerank_ann" -> ((s, dir) => {
      val e = normalized(s, dir)
        .localCheckpoint() // read by the quantizer AND the re-rank fetch
      val qz = quantizedOf(e)
      val qq = qz.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("qv").as("qqv"),
          col("qn").as("qqn"))
        .localCheckpoint() // tiny; probe side of the stage-1 scan
      val cand = topkPerQuery(
          qz.join(broadcast(qq), col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id"),
              (dotNative(col("qqv"), col("qv")) / (col("qqn") * col("qn")))
                .as("cos")), rerankC(s))
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ C·|q| rows; the fetch probe + re-rank spine
      val fetch = e.join(
        broadcast(cand.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi") // exact payload for candidates ONLY
      val eq = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("ev"),
          col("nrm").as("en"))
      val scored = cand
        .join(fetch, Seq("vec_id"))
        .join(broadcast(eq), Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          (dotNative(col("ev"), col("v")) / (col("en") * col("nrm")))
            .as("cos"))
      topkPerQuery(scored, 5)
    }),

    // ---- q91: batch out-of-distribution audit vs persisted centroids --
    // The ingest drift monitor a crawl pipeline runs BEFORE committing a
    // batch: how well does new content fit the OLD corpus's semantic
    // geometry? Fit = max cosine to any persisted centroid (a cosine
    // notion — the embedding-dedup family's metric — distinct from
    // q86's Euclidean assignment); a batch vector with fit below
    // `graft.ood.tau` (default 0.12) is out-of-distribution. Per
    // centroid: n_batch, n_ood, ood_rate, min_fit — a rising ood_rate,
    // or one cluster's collapsing min_fit, is the rebuild-the-artifact
    // signal q86's per-vector score stream aggregates to at the
    // decision grain. Cost per batch: one k-row broadcast + a map-side
    // argmax over the batch, zero old-corpus reads; the report is
    // ≤ k rows.
    "q91_batch_ood" -> ((s, dir) => {
      val cut = BatchCut.cut(s,
        Graft.parquetSource(s, dir).table("embeddings"), "vec_id")
      val k = kmK(s); val it = kmIters(s)
      val path = graft.sources.SideTable.ensure(s, "km_centroids",
          s"$dir#$cut#k$k-i$it-s${FpScale.toLong}-hinit",
          Some(s"$dir/embeddings.parquet")) {
        kmeansCentroids(
          normalized(s, dir).where(col("vec_id") < cut).localCheckpoint(),
          k, it, capture = false)
      }
      val cents = s.read.parquet(path)
      val fit = normalized(s, dir).where(col("vec_id") >= cut)
        .join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("cid"),
          (dotNative(col("v"), col("cv")) / (col("nrm") * col("cn")))
            .as("cos"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cid"), col("cos")),
          struct(col("cos"), (-col("cid")).as("nc"))).as("r"))
        .select(col("vec_id"), col("r.cid").as("cluster"),
          col("r.cos").as("fit"))
      fit.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_batch"),
          sum(when(col("fit") < lit(oodTau(s)), 1L).otherwise(0L))
            .as("n_ood"),
          min(col("fit")).as("min_fit"))
        .select(col("cluster"), col("n_batch"), col("n_ood"),
          (col("n_ood").cast("double") / col("n_batch").cast("double"))
            .as("ood_rate"),
          col("min_fit"))
        .orderBy("cluster")
    }),

    // ---- q96: within-cluster hard-negative mining ----------------------
    // The contrastive-training data op: for every vector, its HARDEST
    // negative — the highest-cosine neighbor with a DIFFERENT label —
    // restricted to the vector's own k-means cluster. The restriction is
    // the scale design, not a shortcut: a cluster is exactly where the
    // confusable different-label neighbors live (the ones a contrastive
    // loss learns from), and it bounds the pairwise work to Σ|cluster|²
    // under the same capBuckets guard as q81, with k ∝ N keeping the
    // expected cluster size constant. Labels reach the memo'd cluster
    // frame via one narrow co-partitioned join on vec_id; the per-anchor
    // argmax is a map-side max_by (ties → lowest neg_id, mirroring the
    // oracle's ORDER BY cos DESC, vec_id), never a window over the pair
    // set. Anchors whose cluster holds no other label stay in the output
    // with NULLs — a training pipeline must know which anchors lack
    // in-cluster negatives and need a global fallback round.
    "q96_hard_negatives" -> ((s, dir) => {
      val (km, labels, capped, b) =
        labeledClusterPairFrames(s, dir, "q96 hard-negative clusters")
      val neg = capped.join(b, Seq("cluster"))
        .where(col("b_id") =!= col("vec_id") &&
          col("b_label") =!= col("label"))
        .select(col("vec_id"), col("b_id"),
          (dotNative(col("v"), col("bv")) / (col("nrm") * col("bn")))
            .as("cos"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("b_id"), col("cos")),
          struct(col("cos"), (-col("b_id")).as("nb"))).as("r"))
        .select(col("vec_id"), col("r.b_id").as("neg_id"),
          col("r.cos").as("neg_cos"))
      km.select(col("vec_id"), col("cluster"))
        .join(labels, Seq("vec_id"))
        .join(neg, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("label"),
          col("neg_id"), col("neg_cos"))
        .orderBy("vec_id")
    }),

    // ---- q97: IVF cell-balance audit -----------------------------------
    // Index-health op for the q46/q78 IVF family, in the q70/q73/q87
    // audit-the-approximation discipline: per coarse cell, occupancy and
    // load factor. At 100 TB the cell is the table's PHYSICAL partition
    // key, so this histogram IS the file-size layout: a cell at load
    // factor L makes every probe that touches it read L× the ideal
    // partition — the number that says "re-train the codebook (nlist ∝
    // N)" before hot cells turn probes into near-full scans. Empty cells
    // are real rows (n_vecs = 0): a dead centroid wastes a partition
    // slot and a probe candidate. Exact-integer counts; the only doubles
    // are the two final divisions, in a fixed op order mirrored by the
    // oracle.
    "q97_ivf_balance" -> ((s, dir) => {
      val e = normalized(s, dir)
      val cents = e.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
      // q46's exact assignment rule (argmax cosine, ties → lowest cid)
      // as the same map-side-combinable max_by
      val occLazy = e.join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("cid"),
          (dotNative(col("v"), col("cv")) / (col("nrm") * col("cn")))
            .as("sim"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("sim"), (-col("cid")).as("nc")))
          .as("cell"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"))
      lastIvfBalancePlan = occLazy.queryExecution.executedPlan.toString
      val occ = occLazy
        .localCheckpoint() // ≤ nlist rows; read by the total AND the report
      val tot = occ.agg(sum(col("n_vecs")).cast("long").as("total"))
      cents.select(col("cid").as("cell"))
        .join(broadcast(occ), Seq("cell"), "left")
        .crossJoin(broadcast(tot))
        .select(col("cell"),
          coalesce(col("n_vecs"), lit(0L)).as("n_vecs"), col("total"))
        .select(col("cell"), col("n_vecs"),
          (col("n_vecs").cast("double") / col("total").cast("double"))
            .as("frac"),
          ((col("n_vecs").cast("double") / col("total").cast("double"))
            * lit(16.0d)).as("load_factor"))
        .orderBy("cell")
    }),

    // ---- q99: in-cluster triplet mining (anchor, hard pos, hard neg) ---
    // The complete contrastive-training example assembler, one step up
    // from q96: per anchor, BOTH the hardest negative (highest-cosine
    // different-label cluster mate — q96's rule) and the hardest
    // positive (LOWEST-cosine same-label cluster mate: the positive the
    // loss gains most from pulling in). Both argmaxes run in ONE pass
    // over the same capped pair frame — a conditional ordering key per
    // aggregate (NULL key rows are skipped by max_by, so each aggregate
    // sees only its side's pairs) — so the triplet table costs exactly
    // one Σ|cluster|² sweep under the q81 capBuckets guard, not two.
    // NULL pos/neg columns mark anchors whose cluster lacks a same- or
    // different-label mate (the fallback-round signal, as in q96).
    "q99_triplet_mining" -> ((s, dir) => {
      val (km, labels, capped, b) =
        labeledClusterPairFrames(s, dir, "q99 triplet clusters")
      val pairs = capped.join(b, Seq("cluster"))
        .where(col("b_id") =!= col("vec_id"))
        .select(col("vec_id"), col("label"), col("b_id"), col("b_label"),
          (dotNative(col("v"), col("bv")) / (col("nrm") * col("bn")))
            .as("cos"))
      // hard positive: min cos, ties → lowest b_id ⇒ key (−cos, −b_id);
      // hard negative: max cos, ties → lowest b_id ⇒ key (cos, −b_id);
      // a NULL key (wrong-label side) drops the row from that aggregate
      val mined = pairs.groupBy(col("vec_id"))
        .agg(
          max_by(struct(col("b_id"), col("cos")),
            when(col("b_label") === col("label"),
              struct((-col("cos")).as("k"), (-col("b_id")).as("nb"))))
            .as("p"),
          max_by(struct(col("b_id"), col("cos")),
            when(col("b_label") =!= col("label"),
              struct(col("cos").as("k"), (-col("b_id")).as("nb"))))
            .as("n"))
      km.select(col("vec_id"), col("cluster"))
        .join(labels, Seq("vec_id"))
        .join(mined, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("label"),
          col("p.b_id").as("pos_id"), col("p.cos").as("pos_cos"),
          col("n.b_id").as("neg_id"), col("n.cos").as("neg_cos"))
        .orderBy("vec_id")
    }),

    // ---- q86: incremental cluster assignment vs persisted centroids ----
    // The clustering member of the incremental-artifact family (q67
    // signatures, q69 LM, q72 gram set, q78 IVF index, q79 pair index):
    // a production pipeline does NOT re-run Lloyd's per crawl batch —
    // the old corpus's converged centroids (k rows) persist once per
    // snapshot as a parquet side-table, and each new embedding batch is
    // ASSIGNED against the artifact: one broadcast of k rows + one
    // map-side argmax over the batch, zero old-corpus reads (plan-pinned:
    // batch cut pushed to the embeddings scan; no Lloyd iteration — no
    // centroid-update aggregate — appears in the per-batch plan). The
    // per-batch `score` stream is the drift signal: a falling batch-mean
    // score means new content no longer fits the old semantic cells and
    // it's time to rebuild the artifact.
    "q86_incremental_assign" -> ((s, dir) => {
      val cut = BatchCut.cut(s,
        Graft.parquetSource(s, dir).table("embeddings"), "vec_id")
      // clustering params belong to the artifact's identity: a k /
      // iters / FpScale change must rebuild, not silently serve
      // centroids computed under the old parameters
      // ("-hinit" = the hash-sampled init generation: an init-scheme
      // change redefines the centroids, so it must version the identity)
      val k = kmK(s); val it = kmIters(s)
      val path = graft.sources.SideTable.ensure(s, "km_centroids",
          s"$dir#$cut#k$k-i$it-s${FpScale.toLong}-hinit",
          Some(s"$dir/embeddings.parquet")) {
        kmeansCentroids(
          normalized(s, dir).where(col("vec_id") < cut).localCheckpoint(),
          k, it, capture = false)
      }
      val cents = s.read.parquet(path)
      val batch = normalized(s, dir).where(col("vec_id") >= cut)
      val asgLazy = kmAssignSlim(batch, cents)
      lastIncrementalAssignPlan =
        asgLazy.queryExecution.executedPlan.toString
      asgLazy.select(col("vec_id"), col("cid").as("cluster"),
          col("score"))
        .orderBy("vec_id")
    }),

    // ---- q88: incremental SemDeDup — batch vs persisted cluster members
    // Completes the incremental family's semantic-dedup member (q67 is
    // its MinHash sibling): a crawl batch must not re-cluster — or
    // re-pair — the old corpus to learn which of ITS vectors are
    // semantic duplicates. Two artifacts persist per corpus snapshot,
    // both keyed by the full clustering identity: the converged
    // centroids (shared with q86) and `sem_members` — the old corpus's
    // assignment WITH vector payload, PARTITIONED BY CLUSTER. Per
    // batch: one k-row broadcast assigns the batch (no Lloyd
    // iteration — plan-pinned), then the SemDeDup drop rule runs
    // against (a) the member artifact — batch side broadcast, and the
    // cluster-partitioned scan statically pruned to the batch's
    // cluster list (≤ k values, a metadata-grain collect — the q78
    // shuffle-mode discipline, deterministic where DPP's benefit
    // heuristic is not) — and (b) earlier-id batch mates (a
    // |batch|-bounded self-join). Old members all precede the
    // batch (ids < cut), matching q81's earlier-id semantics; both
    // candidate sides pass through ONE capBuckets guard on the
    // cluster's combined size (graft.semdedup.maxCluster), so a
    // mega-cluster's batch vectors surface as kept, exactly as in q81.
    // The oracle re-derives the old clustering from scratch —
    // equivalence holds because the artifacts ARE that converged
    // state, persisted.
    "q88_incremental_semdedup" -> ((s, dir) => {
      val cut = BatchCut.cut(s,
        Graft.parquetSource(s, dir).table("embeddings"), "vec_id")
      val k = kmK(s); val it = kmIters(s)
      val ident = s"$dir#$cut#k$k-i$it-s${FpScale.toLong}-hinit"
      val dataPath = Some(s"$dir/embeddings.parquet")
      val centPath = graft.sources.SideTable.ensure(s, "km_centroids",
          ident, dataPath) {
        kmeansCentroids(
          normalized(s, dir).where(col("vec_id") < cut).localCheckpoint(),
          k, it, capture = false)
      }
      val cents = s.read.parquet(centPath)
      val memPath = graft.sources.SideTable.ensure(s, "sem_members",
          ident, dataPath, Seq("cluster")) {
        kmAssign(
            normalized(s, dir).where(col("vec_id") < cut).localCheckpoint(),
            cents)
          .select(col("vec_id"), col("cid").cast("int").as("cluster"),
            col("v"), col("nrm"))
      }
      val members = s.read.parquet(memPath)
      val batchAsg = kmAssign(
          normalized(s, dir).where(col("vec_id") >= cut), cents)
        .select(col("vec_id"), col("cid").cast("int").as("cluster"),
          col("v"), col("nrm"))
        .localCheckpoint() // |batch| rows; read as the broadcast probe,
        // the earlier-id batch mate side, and the final output spine
      val b = batchAsg.select(col("vec_id").as("b_id"), col("cluster"),
        col("v").as("bv"), col("nrm").as("bn"))
      val bClusters = batchAsg.select(col("cluster")).distinct()
        .collect().map(_.getInt(0)).sorted
      // earlier-id candidates = old members (cluster-pruned artifact
      // scan) ∪ earlier batch mates — ONE frame, so the capBuckets
      // guard sees each cluster's COMBINED size and an over-cap cluster
      // generates no pairs from EITHER side: its batch vectors surface
      // as kept, exactly q81's capped-cluster semantics (the join's
      // equi-key is the cluster id, so dropping a cluster from the
      // candidate side removes every pair it would have produced)
      val earlier = members
        .where(col("cluster").isin(bClusters.toIndexedSeq: _*))
        .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
        .unionByName(batchAsg
          .select(col("vec_id"), col("cluster"), col("v"), col("nrm")))
      val capped = TextPipeline.capBuckets(earlier, Seq("cluster"),
        s, "q88 semdedup clusters", "graft.semdedup.maxCluster")
      val domLazy = capped.join(broadcast(b), Seq("cluster"))
        .where(col("vec_id") < col("b_id") &&
          (dotNative(col("v"), col("bv")) / (col("nrm") * col("bn")))
            >= lit(semTau(s)))
        .select(col("b_id"), col("vec_id"))
      lastIncrementalSemPlan =
        domLazy.queryExecution.executedPlan.toString
      val dom = domLazy
        .groupBy(col("b_id")).agg(min(col("vec_id")).as("dropped_by"))
        .withColumnRenamed("b_id", "vec_id")
      batchAsg.select(col("vec_id"), col("cluster").cast("long"))
        .join(dom, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          col("dropped_by").isNull.as("kept"), col("dropped_by"))
        .orderBy("vec_id")
    }),

    // ---- q85: cluster-balanced sampling --------------------------------
    // The step the SemDeDup recipe runs AFTER clustering: cap each
    // semantic cluster at k representatives (deterministic content-hash
    // rank, the q40 discipline — stable under repartitioning, unlike
    // rand()) so mega-clusters can't dominate the training mix while
    // tail clusters survive intact. Per-cluster top-k is the mergeable
    // [[graft.functions.TopK]] aggregate — k rows shuffle per (cluster,
    // task) — never a `row_number()` window sorting whole clusters
    // inside single tasks (a mega-cluster IS the straggler case this
    // guards). Clusters come from the session memo when q80 already
    // ran.
    "q85_cluster_sample" -> ((s, dir) => {
      val km = kmMemo.computeIfAbsent(kmMemoKey(s, dir),
        _ => computeKmeans(s, dir))
      val scored = km.select(col("cluster").as("q_id"), col("vec_id"),
        (-(graft.functions.TextFunctions.hash60(
            col("vec_id").cast("string")) % lit(2147483647L))
          .cast("double")).as("cos"))
      topkPerQuery(scored, 10)
        .select(col("q_id").as("cluster"), col("vec_id"), col("rank"))
        .orderBy("cluster", "rank")
    }),

    // ---- q110: incremental two-stage ANN vs persisted int8 artifacts ---
    // q90's deployment shape (the q105 four-artifact discipline applied
    // to vectors): the retrieval index persists once per corpus snapshot
    // as TWO cell-partitioned SideTable artifacts — the exact-payload
    // IVF index (q78's `ivf_index`, REUSED by identity: vec_id, v, nrm,
    // cell) and the int8 index built FROM it (`int8_index`: qv stored as
    // array<tinyint> — genuinely 8× smaller on disk than the doubles —
    // plus its precomputed norm; one artifact scan, the corpus
    // embeddings are never re-read). Each new batch vector then
    // retrieves against the frozen index with batch-proportional cost:
    // probe 2 cells against the 16 persisted centroids, stage-1 search
    // ONLY the probed cells of the int8 artifact (dynamic partition
    // pruning — the sole index-side pass, over codegen-quantized
    // values via [[graft.functions.QuantizeExpr]]), stage-2 fetch exact
    // vectors for the ≤ C·|batch| candidates alone from the exact
    // artifact (broadcast semi-join — candidate-bounded by
    // construction) and re-rank by exact cosine to the final top-5.
    // The batch's only embeddings read carries the cut pushed to the
    // scan; the index side never touches raw embeddings (plan-pinned).
    // Quantization costs recall only (bounded by C; q82's audit), never
    // ranking error — the output order is exact cosine over candidates.
    "q110_incremental_rerank_ann" -> ((s, dir) => {
      val cut = BatchCut.cut(s,
        Graft.parquetSource(s, dir).table("embeddings"), "vec_id")
      val dataPath = Some(s"$dir/embeddings.parquet")
      val idxPath = graft.sources.SideTable.ensure(s, "ivf_index",
          s"$dir#$cut", dataPath, Seq("cell")) {
        val old = normalized(s, dir).where(col("vec_id") < cut)
        val cents = old.where(col("vec_id") < 16)
          .select(col("vec_id").as("cid"), col("v").as("cv"),
            col("nrm").as("cn"))
        old.join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
            (dotNative(col("v"), col("cv")) / (col("nrm") * col("cn")))
              .as("sim"))
          .groupBy(col("vec_id"))
          .agg(max_by(struct(col("v"), col("nrm"), col("cid")),
            struct(col("sim"), (-col("cid")).as("nc"))).as("r"))
          .select(col("vec_id"), col("r.v").as("v"),
            col("r.nrm").as("nrm"), col("r.cid").cast("int").as("cell"))
      }
      val idx = s.read.parquet(idxPath)
      val qidxPath = graft.sources.SideTable.ensure(s, "int8_index",
          s"$dir#$cut", dataPath, Seq("cell")) {
        // built from the exact artifact — one scan, no embeddings read;
        // the double grid values round-trip the tinyint cast exactly
        quantizedOf(s.read.parquet(idxPath)
            .select(col("vec_id"), col("cell"), col("v")), Seq("cell"))
          .select(col("vec_id"), col("cell"),
            col("qv").cast("array<tinyint>").as("qv8"), col("qn"))
      }
      val qidx = s.read.parquet(qidxPath)
        .select(col("vec_id"), col("cell"),
          col("qv8").cast("array<double>").as("qv"), col("qn"))
      val cents = idx.where(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
        .localCheckpoint() // 16 rows; read by the probe ranking
      val bqLazy = quantizedOf(
          normalized(s, dir).where(col("vec_id") >= cut)
            .select(col("vec_id"), col("v"), col("v").as("ev"),
              col("nrm").as("en")), Seq("ev", "en"))
        .select(col("vec_id").as("q_id"), col("ev"), col("en"),
          col("qv").as("qqv"), col("qn").as("qqn"))
      val bq = bqLazy
        .localCheckpoint() // |batch| rows; probes + stage-1 + re-rank
      val wProbe = Window.partitionBy(col("q_id"))
        .orderBy(col("qsim").desc, col("cid"))
      val probes = bq.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("qqv"), col("qqn"), col("cid"),
          (dotNative(col("ev"), col("cv")) / (col("en") * col("cn")))
            .as("qsim"))
        .withColumn("rnk", row_number().over(wProbe))
        .where(col("rnk") <= 2)
        .select(col("q_id"), col("qqv"), col("qqn"),
          col("cid").cast("int").as("cell"))
      // stage 1: ONLY the probed cells of the int8 artifact (DPP);
      // no self-pair filter needed — query ids ≥ cut, index ids < cut
      val scored1Lazy = qidx.join(broadcast(probes), "cell")
        .select(col("q_id"), col("vec_id"),
          (dotNative(col("qqv"), col("qv")) / (col("qqn") * col("qn")))
            .as("cos"))
      val cand = topkPerQuery(scored1Lazy, rerankC(s))
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ C·|batch| rows; fetch probe + spine
      // stage 2: exact payload for candidates ONLY, from the exact
      // artifact — candidate-bounded broadcast semi-join
      val fetchLazy = idx.join(
        broadcast(cand.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      lastIncrementalRerankPlan =
        bqLazy.queryExecution.executedPlan.toString +
          "\n-- stage1 --\n" +
          scored1Lazy.queryExecution.executedPlan.toString +
          "\n-- fetch --\n" +
          fetchLazy.queryExecution.executedPlan.toString
      val scored = cand
        .join(fetchLazy, Seq("vec_id"))
        .join(broadcast(bq.select(col("q_id"), col("ev"), col("en"))),
          Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          (dotNative(col("ev"), col("v")) / (col("en") * col("nrm")))
            .as("cos"))
      topkPerQuery(scored, 5)
    }),

    // ---- q117: product-quantization two-stage ANN ---------------------
    // Thin binding over [[graft.ops.Embed.pqTopK]] — the FAISS-style
    // compressed-index design: 4 subspace codebooks (16 centroids each,
    // the engine's deterministic fixed-point k-means), every vector
    // compressed to 4 codes, stage-1 ADC scan over the code table with
    // per-query broadcast lookup tables (fixed-order partial sums, so
    // the approximate scores are bit-stable under any partitioning),
    // exact cosine re-rank of the top-C candidates. Same query set,
    // depth, and output shape as q90 so the two compressed-index
    // designs (symmetric int8 grid vs learned PQ codebooks) are
    // directly comparable. The oracle replays codebook training,
    // encoding, ADC, and re-rank end-to-end in SQL.
    "q117_pq_ann" -> ((s, dir) => {
      // the DETECTOR always recomputes and refreshes the session memo
      // (its benchmarked cost is the real pipeline); q121, the
      // CONSUMER, reuses the session's last run — the q27/q53 pattern
      val r = computePqAnn(s, dir).localCheckpoint() // 25 rows
      pqMemo.put(pqMemoKey(s, dir), r)
      r
    }),

    // ---- q121: PQ recall audit vs exact ground truth -------------------
    // The q70 discipline applied to the PQ index: per query, how many
    // of the exact top-5 does the PQ two-stage retrieval surface? The
    // honest deployment gate for q117/q120 — recall is bounded by C
    // and ksub (quantization error in the ADC stage), and a deployment
    // picks (m, ksub, C) by watching THIS number, not by trusting the
    // design. Shares q30's exact ranking and q117's PQ ranking (both
    // memoless session runs; the exact side reads ≤ 5 rows/query).
    "q121_pq_recall" -> ((s, dir) => {
      val exact = defs("q30_cosine_topk")(s, dir)
        .where(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ 5 rows per query; read by hits AND qids
      val approx = pqMemo.computeIfAbsent(pqMemoKey(s, dir),
          _ => computePqAnn(s, dir).localCheckpoint())
        .select(col("q_id"), col("vec_id"))
      // approx is k-per-query and hits one-per-query; the checkpointed
      // inputs carry no size stats, so hint both joins broadcast
      // (guide §3.1 — else each is a SortMergeJoin + 2 exchanges)
      val hits = exact.join(broadcast(approx), Seq("q_id", "vec_id"),
          "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      exact.select(col("q_id")).distinct()
        .join(broadcast(hits), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
            .as("recall"))
        .orderBy("q_id")
    }),

    // ---- q122: composed IVFPQ — the router prunes, the codes compress
    // The full FAISS-default shape as one verified query: q46's cell
    // routing (here TRAINED — the q80 k-means, k = graft.kmeans.k)
    // composed with q117's PQ codes; the ADC stage scans only each
    // query's nprobe=2 probed cells. The oracle replays router
    // training, cell assignment, probe selection, codebooks, encoding,
    // the probe-restricted ADC, and the exact re-rank end-to-end.
    "q122_ivfpq_ann" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      graft.ops.Embed.ivfPqTopK(emb, emb.where(col("vec_id") < 5),
        k = 5, nlist = kmK(s), nprobe = 2, m = PqMDefault,
        ksub = PqKsubDefault, iters = KmItersDefault, c = rerankC(s),
        excludeSelf = true)
    }),

    // ---- q123: incremental IVFPQ vs persisted router + routed codes --
    // The last square of the retrieval matrix (session/incremental ×
    // int8/IVF/PQ/IVFPQ): q122's composition as the crawl loop runs
    // it. Four artifacts persist per snapshot — the router centroids
    // (k rows), the subspace codebooks, the code table PARTITIONED BY
    // CELL (so each batch's probe join prunes the scan to its probed
    // cells' partitions — the q78/q110 dynamic-partition-pruning
    // discipline applied to the compressed index), and the exact
    // re-rank payload. Per batch: probe nprobe cells against the k-row
    // router broadcast, ADC only the probed partitions, re-rank ≤
    // C·|batch| exact fetches. All four artifacts ensure through
    // PUBLIC frame definitions (kmeansCentroids / pqCodebooks /
    // pqEncode+assignCells / normalize).
    "q123_incremental_ivfpq" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val (routerP, cbP, ccP, exP) = pqIvfIndex(s, dir, cut)
      val batch = emb.where(col("vec_id") >= cut)
      val probes = graft.ops.Embed.cellProbes(batch,
        s.read.parquet(routerP), nprobe = 2)
      graft.ops.Embed.pqSearch(s.read.parquet(ccP),
        s.read.parquet(cbP), s.read.parquet(exP), batch, k = 5,
        c = rerankC(s), m = PqMDefault, probes = Some(probes))
    }),

    // ---- q124: incremental-IVFPQ recall audit vs exact ground truth --
    // The q70/q121 discipline applied to the deployment path: per
    // BATCH query, how many of its exact old-corpus top-5 does q123's
    // artifact-backed probe-restricted retrieval surface? Recall here
    // compounds THREE cuts — router misses (nprobe), quantization
    // misses (ksub), and the candidate cut (C) — so this is the number
    // a crawl deployment actually watches. No session memo: q123's
    // cost is already artifact-amortized (the SideTable manifests ARE
    // the cross-run memo), so re-deriving it here pays only the probe
    // + ADC + re-rank, batch-proportional by construction.
    "q124_ivfpq_recall" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val exact = graft.ops.Embed.cosineTopK(
          emb.where(col("vec_id") < cut),
          emb.where(col("vec_id") >= cut), k = 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ 5 rows per query; read by hits AND qids
      val approx = defs("q123_incremental_ivfpq")(s, dir)
        .select(col("q_id"), col("vec_id"))
      // approx is k-per-query and hits one-per-query; the checkpointed
      // inputs carry no size stats, so hint both joins broadcast
      // (guide §3.1 — else each is a SortMergeJoin + 2 exchanges)
      val hits = exact.join(broadcast(approx), Seq("q_id", "vec_id"),
          "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      exact.select(col("q_id")).distinct()
        .join(broadcast(hits), Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
            .as("recall"))
        .orderBy("q_id")
    }),

    // ---- q130: margin-based mutual-kNN pair mining ---------------------
    // Thin binding over [[graft.ops.Embed.marginPairs]] — the Artetxe
    // & Schwenk ratio-margin criterion (the CCMatrix recipe): mutual
    // top-1 pairs between the even- and odd-id halves of the
    // embeddings table, each pair's cosine normalized by the two
    // sides' k-NN cosine means (hub correction), kept at margin ≥ tau.
    // Knobs: graft.margin.k / graft.margin.tau.
    // ---- q146: per-dimension embedding health report -------------------
    // Thin binding over [[graft.ops.Embed.dimStats]] — per-coordinate
    // count/mean/quantized-variance/min/max + dead-dimension flag,
    // the vector-column QA pass (exact fixed-point + decimal
    // accumulation; no float sum order anywhere).
    "q146_dim_stats" -> ((s, dir) => {
      graft.ops.Embed.dimStats(
          Graft.parquetSource(s, dir).table("embeddings"))
        .orderBy("dim")
    }),

    // ---- q169: exact fixed-point PCA (power iteration + deflation) ----
    // [[graft.ops.Embed.pca]] — top-2 components in the engine's
    // deterministic grade: exact decimal Gram sums, driver-side
    // BigInt power iteration (6 rounds), sign-handled floor
    // divisions, one correctly-rounded IEEE sqrt per round (the q142
    // rule). Detector-consumer memo: q169 refreshes, q170 projects.
    "q169_pca" -> ((s, dir) => {
      pcaCompsOf(s, dir, refresh = true).orderBy("comp", "dim")
    }),

    // ---- q170: centered exact PCA projection ----------------------------
    // [[graft.ops.Embed.pcaProject]] over q169's memoized component
    // frame — proj = Σ (xfp − μ_fp)·w_fp, exact longs on the
    // 2^24×2^20 grid, k rows per vector.
    "q170_pca_project" -> ((s, dir) => {
      graft.ops.Embed.pcaProject(
          Graft.parquetSource(s, dir).table("embeddings"),
          pcaCompsOf(s, dir, refresh = false))
        .orderBy("vec_id", "comp")
    }),

    // ---- q171: incremental PCA vs the persisted Gram accumulator -------
    // The {session, incremental} square closed for PCA (the q147
    // discipline): the snapshot persists its EXACT decimal Gram
    // accumulator ([[graft.ops.Embed.pcaFrame]] — n, Si, Sij cells),
    // each crawl batch computes only its own frame and merges
    // losslessly ([[graft.ops.Embed.pcaMerge]]); the driver iteration
    // ([[graft.ops.Embed.pcaFromFrame]]) then yields components
    // IDENTICAL to from-scratch q169 bit-for-bit (exactness — the
    // oracle is q169's verbatim). Per epoch the old corpus is never
    // re-read: the artifact scan is d(d+1)/2 + d + 1 rows.
    "q171_incremental_pca" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val frameP = pcaFrameIndex(s, dir, cut)
      graft.ops.Embed.pcaFromFrame(
          graft.ops.Embed.pcaMerge(s.read.parquet(frameP),
            graft.ops.Embed.pcaFrame(
              emb.where(col("vec_id") >= cut))), 2, 6)
        .orderBy("comp", "dim")
    }),

    // ---- q172: PCA explained-variance audit -----------------------------
    // The audit discipline (q70/q73/q121) applied to PCA:
    // [[graft.ops.Embed.pcaExplained]] — per component the Rayleigh
    // eigenvalue vs the exact trace of the rescaled Gram, explained
    // fraction as one integer floor division. Runs off the SAME
    // accumulator frame definition q171 persists.
    "q172_pca_explained" -> ((s, dir) => {
      graft.ops.Embed.pcaExplained(
          graft.ops.Embed.pcaFrame(
            Graft.parquetSource(s, dir).table("embeddings")), 2, 6)
        .orderBy("comp")
    }),

    // ---- q168: deterministic signed random projection (JL sketch) ------
    // [[graft.ops.Embed.randomProject]] — ±1 Achlioptas projection to
    // 16 dims with a DERIVED sign matrix (hash60("j:d") mod 2, no RNG,
    // no stored artifact) over 2^24-quantized inputs; every output
    // coordinate is an exact integer sum.
    "q168_random_project" -> ((s, dir) => {
      graft.ops.Embed.randomProject(
          Graft.parquetSource(s, dir).table("embeddings"), 16)
        .orderBy("vec_id", "dim")
    }),

    // ---- q147: incremental dim stats vs the persisted moments ---------
    // The {session, incremental} square closed for the health report:
    // the snapshot persists its |dims|-row EXACT accumulator frame
    // ([[graft.ops.Embed.dimStatsFrame]] — n, sfp, ssq as
    // decimal(38,0), raw min/max), each crawl batch computes only its
    // own frame and merges ([[graft.ops.Embed.dimStatsMerge]]) —
    // lossless by exactness, so epoch-N output ≡ from-scratch
    // [[graft.ops.Embed.dimStats]] over the whole corpus bit-for-bit
    // (OpsApiSpec pins this). Per epoch the old corpus is NEVER
    // re-read: the artifact scan is |dims| rows, the batch pass is
    // batch-proportional.
    "q147_incremental_dim_stats" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val frameP = dimStatsIndex(s, dir, cut)
      graft.ops.Embed.dimStatsFinalize(
          graft.ops.Embed.dimStatsMerge(s.read.parquet(frameP),
            graft.ops.Embed.dimStatsFrame(
              emb.where(col("vec_id") >= cut))))
        .orderBy("dim")
    }),

    // ---- q145: norm-quantile outlier flags -----------------------------
    // Thin binding over [[graft.ops.Embed.normOutliers]] — the
    // embedding sanity filter: exact global rank in the (nrm, id)
    // total order via range partitioning + per-partition windows +
    // broadcast offsets (the q63 two-level discipline on a sort key);
    // bottom/top rank-quantiles flag low/high. Knobs: graft.norm.lo /
    // graft.norm.hi (percent).
    "q145_norm_outliers" -> ((s, dir) => {
      val lo = s.conf.getOption("graft.norm.lo").map(_.toInt).getOrElse(5)
      val hi = s.conf.getOption("graft.norm.hi").map(_.toInt).getOrElse(95)
      graft.ops.Embed.normOutliers(
          Graft.parquetSource(s, dir).table("embeddings"), lo, hi)
        .orderBy("vec_id")
    }),

    "q130_margin_mining" -> ((s, dir) => {
      val k = s.conf.getOption("graft.margin.k").map(_.toInt).getOrElse(4)
      val tau = s.conf.getOption("graft.margin.tau").map(_.toDouble)
        .getOrElse(1.05d)
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      graft.ops.Embed.marginPairs(
          emb.where(pmod(col("vec_id"), lit(2)) === 0),
          emb.where(pmod(col("vec_id"), lit(2)) === 1), k, tau)
        .orderBy("x_id")
    }),

    // ---- q131: incremental margin mining vs the persisted payload ------
    // q130 as the crawl loop runs it: each embedding batch mines
    // aligned pairs against the FROZEN old corpus — the corpus side
    // reads the persisted normalized payload (ensured via the public
    // [[graft.ops.Embed.normalize]] frame definition, so the artifact
    // and a from-scratch run cannot drift), the batch broadcasts, and
    // both directional rankings are map-side TopK aggregates over the
    // corpus scan (the |corpus|·|batch| pair frame never
    // materializes). Same knobs as q130.
    "q131_incremental_margin_mining" -> ((s, dir) => {
      val k = s.conf.getOption("graft.margin.k").map(_.toInt).getOrElse(4)
      val tau = s.conf.getOption("graft.margin.tau").map(_.toDouble)
        .getOrElse(1.05d)
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val nP = normIndex(s, dir, cut)
      graft.ops.Embed.marginPairsBatchImpl(
          s.read.parquet(nP), emb.where(col("vec_id") >= cut), k, tau,
          "vec_id", "v", "vec_id", "embedding",
          capture = true) // the q131 plan pin reads the capture
        .orderBy("x_id")
    }),

    // ---- q120: incremental PQ ANN vs persisted codebook/code artifacts
    // q117 as the crawl loop runs it (the q110 pattern applied to the
    // PQ index): the old corpus's subspace codebooks (m·ksub rows) and
    // code table (m smallints per vector — the 32×-compressed index)
    // persist once per snapshot, plus the exact payload for the
    // re-rank fetch; each embedding batch builds its ADC lookup tables
    // against the FROZEN codebooks and scans only the code artifact —
    // raw old vectors are touched for ≤ C·|batch| candidates alone.
    // Artifacts ensure through the PUBLIC frame definitions
    // (Embed.pqCodebooks / pqEncode / normalize), so the artifact-
    // backed answer and a from-scratch q117-style run cannot drift.
    "q120_incremental_pq_ann" -> ((s, dir) => {
      val emb = Graft.parquetSource(s, dir).table("embeddings")
      val cut = BatchCut.cut(s, emb, "vec_id")
      val (cbP, codeP, exP) = pqIndex(s, dir, cut)
      val batch = emb.where(col("vec_id") >= cut)
      graft.ops.Embed.pqSearchImpl(s.read.parquet(codeP),
        s.read.parquet(cbP), s.read.parquet(exP), batch, k = 5,
        c = rerankC(s), m = PqMDefault, "vec_id", "embedding",
        capture = true) // the q120 plan pin reads the capture
    })
  )

  /** The q117 pipeline body — shared by the q117 binding (which
    * refreshes the session memo) and q121's consumer path. */
  private def computePqAnn(s: SparkSession, dir: String): DataFrame = {
    val m = s.conf.getOption("graft.pq.m").map(_.toInt)
      .getOrElse(PqMDefault)
    val ksub = s.conf.getOption("graft.pq.ksub").map(_.toInt)
      .getOrElse(PqKsubDefault)
    val emb = Graft.parquetSource(s, dir).table("embeddings")
    graft.ops.Embed.pqTopK(emb, emb.where(col("vec_id") < 5), k = 5,
      m = m, ksub = ksub, iters = KmItersDefault, c = rerankC(s),
      excludeSelf = true)
  }

  /** Session memo of q117's 25-row ranking, keyed by every input that
    * determines it (conf-resolved m/ksub/C fold in via the key). */
  private val pqMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int, Int, Int), DataFrame]()

  private def pqMemoKey(s: SparkSession, dir: String) =
    (s, dir,
      s.conf.getOption("graft.pq.m").map(_.toInt).getOrElse(PqMDefault),
      s.conf.getOption("graft.pq.ksub").map(_.toInt)
        .getOrElse(PqKsubDefault),
      rerankC(s))

  private[graft] def clearPqMemo(): Unit = pqMemo.clear()

  private[graft] def pqMemoSize: Int = pqMemo.size

  /** The persisted IVFPQ snapshot artifacts behind q123 — router
    * centroids, codebooks (q120's, shared by identity), the
    * CELL-PARTITIONED code table, and the exact payload (q120's). */
  private[graft] def pqIvfIndex(s: SparkSession, dir: String,
      cut: Long): (String, String, String, String) = {
    import graft.sources.SideTable
    val k = kmK(s)
    val key = s"$dir#$cut#m$PqMDefault-k$PqKsubDefault-i$KmItersDefault" +
      s"-s${FpScale.toLong}"
    val fp = Some(s"$dir/embeddings.parquet")
    def old = Graft.parquetSource(s, dir).table("embeddings")
      .where(col("vec_id") < cut)
    val routerP = SideTable.ensure(s, "pq_router", s"$key-r$k", fp) {
      kmeansCentroids(
        graft.ops.Embed.normalize(old).localCheckpoint(), k,
        KmItersDefault, capture = false)
    }
    val cbP = SideTable.ensure(s, "pq_codebooks", key, fp) {
      graft.ops.Embed.pqCodebooks(old, PqMDefault, PqKsubDefault,
        KmItersDefault)
    }
    val ccP = SideTable.ensure(s, "pq_cellcodes", s"$key-r$k", fp,
        partitionBy = Seq("cell")) {
      graft.ops.Embed.pqEncode(old, s.read.parquet(cbP), PqMDefault)
        .join(graft.ops.Embed.assignCells(old,
          s.read.parquet(routerP)), Seq("vec_id"))
    }
    val exP = SideTable.ensure(s, "pq_exact", key, fp) {
      graft.ops.Embed.normalize(old)
    }
    (routerP, cbP, ccP, exP)
  }

  /** The persisted PQ snapshot artifacts behind q120 — codebooks,
    * code table, and exact re-rank payload of the old corpus, each
    * built via the PUBLIC frame definitions. */
  /** The persisted normalized-payload artifact behind q131 — built via
    * the public frame definition ([[graft.ops.Embed.normalize]]). */
  /** The persisted per-dimension moments artifact behind q147 — built
    * via the public frame definition ([[graft.ops.Embed.dimStatsFrame]]):
    * one |dims|-row exact accumulator table (n, sfp, ssq, min, max),
    * mergeable losslessly with any batch's frame. */
  private[graft] def dimStatsIndex(s: SparkSession, dir: String,
      cut: Long): String =
    graft.sources.SideTable.ensure(s, "dim_stats", s"$dir#$cut",
        Some(s"$dir/embeddings.parquet")) {
      graft.ops.Embed.dimStatsFrame(
        Graft.parquetSource(s, dir).table("embeddings")
          .where(col("vec_id") < cut))
    }

  /** The persisted exact Gram accumulator behind q171 — built via the
    * SAME frame definition the public API exposes
    * ([[graft.ops.Embed.pcaFrame]]). */
  private[graft] def pcaFrameIndex(s: SparkSession, dir: String,
      cut: Long): String =
    graft.sources.SideTable.ensure(s, "pca_frame", s"$dir#$cut",
        Some(s"$dir/embeddings.parquet")) {
      graft.ops.Embed.pcaFrame(
        Graft.parquetSource(s, dir).table("embeddings")
          .where(col("vec_id") < cut))
    }

  private[graft] def normIndex(s: SparkSession, dir: String,
      cut: Long): String =
    graft.sources.SideTable.ensure(s, "norm_vecs", s"$dir#$cut",
        Some(s"$dir/embeddings.parquet")) {
      graft.ops.Embed.normalize(
        Graft.parquetSource(s, dir).table("embeddings")
          .where(col("vec_id") < cut))
    }

  private[graft] def pqIndex(s: SparkSession, dir: String,
      cut: Long): (String, String, String) = {
    import graft.sources.SideTable
    val key = s"$dir#$cut#m$PqMDefault-k$PqKsubDefault-i$KmItersDefault" +
      s"-s${FpScale.toLong}"
    val fp = Some(s"$dir/embeddings.parquet")
    def old = Graft.parquetSource(s, dir).table("embeddings")
      .where(col("vec_id") < cut)
    val cbP = SideTable.ensure(s, "pq_codebooks", key, fp) {
      graft.ops.Embed.pqCodebooks(old, PqMDefault, PqKsubDefault,
        KmItersDefault)
    }
    val codeP = SideTable.ensure(s, "pq_codes", key, fp) {
      graft.ops.Embed.pqEncode(old, s.read.parquet(cbP), PqMDefault)
    }
    val exP = SideTable.ensure(s, "pq_exact", key, fp) {
      graft.ops.Embed.normalize(old)
    }
    (cbP, codeP, exP)
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB left-fold dot product — same IEEE op order as [[dot]]. */
  private[queries] def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::double, list_transform(list_zip($a, $b), p -> p[1]*p[2])), (acc, x) -> acc + x)"

  /** Raw-vector + norm CTE — same op order as [[normalized]]. */
  private val baseCte =
    """WITH e0 AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::double) v FROM embeddings
      |), e AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_prepend(0.0::double, list_transform(v, x -> x*x)), (acc, x) -> acc + x)) nrm
      |  FROM e0
      |)""".stripMargin

  /** Cosine with the same op order as the Spark side: dot/(na*nb). */
  private[queries] def duckCos(a: String, na: String, b: String, nb: String): String =
    s"(${duckDot(a, b)} / ($na * $nb))"

  private val bandKeySql: Seq[String] = (0 until Bands).map { b =>
    (0 until Rows).map { r =>
      val plane = planeSqlLiteral(planes(b * Rows + r))
      s"(CASE WHEN ${duckDot("v", plane)} > 0 THEN ${1L << r} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** q31's full oracle SQL — also embedded as the `pairs` CTE of q60's
    * recursive-CTE connected-components oracle. */
  private lazy val annPairsSql: String =
    baseCte +
      s""", keyed AS (
         |  SELECT vec_id, unnest(range(0, $Bands)) band_idx,
         |    unnest([${bandKeySql.mkString(",\n      ")}]) band_key
         |  FROM e
         |), cand AS (
         |  SELECT DISTINCT a.vec_id v1, b.vec_id v2
         |  FROM keyed a JOIN keyed b ON a.band_idx = b.band_idx
         |    AND a.band_key = b.band_key AND a.vec_id < b.vec_id
         |)
         |SELECT v1, v2, ${duckCos("e1.v", "e1.nrm", "e2.v", "e2.nrm")} AS cos
         |FROM cand JOIN e e1 ON e1.vec_id = v1 JOIN e e2 ON e2.vec_id = v2
         |WHERE ${duckCos("e1.v", "e1.nrm", "e2.v", "e2.nrm")} >= 0.45
         |ORDER BY v1, v2""".stripMargin

  /** q30's full oracle SQL — also the `exact` CTE of q70's recall audit. */
  private lazy val cosineTopkSql: String =
    baseCte +
      s""", q AS (SELECT vec_id q_id, v qv, nrm qn FROM e WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.q_id, e.vec_id, ${duckCos("q.qv", "q.qn", "e.v", "e.nrm")} AS cos
         |  FROM e JOIN q ON e.vec_id <> q.q_id
         |), ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
         |  FROM scored
         |)
         |SELECT q_id, vec_id, cos, rank FROM ranked
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** q201's sweep grid: (tables, radius) cells at [[LshSweepBits]]
    * sign bits — shared by the engine binding and the oracle builder
    * so the two can never drift. */
  private[queries] val LshSweepBits = 8
  private[queries] val LshSweepGrid: Seq[(Int, Int)] =
    Seq((1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (2, 2), (4, 2), (8, 2))

  /** q188's replay: the q168 sign-matrix/projection SQL → 8-bit sign
    * buckets (y = 0 counts as a set bit, the engine's rule) →
    * multi-probe candidates (exact bucket + Hamming-1 flips via xor)
    * → exact cosine re-rank, the q30 ranking tail. */
  private lazy val lshSql: String =
    baseCte +
      s""", x AS (
        |  SELECT vec_id, t.i::bigint AS d,
        |    floor(embedding[t.i]::double * 16777216.0)::bigint AS xfp
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |), sg AS (
        |  SELECT r.j::bigint AS j, dd.d,
        |    (1 - 2 * ((('0x' || substr(md5(r.j::varchar || ':' ||
        |      dd.d::varchar), 1, 15))::bigint) % 2))::bigint AS sgn
        |  FROM range(1, 9) r(j), (SELECT DISTINCT d FROM x) dd
        |), yp AS (
        |  SELECT x.vec_id, sg.j, sum(sg.sgn * x.xfp)::bigint AS y
        |  FROM x JOIN sg USING (d) GROUP BY 1, 2
        |), bk AS MATERIALIZED (
        |  SELECT vec_id,
        |    sum(CASE WHEN y >= 0 THEN (1::BIGINT << (j - 1)::INT)
        |      ELSE 0 END)::BIGINT AS bucket
        |  FROM yp GROUP BY 1
        |), qb AS (
        |  SELECT vec_id AS q_id, bucket FROM bk WHERE vec_id < 5
        |), pr AS (
        |  SELECT q_id, bucket FROM qb
        |  UNION ALL
        |  SELECT q_id, xor(bucket, (1::BIGINT << r.b::INT)) AS bucket
        |  FROM qb, range(0, 8) AS r(b)
        |), cand AS (
        |  SELECT pr.q_id, bk.vec_id
        |  FROM bk JOIN pr USING (bucket)
        |  WHERE bk.vec_id <> pr.q_id
        |), scored AS (
        |  SELECT c.q_id, c.vec_id,
        |    ${duckCos("eq.v", "eq.nrm", "ec.v", "ec.nrm")} AS cos
        |  FROM cand c JOIN e ec ON ec.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.q_id
        |), ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored
        |)
        |SELECT q_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** q201's replay: the lshSql projection widened to maxTables·bits
    * dims (table t = dims t·bits+1 .. (t+1)·bits, so table 0 hashes
    * exactly like q188's single table), per-(vector, table) sign
    * buckets, then one CTE pair per sweep cell: popcount-≤radius
    * probe masks (inlined from the SAME Scala generator the engine
    * uses), DISTINCT candidate pairs over the first `tables` tables,
    * candidate count + recall@5 vs the exact ground truth. */
  private lazy val lshSweepSql: String = {
    val bits = LshSweepBits
    val maxT = LshSweepGrid.map(_._1).max
    val head = baseCte +
      s""", x AS (
        |  SELECT vec_id, t.i::bigint AS d,
        |    floor(embedding[t.i]::double * 16777216.0)::bigint AS xfp
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |), sg AS (
        |  SELECT r.j::bigint AS j, dd.d,
        |    (1 - 2 * ((('0x' || substr(md5(r.j::varchar || ':' ||
        |      dd.d::varchar), 1, 15))::bigint) % 2))::bigint AS sgn
        |  FROM range(1, ${maxT * bits + 1}) r(j),
        |    (SELECT DISTINCT d FROM x) dd
        |), yp AS (
        |  SELECT x.vec_id, sg.j, sum(sg.sgn * x.xfp)::bigint AS y
        |  FROM x JOIN sg USING (d) GROUP BY 1, 2
        |), bt AS MATERIALIZED (
        |  SELECT vec_id, ((j - 1) // $bits)::INT AS t,
        |    sum(CASE WHEN y >= 0
        |      THEN (1::BIGINT << ((j - 1) % $bits)::INT)
        |      ELSE 0 END)::BIGINT AS bucket
        |  FROM yp GROUP BY 1, 2
        |), qb AS MATERIALIZED (
        |  SELECT vec_id AS q_id, t, bucket FROM bt WHERE vec_id < 5
        |), qq AS (
        |  SELECT vec_id q_id, v qv, nrm qn FROM e WHERE vec_id < 5
        |), gt AS MATERIALIZED (
        |  SELECT q_id, vec_id FROM (
        |    SELECT qq.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY qq.q_id
        |        ORDER BY ${duckCos("qq.qv", "qq.qn", "e.v", "e.nrm")}
        |          DESC, e.vec_id) rank
        |    FROM e JOIN qq ON e.vec_id <> qq.q_id
        |  ) WHERE rank <= 5
        |)""".stripMargin
    val cellCtes = LshSweepGrid.zipWithIndex.map { case ((l, r), i) =>
      val masks = graft.ops.Embed.lshProbeMasks(bits, r).mkString(", ")
      s""", cand$i AS (
        |  SELECT DISTINCT pr.q_id, bt.vec_id
        |  FROM (SELECT q_id, t, xor(bucket, mk.m::BIGINT) AS bucket
        |        FROM qb, unnest([$masks]) AS mk(m)
        |        WHERE t < $l) pr
        |  JOIN bt ON bt.t = pr.t AND bt.bucket = pr.bucket
        |  WHERE bt.vec_id <> pr.q_id
        |), st$i AS (
        |  SELECT $l::INT AS tables, $r::INT AS radius, q.q_id,
        |    coalesce(nc.n_cand, 0)::BIGINT AS n_cand,
        |    coalesce(nh.n_hit, 0)::BIGINT AS n_hit,
        |    (coalesce(nh.n_hit, 0)::DOUBLE / 5.0) AS recall
        |  FROM (SELECT DISTINCT q_id FROM gt) q
        |  LEFT JOIN (SELECT q_id, count(*)::BIGINT n_cand
        |             FROM cand$i GROUP BY 1) nc USING (q_id)
        |  LEFT JOIN (SELECT q_id, count(*)::BIGINT n_hit
        |             FROM gt JOIN cand$i USING (q_id, vec_id)
        |             GROUP BY 1) nh USING (q_id)
        |)""".stripMargin
    }.mkString
    val body = LshSweepGrid.indices
      .map(i => s"SELECT * FROM st$i")
      .mkString("\n", "\nUNION ALL ", "\n")
    head + cellCtes + body + "ORDER BY tables, radius, q_id"
  }

  /** q203's replay: the FULL-corpus two-table LSH from scratch (the
    * engine searches snapshot-index ∪ batch-delta artifacts; equality
    * proves the append path because the bucket function is
    * corpus-independent). Same CTE shapes as [[lshSweepSql]] at
    * maxT = 2, radius-1 probes, q30 re-rank tail; queries = the
    * batch's first five ids (the q86 cut formula). */
  private lazy val lshIncrSql: String = {
    val bits = LshSweepBits
    val masks = graft.ops.Embed.lshProbeMasks(bits, 1).mkString(", ")
    baseCte +
      s""", cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
        |x AS (
        |  SELECT vec_id, t.i::bigint AS d,
        |    floor(embedding[t.i]::double * 16777216.0)::bigint AS xfp
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |), sg AS (
        |  SELECT r.j::bigint AS j, dd.d,
        |    (1 - 2 * ((('0x' || substr(md5(r.j::varchar || ':' ||
        |      dd.d::varchar), 1, 15))::bigint) % 2))::bigint AS sgn
        |  FROM range(1, ${2 * bits + 1}) r(j),
        |    (SELECT DISTINCT d FROM x) dd
        |), yp AS (
        |  SELECT x.vec_id, sg.j, sum(sg.sgn * x.xfp)::bigint AS y
        |  FROM x JOIN sg USING (d) GROUP BY 1, 2
        |), bt AS MATERIALIZED (
        |  SELECT vec_id, ((j - 1) // $bits)::INT AS t,
        |    sum(CASE WHEN y >= 0
        |      THEN (1::BIGINT << ((j - 1) % $bits)::INT)
        |      ELSE 0 END)::BIGINT AS bucket
        |  FROM yp GROUP BY 1, 2
        |), qb AS (
        |  SELECT vec_id AS q_id, t, bucket FROM bt
        |  WHERE vec_id >= (SELECT c FROM cut)
        |    AND vec_id < (SELECT c FROM cut) + 5
        |), cand AS (
        |  SELECT DISTINCT pr.q_id, bt.vec_id
        |  FROM (SELECT q_id, t, xor(bucket, mk.m::BIGINT) AS bucket
        |        FROM qb, unnest([$masks]) AS mk(m)) pr
        |  JOIN bt ON bt.t = pr.t AND bt.bucket = pr.bucket
        |  WHERE bt.vec_id <> pr.q_id
        |), scored AS (
        |  SELECT c.q_id, c.vec_id,
        |    ${duckCos("eq.v", "eq.nrm", "ec.v", "ec.nrm")} AS cos
        |  FROM cand c JOIN e ec ON ec.vec_id = c.vec_id
        |  JOIN e eq ON eq.vec_id = c.q_id
        |), ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored
        |)
        |SELECT q_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  }

  /** Score with the same op order as [[kmScore]]. */
  private def kmScoreSql(v: String, cv: String, cn: String): String =
    s"(${duckDot(v, cv)} - (0.5 * ($cn * $cn)))"

  /** The k-means iteration chain c0 → (a/u/c)1..KmItersDefault over source
    * relation `src` — the same init, assignment ranking, and
    * fixed-point update arithmetic as the Spark side, op for op.
    * `src` is "e" for the full-corpus clustering (q80/q81/q85) and the
    * old-corpus CTE for q86's artifact rebuild. */
  private[queries] def kmCtesFrom(src: String, dim: Int = Dim): String = {
    // init: the same hash-sampled top-k as the Spark side — md5-based
    // hash60 mod 2^31−1, vec_id tiebreak (the q85 ranking expression)
    val init =
      s""", c0 AS (
         |  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM (
         |    SELECT vec_id, v, nrm, row_number() OVER (ORDER BY
         |      (('0x' || substr(md5(vec_id::varchar),1,15))::bigint % 2147483647), vec_id) rnk
         |    FROM $src
         |  ) WHERE rnk <= $KmKDefault
         |)""".stripMargin
    val iters = (1 to KmItersDefault).map { it =>
      val prev = s"c${it - 1}"
      s""", a$it AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT e.vec_id, e.v, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${kmScoreSql("e.v", "c.cv", "c.cn")} DESC, c.cid) rnk
         |    FROM $src e CROSS JOIN $prev c
         |  ) WHERE rnk = 1
         |), u$it AS (
         |  SELECT cid, i, sum(floor(v[i] * $FpScale)::bigint) s, count(*) n
         |  FROM a$it CROSS JOIN range(1, ${dim + 1}) t(i)
         |  GROUP BY cid, i
         |), c$it AS (
         |  SELECT cid, cv,
         |    sqrt(list_reduce(list_prepend(0.0::double, list_transform(cv, x -> x*x)), (acc, x) -> acc + x)) cn
         |  FROM (
         |    SELECT cid, list(((s::double / n::double) / $FpScale) ORDER BY i) cv
         |    FROM u$it GROUP BY cid
         |  )
         |)""".stripMargin
    }.mkString
    init + iters
  }

  private lazy val kmCtes: String = kmCtesFrom("e")

  /** The final assignment of relation `src` against c<KmItersDefault>. */
  private[queries] def kmFinalFrom(src: String): String =
    s"""SELECT vec_id, cid AS cluster, score FROM (
       |  SELECT e.vec_id, c.cid, ${kmScoreSql("e.v", "c.cv", "c.cn")} AS score,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${kmScoreSql("e.v", "c.cv", "c.cn")} DESC, c.cid) rnk
       |  FROM $src e CROSS JOIN c$KmItersDefault c
       |) WHERE rnk = 1""".stripMargin

  /** q80's body, also the `asg` CTE of q81/q85. */
  private lazy val kmFinalSql: String = kmFinalFrom("e")

  private[queries] val PcaIters = 6

  /** Sign-handled floor-on-magnitude integer division — the exact
    * division the engine's PCA driver math uses (truncation-vs-floor
    * semantics can never diverge when the dividend is nonnegative). */
  private[queries] def sdivSql(a: String, b: String): String =
    s"CASE WHEN ($a) >= 0 THEN ($a) // ($b) " +
      s"ELSE -((-($a)) // ($b)) END"

  /** One power-iteration chain over gram CTE `gq` (i, j, q):
    * v<tag>_0 .. v<tag>_iters plus the Rayleigh CTE ray<tag>.
    * Every CTE is MATERIALIZED (the clf-oracle lesson — v_t is
    * referenced by both the next matvec and its own fallback). */
  private[queries] def pcaPowerCtes(tag: String, gq: String): String = {
    val head = s""",
      |v${tag}_0 AS MATERIALIZED (
      |  SELECT DISTINCT i AS d, 1048576::HUGEINT AS v FROM $gq
      |)""".stripMargin
    val rounds = (1 to PcaIters).map { t =>
      s""",
        |w${tag}_$t AS MATERIALIZED (
        |  SELECT g.i AS d, sum(g.q * v.v)::HUGEINT AS w
        |  FROM $gq g JOIN v${tag}_${t - 1} v ON v.d = g.j GROUP BY 1
        |), wq${tag}_$t AS MATERIALIZED (
        |  SELECT d, (${sdivSql("w", "1048576")})::HUGEINT AS wq
        |  FROM w${tag}_$t
        |), nm${tag}_$t AS MATERIALIZED (
        |  SELECT CASE WHEN n2 = 0 THEN 0
        |    ELSE floor(sqrt(n2::DOUBLE)) END::HUGEINT AS nrm, n2
        |  FROM (SELECT sum(wq*wq)::HUGEINT AS n2 FROM wq${tag}_$t)
        |), v${tag}_$t AS MATERIALIZED (
        |  SELECT w.d, CASE WHEN nm.n2 = 0 THEN p.v
        |    ELSE (${sdivSql("w.wq * 1048576", "nm.nrm")})::HUGEINT
        |    END AS v
        |  FROM wq${tag}_$t w JOIN v${tag}_${t - 1} p ON p.d = w.d,
        |    nm${tag}_$t nm
        |)""".stripMargin
    }.mkString
    val ray = s""",
      |gv$tag AS MATERIALIZED (
      |  SELECT g.i AS d, sum(g.q * v.v)::HUGEINT AS gv
      |  FROM $gq g JOIN v${tag}_$PcaIters v ON v.d = g.j GROUP BY 1
      |), ray$tag AS MATERIALIZED (
      |  SELECT (${sdivSql(
        s"(SELECT sum(v.v * gv.gv) FROM v${tag}_$PcaIters v " +
          s"JOIN gv$tag gv ON gv.d = v.d)",
        s"(SELECT sum(v*v) FROM v${tag}_$PcaIters)")})::HUGEINT AS lam,
      |    (SELECT sum(v*v) FROM v${tag}_$PcaIters)::HUGEINT AS den
      |)""".stripMargin
    head + rounds + ray
  }

  /** k deflated power-iteration chains over gram CTE `gq` — chain i
    * gets tag `tags(i)`; between chains the Rayleigh deflation CTE
    * gq2, gq3, … subtracts λ·v·vᵀ/den exactly as the engine's
    * [[graft.ops.Embed.pcaIterate]] does. Shared by the embeddings
    * PCA oracles (2 chains) and the word-vector oracle (k chains). */
  private[queries] def pcaChainCtes(tags: Seq[String]): String = {
    val sb = new StringBuilder
    var gram = "gq"
    for ((tg, idx) <- tags.zipWithIndex) {
      if (idx > 0) {
        val prev = tags(idx - 1)
        val next = s"gq${idx + 1}"
        sb.append(s""",
          |$next AS MATERIALIZED (
          |  SELECT g.i, g.j,
          |    (g.q - (${sdivSql(s"r.lam * vi.v * vj.v", "r.den")}))::HUGEINT
          |      AS q
          |  FROM $gram g JOIN v${prev}_$PcaIters vi ON vi.d = g.i
          |    JOIN v${prev}_$PcaIters vj ON vj.d = g.j, ray$prev r
          |)""".stripMargin)
        gram = next
      }
      sb.append(pcaPowerCtes(tg, gram))
    }
    sb.toString
  }

  /** Exact Gram CTEs from an (vec_id, d, xfp) relation `f`: n, per-dim
    * sums, pair sums, the scaled Gram and its 20-bit rescale — the
    * tail every PCA oracle shares; see [[graft.ops.Embed.pcaFrame]]. */
  private[queries] def pcaGramCtes(f: String): String =
    s""", nn AS MATERIALIZED (
      |  SELECT count(DISTINCT vec_id)::HUGEINT AS n FROM $f
      |), si AS MATERIALIZED (
      |  SELECT d, sum(xfp)::HUGEINT AS s FROM $f GROUP BY d
      |), g0 AS MATERIALIZED (
      |  SELECT a.d AS i, b.d AS j, sum(a.xfp * b.xfp)::HUGEINT AS sij
      |  FROM $f a JOIN $f b ON a.vec_id = b.vec_id AND a.d <= b.d
      |  GROUP BY 1, 2
      |), gm AS (
      |  SELECT g0.i, g0.j, (nn.n * g0.sij - a.s * b.s)::HUGEINT AS gv
      |  FROM g0, si a, si b, nn WHERE a.d = g0.i AND b.d = g0.j
      |), gfull AS MATERIALIZED (
      |  SELECT i, j, gv FROM gm
      |  UNION ALL SELECT j, i, gv FROM gm WHERE i <> j
      |), mx AS (SELECT max(abs(gv))::HUGEINT AS m FROM gfull),
      |gq AS MATERIALIZED (
      |  SELECT i, j, (${sdivSql("gv * 1048576", "mx.m")})::HUGEINT AS q
      |  FROM gfull, mx
      |)""".stripMargin

  /** The shared q169/q170 replay: exact Gram from two corpus
    * aggregates, 20-bit rescale against max|G|, then two deflated
    * power-iteration chains — a CTE-for-CTE port of the engine's
    * driver BigInt math into HUGEINT SQL. */
  private def pcaCtes: String =
    """WITH f AS MATERIALIZED (
      |  SELECT vec_id, t.i::BIGINT AS d,
      |    floor(embedding[t.i]::DOUBLE * 16777216.0)::HUGEINT AS xfp
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
      |)""".stripMargin +
      pcaGramCtes("f") +
      pcaChainCtes(Seq("a", "b"))

  val oracles: Map[String, String] = Map(
    "q30_cosine_topk" -> cosineTopkSql,

    "q188_lsh_ann" -> lshSql,

    "q201_lsh_recall_sweep" -> lshSweepSql,

    "q203_incremental_lsh" -> lshIncrSql,

    // the q70 audit shape: recall@5 of the LSH member vs exact
    "q189_lsh_recall" ->
      (s"""WITH exact AS ($cosineTopkSql), lsh AS ($lshSql),
         |hits AS (
         |  SELECT e5.q_id, count(*)::BIGINT AS n_hit
         |  FROM (SELECT q_id, vec_id FROM exact WHERE rank <= 5) e5
         |  JOIN lsh USING (q_id, vec_id)
         |  GROUP BY 1
         |)
         |SELECT q.q_id, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
         |  (coalesce(h.n_hit, 0)::DOUBLE / 5.0) AS recall
         |FROM (SELECT DISTINCT q_id FROM exact) q
         |LEFT JOIN hits h ON h.q_id = q.q_id
         |ORDER BY q.q_id""".stripMargin),

    "q80_kmeans" ->
      (baseCte + kmCtes + "\n" + kmFinalSql + " ORDER BY vec_id"),

    // The oracle rebuilds the old-corpus clustering from scratch (it
    // has no artifact); equivalence holds because the artifact rows ARE
    // those converged centroids, persisted.
    "q86_incremental_assign" ->
      (baseCte +
        """, cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
          |old AS (SELECT vec_id, v, nrm FROM e WHERE vec_id < (SELECT c FROM cut))""".stripMargin +
        kmCtesFrom("old") + "\n" +
        kmFinalFrom(
          "(SELECT vec_id, v, nrm FROM e WHERE vec_id >= (SELECT c FROM cut))") +
        " ORDER BY vec_id"),

    "q85_cluster_sample" ->
      (baseCte + kmCtes +
        s""", asg AS (
           |$kmFinalSql
           |), ranked AS (
           |  SELECT cluster, vec_id,
           |    row_number() OVER (PARTITION BY cluster
           |      ORDER BY (('0x' || substr(md5(vec_id::varchar),1,15))::bigint % 2147483647), vec_id) rank
           |  FROM asg
           |)
           |SELECT cluster, vec_id, rank FROM ranked
           |WHERE rank <= 10 ORDER BY cluster, rank""".stripMargin),

    "q81_semdedup" ->
      (baseCte + kmCtes +
        s""", asg AS (
           |$kmFinalSql
           |), dom AS (
           |  SELECT a.vec_id, min(b.vec_id) AS dropped_by
           |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
           |  WHERE ${duckCos("ea.v", "ea.nrm", "eb.v", "eb.nrm")} >= $SemTauDefault
           |  GROUP BY a.vec_id
           |)
           |SELECT asg.vec_id, asg.cluster,
           |  (d.dropped_by IS NULL) AS kept, d.dropped_by
           |FROM asg LEFT JOIN dom d ON d.vec_id = asg.vec_id
           |ORDER BY asg.vec_id""".stripMargin),

    // The oracle rebuilds the old-corpus clustering and membership from
    // scratch (it has no artifacts); equivalence holds because the
    // centroid and member artifacts ARE that converged state, persisted.
    "q88_incremental_semdedup" ->
      (baseCte +
        """, cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
          |old AS (SELECT vec_id, v, nrm FROM e WHERE vec_id < (SELECT c FROM cut))""".stripMargin +
        kmCtesFrom("old") +
        s""", asg_old AS (
           |${kmFinalFrom("old")}
           |), asg_b AS (
           |${kmFinalFrom(
              "(SELECT vec_id, v, nrm FROM e WHERE vec_id >= (SELECT c FROM cut))")}
           |), mem AS (
           |  SELECT vec_id, cluster FROM asg_old
           |  UNION ALL
           |  SELECT vec_id, cluster FROM asg_b
           |), dom AS (
           |  SELECT b.vec_id AS vid, min(a.vec_id) AS dropped_by
           |  FROM asg_b b JOIN mem a ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
           |  WHERE ${duckCos("ea.v", "ea.nrm", "eb.v", "eb.nrm")} >= $SemTauDefault
           |  GROUP BY b.vec_id
           |)
           |SELECT b.vec_id, b.cluster, (d.dropped_by IS NULL) AS kept, d.dropped_by
           |FROM asg_b b LEFT JOIN dom d ON d.vid = b.vec_id
           |ORDER BY b.vec_id""".stripMargin),

    "q82_quantized_ann" ->
      (baseCte +
        s""", qz0 AS (
           |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM e
           |), qz AS (
           |  SELECT vec_id,
           |    list_transform(v, x -> floor((x * (127.0 / mx)) + 0.5)::double) qv
           |  FROM qz0 WHERE mx > 0
           |), qn AS (
           |  SELECT vec_id, qv, sqrt(${duckDot("qv", "qv")}) qn FROM qz
           |), qq AS (SELECT vec_id q_id, qv qqv, qn qqn FROM qn WHERE vec_id < 5),
           |qscored AS (
           |  SELECT q_id, qn.vec_id, (${duckDot("qqv", "qv")} / (qqn * qn.qn)) AS cos
           |  FROM qn JOIN qq ON qn.vec_id <> qq.q_id
           |), qtop AS (
           |  SELECT q_id, vec_id, cos FROM (
           |    SELECT q_id, vec_id, cos,
           |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
           |    FROM qscored
           |  ) WHERE rank <= 5
           |), errs AS (
           |  SELECT t.q_id,
           |    max(abs(t.cos - ${duckCos("e1.v", "e1.nrm", "e2.v", "e2.nrm")})) max_abs_err
           |  FROM qtop t JOIN e e1 ON e1.vec_id = t.q_id
           |    JOIN e e2 ON e2.vec_id = t.vec_id
           |  GROUP BY t.q_id
           |), exact AS ($cosineTopkSql),
           |qids AS (SELECT DISTINCT q_id FROM exact),
           |hits AS (
           |  SELECT e.q_id, count(*) AS n_hit
           |  FROM exact e JOIN qtop t ON t.q_id = e.q_id AND t.vec_id = e.vec_id
           |  WHERE e.rank <= 5
           |  GROUP BY e.q_id
           |)
           |SELECT q_id, coalesce(n_hit, 0)::bigint AS n_hit,
           |  coalesce(n_hit, 0)::double / 5 AS recall, max_abs_err
           |FROM qids LEFT JOIN hits USING (q_id) LEFT JOIN errs USING (q_id)
           |ORDER BY q_id""".stripMargin),

    // Stage 1 is q82's quantized search widened to C candidates; stage 2
    // re-ranks the candidate set by exact cosine.
    "q90_rerank_ann" ->
      (baseCte +
        s""", qz0 AS (
           |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM e
           |), qz AS (
           |  SELECT vec_id,
           |    list_transform(v, x -> floor((x * (127.0 / mx)) + 0.5)::double) qv
           |  FROM qz0 WHERE mx > 0
           |), qn AS (
           |  SELECT vec_id, qv, sqrt(${duckDot("qv", "qv")}) qn FROM qz
           |), qq AS (SELECT vec_id q_id, qv qqv, qn qqn FROM qn WHERE vec_id < 5),
           |qscored AS (
           |  SELECT q_id, qn.vec_id, (${duckDot("qqv", "qv")} / (qqn * qn.qn)) AS cos
           |  FROM qn JOIN qq ON qn.vec_id <> qq.q_id
           |), cand AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rnk
           |    FROM qscored
           |  ) WHERE rnk <= $RerankCDefault
           |), q AS (SELECT vec_id q_id, v ev, nrm en FROM e WHERE vec_id < 5),
           |rer AS (
           |  SELECT c.q_id, c.vec_id,
           |    (${duckDot("q.ev", "e.v")} / (q.en * e.nrm)) AS cos
           |  FROM cand c JOIN e ON e.vec_id = c.vec_id
           |    JOIN q ON q.q_id = c.q_id
           |)
           |SELECT q_id, vec_id, cos, rank FROM (
           |  SELECT q_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
           |  FROM rer
           |) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    // The oracle rebuilds every artifact from scratch (it has none):
    // cells from the old slice's nearest-centroid argmax, the int8 grid
    // from the same quantization formula, probing/candidacy/re-rank
    // identical to q90's except candidacy is restricted to the 2 probed
    // cells and queries are the batch slice (vec_id >= cut).
    "q110_incremental_rerank_ann" ->
      (baseCte +
        s""", cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
           |old AS (SELECT vec_id, v, nrm FROM e WHERE vec_id < (SELECT c FROM cut)),
           |cents AS (SELECT vec_id cid, v cv, nrm cn FROM old WHERE vec_id < 16),
           |asg AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT o.vec_id, c.cid AS cell,
           |      row_number() OVER (PARTITION BY o.vec_id
           |        ORDER BY ${duckCos("o.v", "o.nrm", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM old o CROSS JOIN cents c
           |  ) WHERE rnk = 1
           |), qz0 AS (
           |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM old
           |), qz AS (
           |  SELECT vec_id,
           |    list_transform(v, x -> floor((x * (127.0 / mx)) + 0.5)::double) qv
           |  FROM qz0 WHERE mx > 0
           |), qidx AS (
           |  SELECT z.vec_id, a.cell, z.qv, sqrt(${duckDot("z.qv", "z.qv")}) qn
           |  FROM qz z JOIN asg a ON a.vec_id = z.vec_id
           |), b0 AS (
           |  SELECT vec_id, v, nrm, list_max(list_transform(v, x -> abs(x))) mx
           |  FROM e WHERE vec_id >= (SELECT c FROM cut)
           |), bq0 AS (
           |  SELECT vec_id q_id, v ev, nrm en,
           |    list_transform(v, x -> floor((x * (127.0 / mx)) + 0.5)::double) qqv
           |  FROM b0 WHERE mx > 0
           |), bq AS (
           |  SELECT q_id, ev, en, qqv, sqrt(${duckDot("qqv", "qqv")}) qqn FROM bq0
           |), probes AS (
           |  SELECT q_id, cell FROM (
           |    SELECT b.q_id, c.cid AS cell,
           |      row_number() OVER (PARTITION BY b.q_id
           |        ORDER BY ${duckCos("b.ev", "b.en", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM bq b CROSS JOIN cents c
           |  ) WHERE rnk <= 2
           |), s1 AS (
           |  SELECT p.q_id, i.vec_id,
           |    (${duckDot("b.qqv", "i.qv")} / (b.qqn * i.qn)) AS cos
           |  FROM probes p JOIN qidx i ON i.cell = p.cell
           |    JOIN bq b ON b.q_id = p.q_id
           |), cand AS (
           |  SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rnk
           |    FROM s1) WHERE rnk <= $RerankCDefault
           |), rer AS (
           |  SELECT cd.q_id, cd.vec_id,
           |    (${duckDot("b.ev", "o.v")} / (b.en * o.nrm)) AS cos
           |  FROM cand cd JOIN old o ON o.vec_id = cd.vec_id
           |    JOIN bq b ON b.q_id = cd.q_id
           |)
           |SELECT q_id, vec_id, cos, rank FROM (
           |  SELECT q_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
           |  FROM rer
           |) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    // The oracle rebuilds the old-corpus centroids from scratch (it has
    // no artifact); fit = max cosine to any centroid, ties → lowest cid
    // (the Spark side's max_by key struct mirrors ORDER BY cos DESC, cid).
    "q91_batch_ood" ->
      (baseCte +
        """, cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
          |old AS (SELECT vec_id, v, nrm FROM e WHERE vec_id < (SELECT c FROM cut))""".stripMargin +
        kmCtesFrom("old") +
        s""", fit AS (
           |  SELECT vec_id, cid, cos FROM (
           |    SELECT b.vec_id, c.cid,
           |      ${duckCos("b.v", "b.nrm", "c.cv", "c.cn")} AS cos,
           |      row_number() OVER (PARTITION BY b.vec_id
           |        ORDER BY ${duckCos("b.v", "b.nrm", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM (SELECT vec_id, v, nrm FROM e
           |          WHERE vec_id >= (SELECT c FROM cut)) b
           |      CROSS JOIN c$KmItersDefault c
           |  ) WHERE rnk = 1
           |)
           |SELECT cid AS cluster, count(*)::bigint AS n_batch,
           |  sum(CASE WHEN cos < $OodTauDefault THEN 1 ELSE 0 END)::bigint AS n_ood,
           |  (sum(CASE WHEN cos < $OodTauDefault THEN 1 ELSE 0 END)::double
           |    / count(*)::double) AS ood_rate,
           |  min(cos) AS min_fit
           |FROM fit GROUP BY cid ORDER BY cluster""".stripMargin),

    "q96_hard_negatives" ->
      (baseCte + kmCtes +
        s""", asg AS (
           |$kmFinalSql
           |), lab AS (SELECT vec_id, label FROM embeddings),
           |neg AS (
           |  SELECT vec_id, b_id AS neg_id, cos AS neg_cos FROM (
           |    SELECT a.vec_id, b.vec_id AS b_id,
           |      ${duckCos("ea.v", "ea.nrm", "eb.v", "eb.nrm")} AS cos,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${duckCos("ea.v", "ea.nrm", "eb.v", "eb.nrm")} DESC, b.vec_id) rnk
           |    FROM asg a JOIN asg b ON a.cluster = b.cluster
           |      AND b.vec_id <> a.vec_id
           |    JOIN lab la ON la.vec_id = a.vec_id
           |    JOIN lab lb ON lb.vec_id = b.vec_id AND lb.label <> la.label
           |    JOIN e ea ON ea.vec_id = a.vec_id
           |    JOIN e eb ON eb.vec_id = b.vec_id
           |  ) WHERE rnk = 1
           |)
           |SELECT a.vec_id, a.cluster, la.label, n.neg_id, n.neg_cos
           |FROM asg a JOIN lab la ON la.vec_id = a.vec_id
           |LEFT JOIN neg n ON n.vec_id = a.vec_id
           |ORDER BY a.vec_id""".stripMargin),

    "q99_triplet_mining" ->
      (baseCte + kmCtes +
        s""", asg AS (
           |$kmFinalSql
           |), lab AS (SELECT vec_id, label FROM embeddings),
           |pr AS (
           |  SELECT a.vec_id, la.label, b.vec_id AS b_id, lb.label AS b_label,
           |    ${duckCos("ea.v", "ea.nrm", "eb.v", "eb.nrm")} AS cos
           |  FROM asg a JOIN asg b ON a.cluster = b.cluster
           |    AND b.vec_id <> a.vec_id
           |  JOIN lab la ON la.vec_id = a.vec_id
           |  JOIN lab lb ON lb.vec_id = b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id
           |), pos AS (
           |  SELECT vec_id, b_id AS pos_id, cos AS pos_cos FROM (
           |    SELECT vec_id, b_id, cos, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cos ASC, b_id) rnk
           |    FROM pr WHERE b_label = label
           |  ) WHERE rnk = 1
           |), neg AS (
           |  SELECT vec_id, b_id AS neg_id, cos AS neg_cos FROM (
           |    SELECT vec_id, b_id, cos, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cos DESC, b_id) rnk
           |    FROM pr WHERE b_label <> label
           |  ) WHERE rnk = 1
           |)
           |SELECT a.vec_id, a.cluster, la.label,
           |  p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
           |FROM asg a JOIN lab la ON la.vec_id = a.vec_id
           |LEFT JOIN pos p ON p.vec_id = a.vec_id
           |LEFT JOIN neg n ON n.vec_id = a.vec_id
           |ORDER BY a.vec_id""".stripMargin),

    "q97_ivf_balance" ->
      (baseCte +
        s""", cents AS (SELECT vec_id cid, v cv, nrm cn FROM e WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cid,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY ${duckCos("v", "nrm", "cv", "cn")} DESC, cid) rnk
           |  FROM e CROSS JOIN cents
           |), cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rnk = 1),
           |occ AS (SELECT cell, count(*)::bigint n_vecs FROM cells GROUP BY cell),
           |tot AS (SELECT count(*)::bigint total FROM cells)
           |SELECT c.cid AS cell, coalesce(o.n_vecs, 0)::bigint AS n_vecs,
           |  (coalesce(o.n_vecs, 0)::double / t.total::double) AS frac,
           |  ((coalesce(o.n_vecs, 0)::double / t.total::double) * 16.0)
           |    AS load_factor
           |FROM cents c LEFT JOIN occ o ON o.cell = c.cid CROSS JOIN tot t
           |ORDER BY cell""".stripMargin),

    "q31_ann_lsh" -> annPairsSql,

    "q60_embedding_dedup" ->
      s"""WITH RECURSIVE pairs AS ($annPairsSql),
         |edges AS (SELECT v1 a, v2 b FROM pairs UNION SELECT v2, v1 FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |)
         |SELECT a AS vec_id, min(b) AS keep_id,
         |  count(DISTINCT b) AS cluster_size
         |FROM reach GROUP BY a ORDER BY a""".stripMargin,

    "q46_ivf_ann" -> ivfAnnSql,

    // The oracle rebuilds the old-corpus IVF index from scratch (it has
    // no artifact); equivalence holds because the artifact rows ARE that
    // assignment, persisted cell-partitioned.
    "q78_incremental_ann" ->
      (baseCte +
        s""", cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
           |old AS (SELECT vec_id, v, nrm FROM e WHERE vec_id < (SELECT c FROM cut)),
           |cents AS (SELECT vec_id cid, v cv, nrm cn FROM old WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, v, nrm, cid,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY ${duckCos("v", "nrm", "cv", "cn")} DESC, cid) rnk
           |  FROM old CROSS JOIN cents
           |), cells AS (
           |  SELECT vec_id, v, nrm, cid AS cell FROM assign WHERE rnk = 1
           |), q AS (
           |  SELECT vec_id q_id, v qv, nrm qn FROM e
           |  WHERE vec_id >= (SELECT c FROM cut)
           |), probes AS (
           |  SELECT q_id, qv, qn, cell FROM (
           |    SELECT q.q_id, q.qv, q.qn, c.cid AS cell,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY ${duckCos("q.qv", "q.qn", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM q CROSS JOIN cents c
           |  ) WHERE rnk <= 2
           |), scored AS (
           |  SELECT p.q_id, s.vec_id, ${duckCos("p.qv", "p.qn", "s.v", "s.nrm")} AS cos
           |  FROM probes p JOIN cells s ON s.cell = p.cell
           |)
           |SELECT q_id, vec_id, cos, rank FROM (
           |  SELECT q_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
           |  FROM scored
           |) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    "q117_pq_ann" -> pqAnnSql,

    "q120_incremental_pq_ann" -> pqIncrementalSql,

    "q123_incremental_ivfpq" -> ivfPqIncrementalSql,

    "q124_ivfpq_recall" ->
      s"""WITH exact AS ($exactBatchTop5Sql),
         |approx AS ($ivfPqIncrementalSql),
         |qids AS (SELECT DISTINCT q_id FROM exact),
         |hits AS (
         |  SELECT e.q_id, count(*) AS n_hit
         |  FROM exact e JOIN approx a
         |    ON a.q_id = e.q_id AND a.vec_id = e.vec_id
         |  GROUP BY e.q_id
         |)
         |SELECT q_id, coalesce(n_hit, 0)::bigint AS n_hit,
         |  coalesce(n_hit, 0)::double / 5 AS recall
         |FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id""".stripMargin,

    "q122_ivfpq_ann" -> ivfPqSql,

    "q130_margin_mining" -> marginMiningSql,

    "q169_pca" ->
      (pcaCtes +
        s""",
          |mu AS MATERIALIZED (
          |  SELECT si.d, (${sdivSql("si.s", "nn.n")})::HUGEINT AS v
          |  FROM si, nn
          |)
          |SELECT 0::BIGINT AS comp, d::BIGINT AS dim, v::BIGINT AS w_fp,
          |  (SELECT n FROM nn)::BIGINT AS lam_fp FROM mu
          |UNION ALL
          |SELECT 1, d, v::BIGINT, (SELECT lam FROM raya)::BIGINT
          |FROM va_$PcaIters
          |UNION ALL
          |SELECT 2, d, v::BIGINT, (SELECT lam FROM rayb)::BIGINT
          |FROM vb_$PcaIters
          |ORDER BY comp, dim""".stripMargin),

    "q172_pca_explained" ->
      (pcaCtes +
        s""",
          |tr AS MATERIALIZED (
          |  SELECT sum(q)::HUGEINT AS t FROM gq WHERE i = j
          |)
          |SELECT 1::BIGINT AS comp,
          |  (SELECT lam FROM raya)::BIGINT AS lam_fp,
          |  t::BIGINT AS trace_fp,
          |  (${sdivSql("(SELECT lam FROM raya) * 1000000", "t")})::BIGINT
          |    AS explained_ppm
          |FROM tr
          |UNION ALL
          |SELECT 2::BIGINT,
          |  (SELECT lam FROM rayb)::BIGINT,
          |  t::BIGINT,
          |  (${sdivSql("(SELECT lam FROM rayb) * 1000000", "t")})::BIGINT
          |FROM tr
          |ORDER BY comp""".stripMargin),

    // epoch-N ≡ from-scratch by exactness, so the replay is q169's
    "q171_incremental_pca" ->
      (pcaCtes +
        s""",
          |mu AS MATERIALIZED (
          |  SELECT si.d, (${sdivSql("si.s", "nn.n")})::HUGEINT AS v
          |  FROM si, nn
          |)
          |SELECT 0::BIGINT AS comp, d::BIGINT AS dim, v::BIGINT AS w_fp,
          |  (SELECT n FROM nn)::BIGINT AS lam_fp FROM mu
          |UNION ALL
          |SELECT 1, d, v::BIGINT, (SELECT lam FROM raya)::BIGINT
          |FROM va_$PcaIters
          |UNION ALL
          |SELECT 2, d, v::BIGINT, (SELECT lam FROM rayb)::BIGINT
          |FROM vb_$PcaIters
          |ORDER BY comp, dim""".stripMargin),

    "q170_pca_project" ->
      (pcaCtes +
        s""",
          |mu AS MATERIALIZED (
          |  SELECT si.d, (${sdivSql("si.s", "nn.n")})::HUGEINT AS v
          |  FROM si, nn
          |), cw AS MATERIALIZED (
          |  SELECT 1::BIGINT AS comp, d, v FROM va_$PcaIters
          |  UNION ALL
          |  SELECT 2::BIGINT, d, v FROM vb_$PcaIters
          |)
          |SELECT f.vec_id, cw.comp,
          |  sum((f.xfp - mu.v) * cw.v)::BIGINT AS proj_fp
          |FROM f JOIN mu ON mu.d = f.d JOIN cw ON cw.d = f.d
          |GROUP BY 1, 2 ORDER BY vec_id, comp""".stripMargin),

    "q168_random_project" ->
      """WITH x AS (
        |  SELECT vec_id, t.i::bigint AS d,
        |    floor(embedding[t.i]::double * 16777216.0)::bigint AS xfp
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |), s AS (
        |  SELECT r.j::bigint AS j, dd.d,
        |    (1 - 2 * ((('0x' || substr(md5(r.j::varchar || ':' ||
        |      dd.d::varchar), 1, 15))::bigint) % 2))::bigint AS sgn
        |  FROM range(1, 17) r(j), (SELECT DISTINCT d FROM x) dd
        |)
        |SELECT x.vec_id, s.j AS dim,
        |  sum(s.sgn * x.xfp)::bigint AS y_fp
        |FROM x JOIN s USING (d)
        |GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin,

    "q146_dim_stats" ->
      """WITH x AS (
        |  SELECT t.i AS dim, embedding[t.i]::double AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |), f AS (
        |  SELECT dim, x, floor(x * 16777216.0)::bigint AS xfp FROM x
        |), a AS (
        |  SELECT dim, count(*)::bigint AS n,
        |    sum(xfp) AS sfp, sum(xfp * xfp) AS ssq,
        |    min(x) AS min_x, max(x) AS max_x
        |  FROM f GROUP BY dim
        |)
        |SELECT dim::bigint AS dim, n,
        |  sfp::double / (n::double * 16777216.0) AS mean,
        |  (n::HUGEINT * ssq - sfp::HUGEINT * sfp::HUGEINT)::double /
        |    (n::double * n::double * 281474976710656.0) AS var_q,
        |  min_x, max_x, (min_x = max_x) AS dead
        |FROM a ORDER BY dim""".stripMargin,

    // q147 mirrors the merge algebra: per-segment exact accumulators
    // (snapshot vs batch by the vec_id cut) summed per dimension —
    // identical by exactness to the whole-corpus pass.
    "q147_incremental_dim_stats" ->
      """WITH cut AS (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
        |x AS (
        |  SELECT e.vec_id, t.i AS dim, embedding[t.i]::double AS x
        |  FROM embeddings e, unnest(range(1, len(embedding) + 1)) AS t(i)
        |), f AS (
        |  SELECT vec_id, dim, x, floor(x * 16777216.0)::bigint AS xfp
        |  FROM x
        |), seg AS (
        |  SELECT (vec_id >= (SELECT c FROM cut)) AS is_batch, dim,
        |    count(*)::bigint AS n, sum(xfp) AS sfp,
        |    sum(xfp * xfp) AS ssq, min(x) AS min_x, max(x) AS max_x
        |  FROM f GROUP BY 1, 2
        |), a AS (
        |  SELECT dim, sum(n)::bigint AS n, sum(sfp) AS sfp,
        |    sum(ssq) AS ssq, min(min_x) AS min_x, max(max_x) AS max_x
        |  FROM seg GROUP BY dim
        |)
        |SELECT dim::bigint AS dim, n,
        |  sfp::double / (n::double * 16777216.0) AS mean,
        |  (n::HUGEINT * ssq - sfp::HUGEINT * sfp::HUGEINT)::double /
        |    (n::double * n::double * 281474976710656.0) AS var_q,
        |  min_x, max_x, (min_x = max_x) AS dead
        |FROM a ORDER BY dim""".stripMargin,

    "q145_norm_outliers" ->
      (baseCte +
        """, r AS (
          |  SELECT vec_id, nrm,
          |    row_number() OVER (ORDER BY nrm, vec_id) AS rank
          |  FROM e
          |), n AS (SELECT count(*)::bigint AS c FROM e)
          |SELECT vec_id, nrm, rank::bigint AS rank,
          |  CASE WHEN rank <= c * 5 // 100 THEN 'low'
          |       WHEN rank > c - c * 5 // 100 THEN 'high'
          |       ELSE 'keep' END AS flag
          |FROM r CROSS JOIN n ORDER BY vec_id""".stripMargin),

    "q131_incremental_margin_mining" -> marginIncrementalSql,

    "q121_pq_recall" ->
      s"""WITH exact AS ($cosineTopkSql),
         |approx AS ($pqAnnSql),
         |qids AS (SELECT DISTINCT q_id FROM exact),
         |hits AS (
         |  SELECT e.q_id, count(*) AS n_hit
         |  FROM exact e JOIN approx a
         |    ON a.q_id = e.q_id AND a.vec_id = e.vec_id
         |  WHERE e.rank <= 5
         |  GROUP BY e.q_id
         |)
         |SELECT q_id, coalesce(n_hit, 0)::bigint AS n_hit,
         |  coalesce(n_hit, 0)::double / 5 AS recall
         |FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id""".stripMargin,

    "q70_ann_recall" ->
      s"""WITH exact AS ($cosineTopkSql),
         |approx AS ($ivfAnnSql),
         |qids AS (SELECT DISTINCT q_id FROM exact),
         |hits AS (
         |  SELECT e.q_id, count(*) AS n_hit
         |  FROM exact e JOIN approx a
         |    ON a.q_id = e.q_id AND a.vec_id = e.vec_id
         |  WHERE e.rank <= 5
         |  GROUP BY e.q_id
         |)
         |SELECT q_id, coalesce(n_hit, 0)::bigint AS n_hit,
         |  coalesce(n_hit, 0)::double / 5 AS recall
         |FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id""".stripMargin
  )

  /** The margin-mining replay (q130/q131) over caller-supplied side
    * CTEs: |X|x|Y| cosines, both directional rankings, the fixed-order
    * rank-pivot k-NN means, the mutual top-1 join, and the tau cut —
    * op for op with [[graft.ops.Embed.marginPairsOf]]. */
  private def marginSqlFrom(xDef: String, yDef: String,
      pre: String = ""): String =
    baseCte + pre +
      s""", x AS ($xDef),
         |y AS MATERIALIZED ($yDef),
         |sxy AS MATERIALIZED (
         |  SELECT x.vec_id x_id, y.vec_id y_id,
         |    (list_reduce(list_prepend(0.0::double,
         |       list_transform(list_zip(x.v, y.v), p -> p[1]*p[2])),
         |       (acc, x) -> acc + x) / (x.nrm * y.nrm)) AS cos
         |  FROM x, y
         |), rxy AS MATERIALIZED (
         |  SELECT x_id, y_id, cos, row_number() OVER (PARTITION BY x_id
         |    ORDER BY cos DESC, y_id) rank
         |  FROM sxy
         |), ryx AS MATERIALIZED (
         |  SELECT x_id, y_id, cos, row_number() OVER (PARTITION BY y_id
         |    ORDER BY cos DESC, x_id) rank
         |  FROM sxy
         |), mxp AS (
         |  SELECT x_id,
         |    max(CASE WHEN rank=1 THEN cos END) c1,
         |    max(CASE WHEN rank=2 THEN cos END) c2,
         |    max(CASE WHEN rank=3 THEN cos END) c3,
         |    max(CASE WHEN rank=4 THEN cos END) c4
         |  FROM rxy GROUP BY x_id
         |), mx AS (
         |  SELECT x_id, (coalesce(c1,0)+coalesce(c2,0)+coalesce(c3,0)
         |      +coalesce(c4,0)) /
         |    ((c1 IS NOT NULL)::int + (c2 IS NOT NULL)::int
         |      + (c3 IS NOT NULL)::int + (c4 IS NOT NULL)::int)::double
         |      AS mean_x
         |  FROM mxp
         |), myp AS (
         |  SELECT y_id,
         |    max(CASE WHEN rank=1 THEN cos END) c1,
         |    max(CASE WHEN rank=2 THEN cos END) c2,
         |    max(CASE WHEN rank=3 THEN cos END) c3,
         |    max(CASE WHEN rank=4 THEN cos END) c4
         |  FROM ryx GROUP BY y_id
         |), my AS (
         |  SELECT y_id, (coalesce(c1,0)+coalesce(c2,0)+coalesce(c3,0)
         |      +coalesce(c4,0)) /
         |    ((c1 IS NOT NULL)::int + (c2 IS NOT NULL)::int
         |      + (c3 IS NOT NULL)::int + (c4 IS NOT NULL)::int)::double
         |      AS mean_y
         |  FROM myp
         |), mut AS (
         |  SELECT a.x_id, a.y_id, a.cos
         |  FROM (SELECT x_id, y_id, cos FROM rxy WHERE rank=1) a
         |  JOIN (SELECT x_id, y_id FROM ryx WHERE rank=1) b
         |    USING (x_id, y_id)
         |)
         |SELECT mut.x_id, mut.y_id, mut.cos,
         |  (mut.cos / ((mean_x + mean_y) / 2)) AS margin
         |FROM mut JOIN mx USING (x_id) JOIN my USING (y_id)
         |WHERE (mut.cos / ((mean_x + mean_y) / 2)) >= 1.05
         |ORDER BY x_id""".stripMargin

  private lazy val marginMiningSql: String = marginSqlFrom(
    "SELECT * FROM e WHERE vec_id % 2 = 0",
    "SELECT * FROM e WHERE vec_id % 2 = 1")

  private lazy val marginIncrementalSql: String = marginSqlFrom(
    "SELECT * FROM e WHERE vec_id >= (SELECT c FROM cut)",
    "SELECT * FROM e WHERE vec_id < (SELECT c FROM cut)",
    pre = ", cut AS MATERIALIZED" +
      " (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings)")

  /** q117's oracle: codebook training (per-subspace unrolled k-means —
    * the kmCtes arithmetic over vector slices), encoding (argmin
    * assignment per subspace), the ADC stage-1 scan (per-query partial-
    * dot lookup tables, fixed-order sum p0 + p1 + …), and the exact
    * cosine re-rank — end-to-end in SQL, op for op with
    * [[graft.ops.Embed.pqTopK]]. */
  private lazy val pqAnnSql: String =
    baseCte + pqSqlFrom("e", s"q.vec_id < 5", excludeSelf = true)

  /** q120's oracle: the same end-to-end PQ replay with the codebooks
    * and codes trained on the OLD slice and the batch as the query
    * set — equivalence with the artifact-backed Spark run holds
    * because the artifacts ARE these frames, persisted. */
  // def, not val: the oracles map forces the lazy SQL vals during ITS
  // initialization, which can precede a later-declared val's
  private def cutOldCtes =
    """, cut AS MATERIALIZED (SELECT (max(vec_id) * 4) // 5 AS c FROM embeddings),
      |old AS MATERIALIZED (SELECT vec_id, v, nrm FROM e WHERE vec_id < (SELECT c FROM cut))""".stripMargin

  private lazy val pqIncrementalSql: String =
    baseCte + cutOldCtes +
      pqSqlFrom("old", "q.vec_id >= (SELECT c FROM cut)",
        excludeSelf = false)

  /** q124's exact side: each batch query's brute-force cosine top-5
    * over the old slice (the ground truth q123 is audited against). */
  private lazy val exactBatchTop5Sql: String =
    baseCte + cutOldCtes +
      s"""SELECT q_id, vec_id, cos, rank FROM (
         |  SELECT q.vec_id q_id, o.vec_id,
         |    (${duckDot("q.v", "o.v")} / (q.nrm * o.nrm)) AS cos,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${duckDot("q.v", "o.v")} / (q.nrm * o.nrm)) DESC, o.vec_id) rank
         |  FROM old o CROSS JOIN e q WHERE q.vec_id >= (SELECT c FROM cut)
         |) WHERE rank <= 5""".stripMargin

  /** q123's oracle: the q120 chain with the router trained on the OLD
    * slice (kmCtes over `old`), old codes carrying their cell, and the
    * approx stage restricted to each batch query's 2 probed cells. */
  private lazy val ivfPqIncrementalSql: String =
    baseCte + cutOldCtes + kmCtesFrom("old") +
      s""", cells AS MATERIALIZED (
         |  SELECT vec_id, cluster AS cell FROM (${kmFinalFrom("old")})
         |), probes AS MATERIALIZED (
         |  SELECT q_id, cid AS cell FROM (
         |    SELECT q.vec_id q_id, c.cid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${kmScoreSql("q.v", "c.cv", "c.cn")} DESC, c.cid) rnk
         |    FROM e q CROSS JOIN c$KmItersDefault c
         |    WHERE q.vec_id >= (SELECT c FROM cut)
         |  ) WHERE rnk <= 2
         |)""".stripMargin +
      pqSqlFrom("old", "q.vec_id >= (SELECT c FROM cut)",
        excludeSelf = false,
        probeJoin = "\n  JOIN cells ON cells.vec_id = k0.vec_id" +
          "\n  JOIN probes ON probes.q_id = t0.q_id" +
          " AND probes.cell = cells.cell")

  /** q122's oracle: the PQ chain with the approx stage restricted to
    * each query's probed cells — router trained by the standard kmCtes
    * (k = KmKDefault), cells assigned kmFinal-style, probes = top-2
    * cells per query by the same assignment score. */
  private lazy val ivfPqSql: String =
    baseCte + kmCtesFrom("e") +
      s""", cells AS MATERIALIZED (
         |  SELECT vec_id, cluster AS cell FROM (${kmFinalFrom("e")})
         |), probes AS MATERIALIZED (
         |  SELECT q_id, cid AS cell FROM (
         |    SELECT q.vec_id q_id, c.cid,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${kmScoreSql("q.v", "c.cv", "c.cn")} DESC, c.cid) rnk
         |    FROM e q CROSS JOIN c$KmItersDefault c WHERE q.vec_id < 5
         |  ) WHERE rnk <= 2
         |)""".stripMargin +
      pqSqlFrom("e", "q.vec_id < 5", excludeSelf = true,
        probeJoin = "\n  JOIN cells ON cells.vec_id = k0.vec_id" +
          "\n  JOIN probes ON probes.q_id = t0.q_id" +
          " AND probes.cell = cells.cell")

  /** The PQ chain (subspace k-means → codes → ADC → re-rank) over
    * source relation `src`, with queries = rows of `e` passing
    * `queryPred`. Appended after [[baseCte]] (+ any extra CTEs `src`
    * needs). `probeJoin` restricts the approx stage (extra JOIN
    * clauses against k0/t0 — the IVF routing of q122). */
  private def pqSqlFrom(src: String, queryPred: String,
      excludeSelf: Boolean, probeJoin: String = ""): String = {
    val m = PqMDefault
    val sub = Dim / m
    val subCtes = (0 until m).map { j =>
      val lo = j * sub + 1
      val hi = (j + 1) * sub
      def subNorm(v: String) =
        s"sqrt(list_reduce(list_prepend(0.0::double, list_transform($v, x -> x*x)), (acc, x) -> acc + x))"
      val frame =
        s""", s$j AS MATERIALIZED (
           |  SELECT vec_id, v[$lo:$hi] sv, ${subNorm(s"v[$lo:$hi]")} sn FROM $src
           |), s${j}c0 AS MATERIALIZED (
           |  SELECT vec_id AS cid, sv AS cv, sn AS cn FROM (
           |    SELECT vec_id, sv, sn, row_number() OVER (ORDER BY
           |      (('0x' || substr(md5(vec_id::varchar),1,15))::bigint % 2147483647), vec_id) rnk
           |    FROM s$j
           |  ) WHERE rnk <= $PqKsubDefault
           |)""".stripMargin
      val iters = (1 to KmItersDefault).map { it =>
        val prev = s"s${j}c${it - 1}"
        s""", s${j}a$it AS (
           |  SELECT vec_id, sv, cid FROM (
           |    SELECT s.vec_id, s.sv, c.cid,
           |      row_number() OVER (PARTITION BY s.vec_id
           |        ORDER BY ${kmScoreSql("s.sv", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM s$j s CROSS JOIN $prev c
           |  ) WHERE rnk = 1
           |), s${j}u$it AS (
           |  SELECT cid, i, sum(floor(sv[i] * $FpScale)::bigint) s, count(*) n
           |  FROM s${j}a$it CROSS JOIN range(1, ${sub + 1}) t(i)
           |  GROUP BY cid, i
           |), s${j}c$it AS MATERIALIZED (
           |  SELECT cid, cv, ${subNorm("cv")} cn
           |  FROM (
           |    SELECT cid, list(((s::double / n::double) / $FpScale) ORDER BY i) cv
           |    FROM s${j}u$it GROUP BY cid
           |  )
           |)""".stripMargin
      }.mkString
      val codeAndTab =
        s""", s${j}code AS MATERIALIZED (
           |  SELECT vec_id, cid FROM (
           |    SELECT s.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY s.vec_id
           |        ORDER BY ${kmScoreSql("s.sv", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM s$j s CROSS JOIN s${j}c$KmItersDefault c
           |  ) WHERE rnk = 1
           |), s${j}tab AS MATERIALIZED (
           |  SELECT q.vec_id q_id, c.cid, ${duckDot(s"q.v[$lo:$hi]", "c.cv")} part
           |  FROM e q CROSS JOIN s${j}c$KmItersDefault c WHERE $queryPred
           |)""".stripMargin
      frame + iters + codeAndTab
    }.mkString
    val partSum = (0 until m).map(j => s"t$j.part").mkString(" + ")
    val lookupJoins = (1 until m).map(j =>
      s"\n  JOIN s${j}code k$j ON k$j.vec_id = k0.vec_id" +
      s"\n  JOIN s${j}tab t$j ON t$j.cid = k$j.cid AND t$j.q_id = t0.q_id")
      .mkString
    val selfClause =
      if (excludeSelf) "\n  WHERE k0.vec_id <> t0.q_id" else ""
    subCtes +
      s""", approx AS (
         |  SELECT t0.q_id, k0.vec_id, ($partSum) approx
         |  FROM s0code k0
         |  JOIN s0tab t0 ON t0.cid = k0.cid$lookupJoins$probeJoin$selfClause
         |), cand AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id) rnk
         |    FROM approx
         |  ) WHERE rnk <= $RerankCDefault
         |), qe AS (SELECT q.vec_id q_id, q.v qv, q.nrm qn FROM e q WHERE $queryPred),
         |rer AS (
         |  SELECT c.q_id, c.vec_id, (${duckDot("q.qv", "ee.v")} / (q.qn * ee.nrm)) AS cos
         |  FROM cand c JOIN e ee ON ee.vec_id = c.vec_id JOIN qe q ON q.q_id = c.q_id
         |)
         |SELECT q_id, vec_id, cos, rank FROM (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
         |  FROM rer
         |) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** q46's full oracle SQL — also the `approx` CTE of q70. */
  private lazy val ivfAnnSql: String =
      (baseCte +
        s""", cents AS (SELECT vec_id cid, v cv, nrm cn FROM e WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, v, nrm, cid, ${duckCos("v", "nrm", "cv", "cn")} AS sim,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY ${duckCos("v", "nrm", "cv", "cn")} DESC, cid) rnk
           |  FROM e CROSS JOIN cents
           |), cells AS (
           |  SELECT vec_id, v, nrm, cid AS cell FROM assign WHERE rnk = 1
           |), q AS (
           |  SELECT vec_id q_id, v qv, nrm qn FROM cells WHERE vec_id < 5
           |), probes AS (
           |  SELECT q_id, qv, qn, cell FROM (
           |    SELECT q.q_id, q.qv, q.qn, c.cid AS cell,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY ${duckCos("q.qv", "q.qn", "c.cv", "c.cn")} DESC, c.cid) rnk
           |    FROM q CROSS JOIN cents c
           |  ) WHERE rnk <= 2
           |), scored AS (
           |  SELECT p.q_id, s.vec_id, ${duckCos("p.qv", "p.qn", "s.v", "s.nrm")} AS cos
           |  FROM probes p JOIN cells s ON s.cell = p.cell
           |  WHERE s.vec_id <> p.q_id
           |)
           |SELECT q_id, vec_id, cos, rank FROM (
           |  SELECT q_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) rank
           |  FROM scored
           |) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)
}
