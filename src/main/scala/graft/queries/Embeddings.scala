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
    Graft.parquetSource(s, dir).table("embeddings")
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        sqrt(dotNative(col("v"), col("v"))).as("nrm"))

  /** (q_id, vec_id, cos) → top-k per q_id via the mergeable TopK
    * Aggregator: each task keeps a k-row buffer and only those k rows
    * shuffle per (q_id, task) — vs `row_number() OVER (PARTITION BY
    * q_id)`, which shuffles EVERY scored corpus row into |queries|
    * partitions and sorts the whole corpus inside a handful of straggler
    * tasks. With 5 query vectors at 100× corpus scale the window shape is
    * 5 tasks sorting everything; this shape is a partial-agg whose shuffle
    * volume is k·|tasks| rows, independent of corpus size. */
  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
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

  /** Session-level memo of [[computeAnnPairs]] results, keyed by
    * (session, dir). Same producer/consumer convention as
    * [[TextPipeline]]'s pair memo: q31 (the DETECTOR) always recomputes
    * and refreshes the entry — its benchmarked cost is the real
    * pipeline — while q60 (the dedup CONSUMER) reuses the session's last
    * computation, so detect-then-dedup sessions pay the LSH pipeline
    * once. Entries are localCheckpoint-materialized with no cached
    * catalog tables left behind. */
  private val annMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def clearAnnMemo(): Unit = annMemo.clear()

  /** Physical plan of q46's last cell-assignment aggregate, captured for
    * plan-quality tests (the assignment runs eagerly inside the
    * localCheckpoint, so it no longer appears in q46's returned plan). */
  @volatile private[graft] var lastCellPlan: String = ""

  /** Physical plan of q78's last index-probe join, captured for the
    * plan test that proves the cell-partitioned artifact scan is
    * partition-pruned to the probed cells. */
  @volatile private[graft] var lastIncrementalAnnPlan: String = ""

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
    "q30_cosine_topk" -> ((s, dir) => {
      val e = normalized(s, dir)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("nrm")))
            .as("cos"))
      topkPerQuery(scored, 10)
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
    // table (cut pushed to the scan, plan-pinned); batch-proportional
    // broadcast of the probe set is the test-scale shape — a 100 TB
    // deployment shuffles probes by cell instead, same pruned scan.
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
      val scoredLazy = idx.join(broadcast(probes), "cell")
        .select(col("q_id"), col("vec_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("nrm")))
            .as("cos"))
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
    "q70_ann_recall" -> ((s, dir) => {
      val exact = defs("q30_cosine_topk")(s, dir)
        .where(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint() // ≤ 5 rows per query; read by hits AND qids
      val approx = defs("q46_ivf_ann")(s, dir)
        .select(col("q_id"), col("vec_id"))
      val hits = exact.join(approx, Seq("q_id", "vec_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
      exact.select(col("q_id")).distinct()
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(5.0d))
            .as("recall"))
        .orderBy("q_id")
    })
  )

  // ---------------------------------------------------------------- oracle

  /** DuckDB left-fold dot product — same IEEE op order as [[dot]]. */
  private def duckDot(a: String, b: String): String =
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
  private def duckCos(a: String, na: String, b: String, nb: String): String =
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

  val oracles: Map[String, String] = Map(
    "q30_cosine_topk" -> cosineTopkSql,

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
