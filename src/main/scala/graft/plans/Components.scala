package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the step that
  * turns near-duplicate PAIRS (text q27/q29, embedding q31) into
  * actionable dedup CLUSTERS and keep-lists (q53, q60).
  *
  * Algorithm: iterative min-label propagation accelerated by POINTER
  * DOUBLING. Each round (1) propagates the minimum label one edge hop
  * (equi-join edge list against labels + MIN aggregate), then (2) jumps
  * every label to its label's own label through a second join on the
  * label table, halving label-chain lengths — so a diameter-d component
  * converges in O(log d) rounds, the PRAM pointer-jumping bound, same
  * asymptotics as large-star/small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) with one
  * extra equi-join on the (tiny, post-blocking) label table as the
  * whole cost. Plain propagation alone is O(d) — one full join pass per
  * hop on deep chain components (templated page families, boilerplate
  * ladders).
  *
  * Scale (100 TB): every join here runs on data the size of the PAIR
  * set, never the corpus — that is the point of LSH/banding upstream.
  * Each iteration materializes exactly once via an eager
  * `localCheckpoint` (reliable `checkpoint()` on a real cluster), so
  * iteration N's failure-recovery lineage never reaches back through N
  * joins, and the convergence count scans the checkpointed partitions
  * with no recompute.
  */
object Components {

  /** Rounds the last [[minLabel]] run took — observability hook for the
    * O(log diameter) convergence bound (pinned by DedupGuardSpec). */
  @volatile var lastIterations: Int = 0

  /** Labels every node of the undirected pair graph with its component's
    * MINIMUM id. `pairs`: one row per edge, two id columns (either
    * orientation; symmetrized here). Returns (id, lbl). */
  def minLabel(pairs: DataFrame): DataFrame = {
    val edges = pairs.toDF("d1", "d2")
    val sym = edges.unionByName(
        edges.select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint() // eager: upstream pair derivation runs exactly
      // once; every iteration's lineage is truncated here
    var labels = sym.select(col("d1").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0) {
      // Past 100 rounds something is wrong with the input (pointer
      // doubling would need a component diameter over ~2^100): failing
      // loudly beats spinning.
      iter += 1
      require(iter <= 100,
        "component label propagation exceeded 100 iterations")
      // self rows carry the old label through the same aggregate, so
      // convergence needs no extra join: changed ⟺ some node's
      // min(neighbors+self+jump) beat its old own label
      val prop = sym.join(labels, sym("d2") === labels("id"))
        .select(sym("d1").as("id"), col("lbl"), lit(0).as("self"))
      val hop = labels.withColumn("self", lit(1)).unionByName(prop)
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"),
          min(when(col("self") === 1, col("lbl"))).as("old"))
      // pointer double against the CURRENT labels: lbl is always an id
      // present in `labels` (labels cover every edge endpoint and
      // min-propagation stays inside the component), and labels only
      // ever decrease, so jumping through the previous round's table is
      // safe — the convergence test is unaffected because a jump that
      // finds anything smaller also decreases `lbl` below `old`.
      val jump = labels
        .select(col("id").as("via"), col("lbl").as("lbl2"))
      val next = hop.join(jump, hop("lbl") === jump("via"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl"),
          col("old"))
        .localCheckpoint()
      changed = next.where(col("lbl") < col("old")).count()
      labels = next.select(col("id"), col("lbl"))
    }
    lastIterations = iter
    labels
  }

  /** [[minLabel]] plus per-component sizes: (id, keep_id, cluster_size)
    * where keep_id is the component minimum — the canonical dedup
    * keep-list shape shared by q53 and q60. */
  def keepList(pairs: DataFrame): DataFrame = {
    val labels = minLabel(pairs)
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("id"), col("lbl").as("keep_id"), col("cluster_size"))
  }
}
