package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Public curation operators: deterministic token-budget cuts, quality
  * filtering, and hash-range splits/mixes — the "cut a training mix"
  * family. Everything is content-hash deterministic (no rand()):
  * reproducible at any parallelism, restartable, engine-portable.
  */
object Curate {

  /** q66's keep conjunction as one codegen predicate over raw text —
    * compose it into a scan filter (`docs.where(qualityKeep(col))`). */
  def qualityKeep(text: Column): Column = {
    val nw = wordCount(text)
    val swr = size(regexp_extract_all(text,
        lit("\\b(the|a|of|and|is)\\b"), lit(0))).cast("double") /
      nw.cast("double")
    nw >= 20 && nw <= 1000 &&
      meanWordLen(text) >= 3.0d && meanWordLen(text) <= 5.0d &&
      punctRatio(text) <= 0.3d && swr >= 0.02d
  }

  /** Keep only documents passing the C4-style quality battery. */
  def qualityFilter(docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.where(qualityKeep(col(textCol)))

  /** Deterministic hash-range train/val/test split: appends a `split`
    * column ("train" below `trainPct`, "val" below `trainPct+valPct`,
    * else "test") keyed on the content hash — a document's split never
    * changes under repartitioning or reprocessing. */
  def hashSplit(docs: DataFrame, textCol: String = "text",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = pmod(hash60(col(textCol)), lit(100L))
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** LEAKAGE-SAFE train/val/test split — [[hashSplit]]'s fatal flaw
    * at eval time is that near-duplicate documents hash to different
    * splits (their text differs by a word), silently leaking training
    * content into the test set. This op splits on the DEDUP-CLUSTER
    * representative instead: `clusters` is any (<id>, keep_id) frame
    * ([[graft.ops.Dedup.cascade]]'s verdict, or q53's components), and
    * every member of a cluster lands in its representative's split —
    * near-dups can never straddle the train/test boundary. Documents
    * absent from `clusters` split on their own id (singleton
    * clusters). Output: (<id>, keep_id, split), the same
    * hash-range rule as [[hashSplit]] keyed on keep_id — a document's
    * split never changes under repartitioning or reprocessing.
    *
    * Scale shape: one narrow hash join (id → keep_id) and a
    * projection; the split decision is a codegen'd hash of the
    * representative id. The clusters side is collapsed to one row per
    * member id first (deterministic min keep_id — a map-side-combinable
    * aggregate at cluster-frame grain), so a malformed frame can never
    * fan the join out; no shuffle beyond that aggregate and the join. */
  def leakSafeSplit(docs: DataFrame, clusters: DataFrame,
      trainPct: Int = 80, valPct: Int = 10,
      idCol: String = "doc_id"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"percentages must be nonnegative with train+val <= 100 " +
        s"(got $trainPct/$valPct)")
    // ids keep their own type (string/UUID ids are valid cluster
    // keys — a forced long cast would null them out and silently
    // defeat the split); incompatible docs/clusters id types fail
    // ANALYSIS in the coalesce instead of degrading at runtime.
    // Collapse to ONE row per member id (deterministic min keep_id):
    // a malformed clusters frame with duplicate member rows would
    // otherwise fan out the left join and emit one doc under several
    // keep_ids/splits — exactly the leakage this op exists to prevent.
    val c = clusters.select(col(idCol).as("__cid"),
        col("keep_id").as("__keep"))
      .groupBy(col("__cid")).agg(min(col("__keep")).as("__keep"))
    val bucket = pmod(hash60(col("keep_id").cast("string")), lit(100L))
    docs.select(col(idCol))
      .join(c, col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        coalesce(col("__keep"), col(idCol)).as("keep_id"))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Per-key frequency cap — the "at most n documents per domain"
    * curation rule of web-corpus building (over-crawled domains
    * otherwise dominate the mix): keeps a deterministic, uniform
    * n-document sample per key, chosen by content-independent hash
    * priority (house hash of the id — reproducible under reprocessing,
    * no rand()). Rides the mergeable bounded TopK aggregate: map-side
    * partial top-n per key, ≤ n·|tasks| rows shuffle per key — never
    * the full-partition sort a `row_number() <= n` window pays, which
    * at 100 TB is the difference between shuffling n rows per domain
    * and sorting every row. Output: one row per KEPT document —
    * (<key>, <id>, keep_rank), keep_rank 1..n in priority order. */
  def capPerKey(docs: DataFrame, n: Int, keyCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"per-key cap must be >= 1 (got $n)")
    val idType = docs.schema(idCol).dataType.toString
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType")
        .contains(idType),
      s"$idCol must be an integral id column, got $idType")
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopK.TopKAgg(n),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        graft.functions.TopK.Scored]())
    val pri = hash60(col(idCol).cast("string")) % lit(2147483647L)
    docs.select(col(keyCol), col(idCol).cast("long").as("__id"),
        pri.as("__pri"))
      // smallest priority first: TopKAgg orders score DESC, id ASC
      .groupBy(col(keyCol))
      .agg(topk((-col("__pri")).cast("double"), col("__id"),
        lit(0L), lit(0L), lit(0L)).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("i", "r")))
      // cast the exploded id back to the INPUT id type (the TopK key is
      // long internally) so kept ids round-trip against the source frame
      // without implicit widening
      .select(col(keyCol),
        col("r.k1").cast(docs.schema(idCol).dataType).as(idCol),
        (col("i") + 1).cast("long").as("keep_rank"))
  }

  /** Per-key kept-count frame — the ≤|keys|-row artifact the
    * incremental cap ([[capPerKeyAppend]]) scores batches against:
    * how many documents [[capPerKey]] keeps per key at the snapshot.
    * Single definition: the q119 artifact builder ensures through this,
    * so the public API and the verified query cannot drift. */
  def capCounts(docs: DataFrame, n: Int, keyCol: String = "source",
      idCol: String = "doc_id"): DataFrame =
    capPerKey(docs, n, keyCol, idCol)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_kept"))

  /** Incremental per-key cap — [[capPerKey]] as the crawl loop runs it:
    * documents kept at the snapshot STAY kept (the q115 append-only
    * discipline — re-running the global cap over old∪batch could evict
    * already-committed documents, rewriting downstream state), so a
    * batch competes only for each key's REMAINING slots: batch docs
    * rank among themselves by the same hash priority and keep while
    * `n_kept(old) + rank <= n`, with keep_rank continuing the
    * snapshot's numbering. The deliberate divergence from a full
    * re-cap is first-come-first-served across epochs (hash-uniform
    * within each); a re-snapshot restores the uniform global sample.
    * Cost per batch: one batch scan + a ≤|keys|-row broadcast — the
    * old corpus contributes via the count artifact only. A key unseen
    * at snapshot time starts at 0. Output: kept batch rows only —
    * (<key>, <id>, keep_rank). */
  def capPerKeyAppend(batch: DataFrame, counts: DataFrame, n: Int,
      keyCol: String = "source", idCol: String = "doc_id"): DataFrame =
    capPerKey(batch, n, keyCol, idCol)
      .withColumnRenamed("keep_rank", "__brnk")
      // null-safe (<=>) so a NULL-key domain — one group under capPerKey's
      // groupBy — matches its counts row instead of restarting at base 0
      // every batch and exceeding the cap across epochs
      .join(broadcast(counts.select(col(keyCol).as("__ck"),
        col("n_kept").as("__base"))), col(keyCol) <=> col("__ck"), "left")
      .withColumn("__b0", coalesce(col("__base"), lit(0L)))
      .where(col("__b0") + col("__brnk") <= n)
      .select(col(keyCol), col(idCol),
        (col("__b0") + col("__brnk")).as("keep_rank"))

  /** Curriculum ordering — turn any per-document difficulty signal
    * into a training order (easy → hard, Bengio et al., ICML 2009):
    * every document gets its EXACT global difficulty rank in the
    * (score, id) total order, NTILE-partitions into `nBuckets`
    * curriculum stages (SQL-standard ntile: the first `N mod n`
    * buckets take one extra row), and a deterministic WITHIN-bucket
    * shuffle position by content-independent hash priority (the
    * [[capPerKey]] house hash — reproducible under reprocessing, no
    * rand(); training wants difficulty ORDER between stages but
    * decorrelated order inside one). `ascending = false` ranks the
    * highest score first (e.g. Flesch reading-ease, where high =
    * easy). Null scores are the caller's to exclude — range
    * partitioning and the oracle disagree on null order.
    *
    * Scale shape: both levels use the q145 two-level global-rank
    * discipline — a range repartition on the total order, ONE
    * per-partition window (each task sorts its own partition, never
    * the corpus), and a metadata-grain driver read for the offsets
    * (≤ |partitions| + `nBuckets` rows); no single-partition global
    * window, no per-bucket giant window (a bucket at 100 TB is
    * corpus/n — far beyond one task). Ranks and buckets are
    * boundary-invariant (offset + within-partition position in one
    * total order), so output is deterministic under any range
    * sampling. Output: (<id>, <score>, rank, bucket, ord). */
  def curriculum(scored: DataFrame, nBuckets: Int = 4,
      scoreCol: String = "score", idCol: String = "doc_id",
      ascending: Boolean = true): DataFrame = {
    require(nBuckets >= 1, s"need nBuckets >= 1 (got $nBuckets)")
    val s = scored.sparkSession
    val np = s.sparkContext.defaultParallelism
    val sortKey =
      if (ascending) Seq(col("__s").asc, col("__id").asc)
      else Seq(col("__s").desc, col("__id").asc)
    val p = scored
      .select(col(idCol).as("__id"), col(scoreCol).as("__s"))
      .repartitionByRange(np, sortKey: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pins pid; read by the counts and the ranks
    val counts = p.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)) // ≤ np rows
    val n = counts.map(_._2).sum
    val offsets = counts.sortBy(_._1)
      .scanLeft((0, 0L, 0L)) { case ((_, acc, _), (pid, c)) =>
        (pid, acc + c, acc) }.drop(1).map(t => (t._1, t._3))
    import s.implicits._
    val offDf = offsets.toSeq.toDF("pid", "off")
    val w = Window.partitionBy(col("pid")).orderBy(sortKey: _*)
    val rem = n % nBuckets
    val qq = n / nBuckets
    // SQL-standard NTILE from the exact global rank: first `rem`
    // buckets hold qq+1 rows, the rest qq (exact integer div — when
    // qq = 0 every bucket holds ≤ 1 row and rank IS the bucket)
    val bucket =
      if (qq == 0L) col("rank")
      else when(col("rank") <= rem * (qq + 1),
          expr(s"CAST((rank - 1) div ${qq + 1} AS BIGINT) + 1"))
        .otherwise(expr(
          s"CAST((rank - 1 - ${rem * (qq + 1)}) div $qq AS BIGINT) + ${rem + 1}"))
    val ranked = p.join(broadcast(offDf), Seq("pid"))
      .withColumn("rank", row_number().over(w).cast("long") + col("off"))
      .withColumn("bucket", bucket)
      .withColumn("__pri",
        hash60(col("__id").cast("string")) % lit(2147483647L))
      .select(col("__id"), col("__s"), col("rank"), col("bucket"),
        col("__pri"))
    // second level: within-bucket hash-shuffle positions, same
    // discipline keyed by (bucket, partition) — a range partition can
    // straddle a bucket boundary, so offsets accumulate per bucket
    val p2 = ranked
      .repartitionByRange(np, col("bucket").asc, col("__pri").asc,
        col("__id").asc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts2 = p2.groupBy(col("pid"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // ≤ |partitions| + nBuckets rows (ranges are contiguous)
    val off2 = counts2.groupBy(_._2).toSeq.flatMap { case (b, rows) =>
      rows.sortBy(_._1)
        .scanLeft((0, b, 0L, 0L)) { case ((_, _, acc, _), (pid, _, c)) =>
          (pid, b, acc + c, acc) }.drop(1)
        .map(t => (t._1, t._2, t._4))
    }
    val off2Df = off2.toDF("pid", "bucket", "boff")
    val w2 = Window.partitionBy(col("pid"), col("bucket"))
      .orderBy(col("__pri").asc, col("__id").asc)
    p2.join(broadcast(off2Df), Seq("pid", "bucket"))
      .withColumn("ord", row_number().over(w2).cast("long") + col("boff"))
      .select(col("__id").as(idCol), col("__s").as(scoreCol),
        col("rank"), col("bucket"), col("ord"))
  }

  /** Deterministic sequence packing — the concat-and-chunk layout step
    * of LLM pretraining: documents are content-hash-sharded, ordered
    * deterministically within each shard (hash, then id), laid out on a
    * per-shard token-offset axis, and assigned pack_id = start_off div
    * `seqLen`. Each shard packs independently (one window partition =
    * one task), so packing 100 TB is embarrassingly parallel, and the
    * layout is reproducible from the data alone — no rand(),
    * restart-stable. `shards` is the parallelism knob: grow it with the
    * corpus so each packing window sorts a bounded slice. Output:
    * (<id>, shard, n_tokens, start_off, pack_id). */
  def pack(docs: DataFrame, seqLen: Int = 512, shards: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    val w = Window.partitionBy("shard").orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), bpeTokenCount(col(textCol)).as("n_tokens"),
        hash60(col(textCol)).as("h"))
      .withColumn("shard", col("h") % shards)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        expr(s"(cum - n_tokens) div $seqLen").as("pack_id"))
  }

  /** Frozen per-shard tail offsets — what a crawl loop PERSISTS per
    * snapshot so the next batch packs APPEND-ONLY after the existing
    * layout ([[packAppend]]): (shard, tail), ≤ `shards` rows at any
    * corpus size. */
  def packTailFrame(docs: DataFrame, shards: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(shards > 0, "shards must be positive")
    // DENSE output — one row per shard 0..shards-1, 0 for untouched
    // shards — so the frame carries its own shard count and
    // [[packAppend]] can reject a tails frame built under a different
    // modulus instead of silently colliding offsets
    val s = docs.sparkSession
    val all = s.range(shards).select(col("id").as("shard"))
    val agg = docs
      .select(bpeTokenCount(col(textCol)).as("n_tokens"),
        (hash60(col(textCol)) % shards).as("shard"))
      .groupBy(col("shard"))
      .agg(sum(col("n_tokens")).cast("long").as("tail"))
    all.join(agg, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("tail"), lit(0L)).as("tail"))
  }

  /** Append-only packing of a batch after FROZEN per-shard tails: the
    * snapshot's shards are never rewritten (their docs keep their
    * offsets and pack ids — restart/resume stability), and the batch
    * lays out in its own deterministic (hash, id) order starting at
    * each shard's frozen tail (an empty shard starts at 0). This is
    * deliberately NOT what [[pack]] over old∪batch would produce —
    * re-sorting would rewrite 100 TB of settled layout to admit a
    * batch; append-only is the deployment semantics. Output:
    * (<id>, shard, n_tokens, start_off, pack_id). */
  def packAppend(batch: DataFrame, tails: DataFrame, seqLen: Int = 512,
      shards: Int = 32, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    // a tails frame built under a DIFFERENT modulus would silently
    // collide batch offsets with the settled layout; packTailFrame is
    // dense (one row per shard), so the row count IS its modulus
    val nTails = tails.count()
    require(nTails == shards,
      s"tails frame carries $nTails shards but packAppend got " +
        s"shards=$shards — rebuild packTailFrame with the same modulus")
    val w = Window.partitionBy("shard").orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    batch.select(col(idCol), bpeTokenCount(col(textCol)).as("n_tokens"),
        hash60(col(textCol)).as("h"))
      .withColumn("shard", col("h") % shards)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .join(broadcast(tails), Seq("shard"), "left")
      .select(col(idCol), col("shard"), col("n_tokens"),
        (coalesce(col("tail"), lit(0L)) + col("cum") - col("n_tokens"))
          .as("start_off"),
        expr(s"(coalesce(tail, 0) + cum - n_tokens) div $seqLen")
          .as("pack_id"))
  }

  /** Deterministic global token-budget cut: take documents in stable
    * content-hash order until the cumulative token count passes
    * `budget`. Built as a two-level distributed prefix sum — shard by
    * the top hash bits (shard order ≡ hash order), cumsum per shard at
    * full parallelism, add per-shard offsets from the ≤ shards-row
    * totals frame (metadata-grade driver work); shards whose offset
    * already exceeds the budget are pruned BEFORE the window, so a
    * small budget over a 100 TB corpus sorts ~one shard. Output:
    * (<id>, n_tokens, cum), ordered by cum. */
  /** Per-source token budgets — the MIXTURE EXECUTOR: a training mix
    * is specified as "so many tokens from each source", and this op
    * cuts the corpus to exactly that spec with [[tokenBudget]]'s
    * deterministic hash-order discipline applied per source (stable
    * under re-crawls: a document's keep/drop decision moves only if
    * its source's budget or the hash-earlier document set changes).
    * Sources absent from `budgets` are dropped entirely. Output:
    * (<id>, <src>, n_tokens, cum) with `cum` the within-source
    * cumulative token count in (hash, id) order; cum ≤ budget(src).
    *
    * Scale shape: the same two-level prefix sum as [[tokenBudget]],
    * at (source, shard) grain — ONE pass computes per-shard token
    * totals (map-side combinable; the driver reads ≤ |budgeted
    * sources|·shards rows, metadata grain — size `shards0` down if
    * the budget spec is huge), shard offsets make every kept-shard
    * window independent, and each window sorts one shard of one
    * source. No global sort, no per-source corpus sort — the window
    * grain is (source, shard). */
  def sourceBudget(docs: DataFrame, budgets: Map[String, Long],
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source", shards0: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "sourceBudget needs at least one budget")
    val s = docs.sparkSession
    val nShards = {
      val want = (if (shards0 > 0) shards0
        else s.sparkContext.defaultParallelism).max(1).min(1 << 24)
      Integer.highestOneBit(want * 2 - 1)
    }
    val shardBits = Integer.numberOfTrailingZeros(nShards)
    import s.implicits._
    val budDf = budgets.toSeq.map { case (k, v) => (k, v.max(0L)) }
      .toDF("src", "budget")
    val base = docs
      .select(col(idCol).as("doc_id"), col(srcCol).as("src"),
        bpeTokenCount(col(textCol)).cast("long").as("n_tokens"),
        hash60(col(textCol)).as("h"))
      .join(broadcast(budDf), Seq("src"))
      .withColumn("shard", shiftright(col("h"), 60 - shardBits))
    val totals = base.groupBy(col("src"), col("shard"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect() // ≤ |budgeted sources|·nShards rows — metadata grain
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val offsets = for {
      src <- totals.keys.map(_._1).toSeq.distinct
      sh <- 0 until nShards
    } yield (src, sh.toLong,
      (0 until sh).map(p => totals.getOrElse((src, p.toLong), 0L)).sum)
    val kept = offsets.filter { case (src, _, off) =>
      off <= budgets(src).max(0L)
    }
    val offDf = kept.toDF("src", "shard", "off")
    val w = Window.partitionBy(col("src"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("src", "shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w) + col("off"))
      .where(col("cum") <= col("budget"))
      .select(col("doc_id").as(idCol), col("src").as(srcCol),
        col("n_tokens"), col("cum"))
  }

  def tokenBudget(docs: DataFrame, budget0: Long, idCol: String = "doc_id",
      textCol: String = "text", shards0: Int = 0): DataFrame = {
    val s = docs.sparkSession
    // negative budgets clamp to 0 (empty result) rather than leaving
    // the kept-shard prefix empty and crashing the max below; the
    // shard count is bounded before the power-of-two rounding so
    // want*2-1 cannot overflow Int
    val budget = budget0.max(0L)
    val nShards = { // next power of two ⇒ the shard key is a bit-prefix
      val want = (if (shards0 > 0) shards0
        else s.sparkContext.defaultParallelism).max(1).min(1 << 24)
      Integer.highestOneBit(want * 2 - 1)
    }
    val shardBits = Integer.numberOfTrailingZeros(nShards)
    val base = docs.select(col(idCol).as("doc_id"),
        bpeTokenCount(col(textCol)).cast("long").as("n_tokens"),
        hash60(col(textCol)).as("h"))
      // hash60 is 60 bits; the top shardBits bits are monotone in h, so
      // (shard, h, doc_id) order ≡ global (h, doc_id) order
      .withColumn("shard", shiftright(col("h"), 60 - shardBits))
    val totals = base.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect() // ≤ nShards rows — metadata, same grain as O7's
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until nShards).map { sh =>
      (sh.toLong, (0 until sh).map(p => totals.getOrElse(p.toLong, 0L)).sum)
    }
    // offsets are monotone ⇒ budget-reachable shards are a prefix
    val kept = offsets.filter(_._2 <= budget)
    val maxShard = kept.map(_._1).max // shard 0 has offset 0 ≤ budget
    import s.implicits._
    val offDf = kept.toDF("shard", "off")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.where(col("shard") <= maxShard)
      .join(broadcast(offDf), "shard")
      .withColumn("cum", sum(col("n_tokens")).over(w) + col("off"))
      .where(col("cum") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("cum"))
      .orderBy("cum", "doc_id")
      .withColumnRenamed("doc_id", idCol)
  }

  /** Epoch schedule under a total token budget — the data-constrained
    * scaling allocator (Muennighoff et al., "Scaling Data-Constrained
    * Language Models", arXiv:2305.16264: repeating data beyond a few
    * epochs stops helping, so budget allocation must CAP each source
    * at maxEpochs · its unique tokens and re-route the overflow):
    * each source's target is its weight share of the budget; any
    * source whose target exceeds its cap is frozen AT the cap and the
    * remaining budget water-fills into the still-uncapped sources by
    * the same weights, round by round, until a round caps nothing new
    * (≤ |sources| rounds). The answer is the question every
    * data-constrained run asks: how many epochs of each source.
    *
    * Engine grade: all arithmetic is exact integer — per round the
    * active share is (remaining · w_i) div (Σ active w), floor; the
    * sub-|active| floor dust of the final round stays unallocated
    * rather than introducing a float; loud BigInt requires reject
    * 64-bit overflow instead of wrapping. Deterministic under any
    * partitioning (per-source totals are map-side-combinable sums;
    * the waterfall is a driver loop over a sorted array).
    *
    * `weights` is any (srcCol, wCol) frame of nonnegative integer
    * weights (e.g. [[mixtureWeights]]'s s_fp, or hand-set
    * priorities); sources missing from it get weight 0 and receive
    * nothing. Output: (<src>, unique_tokens, weight, cap_tokens,
    * alloc_tokens, epochs_ppm = alloc·10^6 div unique, capped).
    *
    * Scale shape: ONE corpus-scale map-side-combinable pass (the
    * per-source token count); the waterfall then runs driver-side on
    * the ≤|sources| row table (metadata grain — the kmeans-centroid
    * class of driver-adjacent smallness). */
  def epochSchedule(docs: DataFrame, weights: DataFrame, budget: Long,
      maxEpochs: Long = 4L, srcCol: String = "source",
      textCol: String = "text", wCol: String = "w"): DataFrame = {
    require(budget >= 0L, s"need budget >= 0 (got $budget)")
    require(maxEpochs >= 1L, s"need maxEpochs >= 1 (got $maxEpochs)")
    require(budget <= Long.MaxValue / 1000000L,
      s"epochSchedule 64-bit ppm bound: budget $budget * 10^6 would " +
        "overflow — allocate in larger units")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs
      .groupBy(col(srcCol).as("src"))
      .agg(sum(bpeTokenCount(col(textCol)).cast("long")).as("toks"))
      .join(weights.select(col(srcCol).as("src"),
        col(wCol).cast("long").as("w")), Seq("src"), "left")
      .na.fill(0L, Seq("w"))
      .collect() // ≤ |sources| rows — metadata grain
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.forall(_._3 >= 0L), "weights must be nonnegative")
    val maxW = rows.foldLeft(0L)((m, r) => math.max(m, r._3))
    require(maxW == 0L ||
        BigInt(budget) * BigInt(maxW) <= BigInt(Long.MaxValue),
      s"epochSchedule 64-bit share bound: budget·maxWeight " +
        s"($budget · $maxW) overflows — rescale the weights down")
    require(rows.foldLeft(BigInt(0))(_ + _._3) <= BigInt(Long.MaxValue),
      "epochSchedule 64-bit weight-sum bound: Σ weights overflows — " +
        "rescale the weights down")
    rows.foreach { case (s0, c, _) =>
      require(c <= Long.MaxValue / maxEpochs,
        s"cap overflow for source $s0") }
    val n = rows.length
    val src = rows.map(_._1); val c = rows.map(_._2)
    val w = rows.map(_._3)
    val cap = c.map(_ * maxEpochs)
    val alloc = Array.fill(n)(0L)
    val active = Array.tabulate(n)(i => w(i) > 0L)
    var done = false
    var rounds = 0
    while (!done && rounds <= n) {
      val act = (0 until n).filter(active)
      val bigW = act.foldLeft(0L)((s0, i) => s0 + w(i)) // Σw ≤ n·maxW
      val r = budget - alloc.sum
      if (act.isEmpty || bigW == 0L || r <= 0L) done = true
      else {
        val share = act.map(i => r * w(i) / bigW)
        val newly = act.zip(share)
          .filter { case (i, s0) => alloc(i) + s0 >= cap(i) }
        if (newly.isEmpty) {
          act.zip(share).foreach { case (i, s0) => alloc(i) += s0 }
          done = true
        } else newly.foreach { case (i, _) =>
          alloc(i) = cap(i); active(i) = false }
      }
      rounds += 1
    }
    (0 until n).map { i =>
      (src(i), c(i), w(i), cap(i), alloc(i),
        if (c(i) == 0L) 0L else alloc(i) * 1000000L / c(i),
        alloc(i) == cap(i))
    }.toDF(srcCol, "unique_tokens", "weight", "cap_tokens",
      "alloc_tokens", "epochs_ppm", "capped")
  }

  /** Temperature-scaled domain mixture weights — the sampling-weight
    * solver behind multi-source training mixes (the p_i^α
    * renormalization of multilingual/multi-domain sampling, Conneau &
    * Lample, "Cross-lingual Language Model Pretraining",
    * arXiv:1901.07291 §3.1): per-key token counts c_i become weights
    * w_i = c_i^α / Σ_j c_j^α. α=1 reproduces the natural token
    * distribution, α→0 flattens toward uniform; α is restricted to
    * {0, 0.5, 1} so every step stays engine-exact — c_i^0.5 is ONE
    * IEEE sqrt (correctly rounded everywhere, unlike pow/ln), scaled
    * by 2^20 (exact — exponent shift) and floored into a 20-bit
    * fixed-point integer `s_fp`; the denominator is then an EXACT
    * integer sum (no float accumulation order anywhere) and each
    * weight one final IEEE division. General α needs pow(), whose
    * last-ulp behavior is libm-specific — callers wanting α=0.3
    * accept engine drift or precompute client-side.
    *
    * Scale shape: the per-key count is one map-side-combinable pass
    * over the corpus; everything after runs on the ≤|keys| table.
    * Output: (<key>, n_tokens, s_fp, weight), one row per key. */
  def mixtureWeights(docs: DataFrame, alpha: Double = 0.5d,
      keyCol: String = "source", textCol: String = "text"): DataFrame = {
    require(alpha == 0.0d || alpha == 0.5d || alpha == 1.0d,
      s"alpha must be one of {0, 0.5, 1} for engine-exact weights " +
        s"(got $alpha); general powers are libm-dependent")
    val counts = docs
      .groupBy(col(keyCol))
      .agg(sum(bpeTokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val sfp = alpha match {
      case 0.0d => lit(1048576L)
      case 0.5d => floor(sqrt(col("n_tokens").cast("double")) *
        lit(1048576L)).cast("long")
      case _ => col("n_tokens") * lit(1048576L)
    }
    val scaled = counts.withColumn("s_fp", sfp)
      .localCheckpoint() // ≤ |keys| rows; read by the total and the spine
    val tot = scaled.agg(sum(col("s_fp")).as("tot"))
    scaled.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_tokens"), col("s_fp"),
        (col("s_fp").cast("double") / col("tot").cast("double"))
          .as("weight"))
  }
}
