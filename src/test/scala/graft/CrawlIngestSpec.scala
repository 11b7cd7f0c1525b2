package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.queries.{BatchCut, CorpusQuality, CrawlIngest, TextPipeline}

/** The composed crawl-ingest job (q109) contract: member parity (every
  * column equals the standalone incremental operator it composes,
  * bit-identically), the single-derivation plan shape (ONE generator
  * pass feeds the whole batch gram derivation), and the artifact-feed
  * property (snapshot ∪ delta == a from-scratch old+batch build). */
class CrawlIngestSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crawl-ingest")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // fresh artifact root: member and composed runs must share builds
    // within this suite, but never inherit stale artifacts across JVMs
    s.conf.set("graft.artifacts.dir", java.nio.file.Files
      .createTempDirectory("graft-ingest-spec").toFile.getAbsolutePath)
    s
  }

  private def docs: DataFrame =
    Graft.parquetSource(spark, dir).table("documents")

  // one composed run shared by the parity tests (keyed by doc_id)
  private lazy val out: Map[Long, Row] =
    CrawlIngest.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

  private def member(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q109 triage equals q79 row-for-row") {
    val q79 = member("q79_incremental_triage")
    assert(q79.nonEmpty)
    q79.foreach { r =>
      val o = out(r.getLong(0))
      assert(o.getAs[String]("triage") === r.getString(1),
        s"doc ${r.getLong(0)}")
    }
    // docs without a triage row (null text) must carry a null triage
    assert(out.size >= q79.length)
  }

  test("q109 DSIR columns equal q106; absent docs are null") {
    val q106 = member("q106_incremental_dsir")
    assert(q106.nonEmpty)
    val byDoc = q106.map(r => r.getLong(0) -> r).toMap
    out.values.foreach { o =>
      val id = o.getLong(0)
      byDoc.get(id) match {
        case Some(r) =>
          assert(o.getAs[Long]("dsir_tokens") === r.getAs[Long]("n_tokens"))
          assert(o.getAs[Long]("dsir_bits") === r.getAs[Long]("sum_bits"))
          assert(o.getAs[Double]("dsir_score") === r.getAs[Double]("score"))
        case None =>
          assert(o.isNullAt(o.fieldIndex("dsir_tokens")), s"doc $id")
      }
    }
  }

  test("q109 bigram columns equal q107; absent docs are null") {
    val q107 = member("q107_incremental_bigram_lm")
    assert(q107.nonEmpty)
    val byDoc = q107.map(r => r.getLong(0) -> r).toMap
    out.values.foreach { o =>
      val id = o.getLong(0)
      byDoc.get(id) match {
        case Some(r) =>
          assert(o.getAs[Long]("n_bigrams") === r.getAs[Long]("n_bigrams"))
          assert(o.getAs[Long]("n_oov") === r.getAs[Long]("n_oov"))
          assert(o.getAs[Long]("lm_bits") === r.getAs[Long]("sum_bits"))
          assert(o.getAs[Double]("lm_mean") === r.getAs[Double]("mean_bits"))
        case None =>
          assert(o.isNullAt(o.fieldIndex("n_bigrams")), s"doc $id")
      }
    }
  }

  test("q109 top-1 retrieval equals q105's rank-1 rows") {
    val rank1 = member("q105_incremental_bm25")
      .filter(_.getAs[Long]("rank") == 1L)
    assert(rank1.nonEmpty)
    val byDoc = rank1.map(r => r.getAs[Long]("query_id") -> r).toMap
    out.values.foreach { o =>
      val id = o.getLong(0)
      byDoc.get(id) match {
        case Some(r) =>
          assert(o.getAs[Long]("top1_doc") === r.getAs[Long]("doc_id"))
          assert(o.getAs[Long]("top1_ppm") === r.getAs[Long]("score_ppm"))
        case None =>
          assert(o.isNullAt(o.fieldIndex("top1_doc")), s"doc $id")
      }
    }
  }

  test("q109 new-term attribution sums to q101's n_new_terms") {
    val q101 = member("q101_incremental_vocab").head
    val total = out.values.map(_.getAs[Long]("n_new_terms")).sum
    assert(total === q101.getAs[Long]("n_new_terms"))
  }

  test("q109 keep/is_dup aggregate + counter artifact reproduce q95") {
    val cut = BatchCut.cut(spark, docs)
    val counters = spark.read.parquet(
      CorpusQuality.srcCounterIndex(spark, dir, cut))
    import spark.implicits._
    val deltas = out.values.toSeq
      .map(o => (o.getAs[String]("source"), o.getAs[Int]("keep"),
        o.getAs[Int]("is_dup")))
      .toDF("source", "keep", "is_dup")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"is_dup").cast("long").as("n_dup"),
        sum($"keep").cast("long").as("n_keep"),
        sum(($"keep" === 1 && $"is_dup" === 0).cast("int")).cast("long")
          .as("n_good"))
    val merged = counters.unionByName(deltas)
      .groupBy($"source")
      .agg(sum($"n_docs").as("n_docs"), sum($"n_dup").as("n_dup"),
        sum($"n_keep").as("n_keep"), sum($"n_good").as("n_good"))
      .collect().map(r => r.getString(0) -> r).toMap
    val q95 = member("q95_incremental_source_report")
    assert(q95.nonEmpty)
    q95.foreach { r =>
      val m = merged(r.getString(0))
      assert(m.getAs[Long]("n_docs") === r.getAs[Long]("n_docs"))
      assert(m.getAs[Long]("n_dup") === r.getAs[Long]("n_dup"))
      assert(m.getAs[Long]("n_keep") === r.getAs[Long]("n_keep"))
      assert(m.getAs[Long]("n_good") === r.getAs[Long]("n_good"))
    }
  }

  test("ONE generator derives the batch gram frame; candidates and " +
      "verify stay generator-clean/pruned") {
    out // force the composed run (captures the plans)
    val plans = CrawlIngest.lastIngestPlans
    assert(plans.nonEmpty, "ingest plans were not captured")
    val Array(gramPlan, candPlan, verifyPlan) =
      plans.split("\n-- (cand|verify-old) --\n")
    // the shared gram frame: exactly one Generate node, and it is the
    // tri-window generator — not three per-member passes
    // AQE prints the plan twice (final + initial) — count the final only
    val gramFinal = gramPlan.split("== Initial Plan ==").head
    assert(gramFinal.toLowerCase.contains("trishingles"),
      s"gram frame lost the tri-window generator:\n$gramPlan")
    assert("Generate ".r.findAllIn(gramFinal).length === 1,
      s"gram frame runs more than one generator:\n$gramPlan")
    // candidate generation touches signatures/artifacts only (q67 pin)
    assert(!candPlan.toLowerCase.contains("shingles"),
      s"q109 candidate generation re-shingles a corpus side:\n$candPlan")
    // the verify's old-side re-shingle is candidate-pruned with the
    // cut pushed to the documents scan
    assert(verifyPlan.contains("LessThan(doc_id"),
      s"verify old-side scan lost the cut pushdown:\n$verifyPlan")
  }

  test("q111 equals q109 except arrival-time triage; divergence is " +
      "exactly the earlier-side-only pair members") {
    val stream = SparkEntry.queries("q111_stream_crawl_ingest")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stream.keySet === out.keySet)
    // the docs that are ONLY ever the earlier (d1) side of a verified
    // batch-batch pair: retrospectively near (q109), novel on arrival
    // (q111 — nothing prior duplicated them)
    val pairs = member("q67_incremental_dedup")
      .map(r => (r.getLong(0), r.getLong(1)))
    val cut = BatchCut.cut(spark, docs)
    val d2s = pairs.map(_._2).toSet
    val d1Only = pairs.filter(_._1 >= cut).map(_._1).toSet -- d2s
    assert(d1Only.nonEmpty,
      "testdata lost its earlier-side-only pair member — divergence " +
        "case is vacuous")
    out.foreach { case (id, o) =>
      val t = stream(id)
      val nonTriage = o.schema.fieldNames.filterNot(_ == "triage")
      nonTriage.foreach { c =>
        assert(o.getAs[Any](c) === t.getAs[Any](c), s"doc $id col $c")
      }
      val (b, a) = (o.getAs[String]("triage"), t.getAs[String]("triage"))
      if (d1Only(id) && b == "near")
        assert(a === "novel", s"doc $id: earlier-side-only member must " +
          "be novel on arrival")
      else assert(a === b, s"doc $id: triage diverged outside the " +
        "documented case")
    }
  }

  test("q111 finds the cross-epoch near pair (later side marked near)") {
    // a verified batch-batch pair spanning micro-batch epochs is the
    // case the accumulated band index exists for: the later doc must
    // collide against bands appended by an EARLIER epoch
    val cut = BatchCut.cut(spark, docs)
    val ids = docs.where(col("doc_id") >= cut).select("doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0))
    val nEpochs = spark.conf.getOption("graft.stream.epochs")
      .map(_.toInt).getOrElse(4)
    val chunk = math.max(1, (ids.length + nEpochs - 1) / nEpochs)
    val epochOf = ids.zipWithIndex.map { case (id, i) => id -> i / chunk }
      .toMap
    val crossEpoch = member("q67_incremental_dedup")
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (d1, d2) =>
        d1 >= cut && epochOf(d1) != epochOf(d2) }
    assert(crossEpoch.nonEmpty,
      "testdata lost its cross-epoch pair — the accumulated-index case " +
        "is vacuous")
    val stream = SparkEntry.queries("q111_stream_crawl_ingest")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("triage")).toMap
    crossEpoch.foreach { case (_, d2) =>
      assert(stream(d2) === "near",
        s"doc $d2 duplicates an earlier epoch's doc but was not near")
    }
  }

  test("snapshot ∪ delta artifacts equal a from-scratch old+batch build") {
    out // force the composed run (ensures the deltas)
    val cut = BatchCut.cut(spark, docs)
    val fp = Some(s"$dir/documents.parquet")
    def delta(name: String): DataFrame = spark.read.parquet(
      graft.sources.SideTable.ensure(spark, name, s"$dir#$cut", fp) {
        fail(s"$name was not ensured by the composed run"); null
      })
    def assertSetEqual(got: DataFrame, want: DataFrame, what: String): Unit = {
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"$what: snapshot ∪ delta differs from the from-scratch build")
    }
    val keys = spark.read.parquet(
      TextPipeline.contentKeyIndex(spark, dir, cut))
      .unionByName(delta("content_keys_delta"))
    assertSetEqual(keys,
      docs.where(col("text").isNotNull)
        .select(md5(concat_ws(" ", words(col("text")))).as("gk"))
        .distinct(),
      "content keys")
    val terms = spark.read.parquet(
      CorpusQuality.vocabTermIndex(spark, dir, cut))
      .unionByName(delta("vocab_terms_delta"))
    assertSetEqual(terms,
      docs.select(explode(words(col("text"))).as("term")).distinct(),
      "vocabulary terms")
    val bands = spark.read.parquet(
      TextPipeline.signatureIndex(spark, dir, cut))
      .unionByName(delta("sig_index_delta"))
    assertSetEqual(bands, graft.ops.Dedup.minhashBands(docs),
      "signature bands")
    val (postPath, _, _, _) = CorpusQuality.bm25Index(spark, dir, cut)
    val post = spark.read.parquet(postPath)
      .unionByName(delta("bm25_postings_delta"))
    assertSetEqual(post.select("doc_id", "h", "tf", "bucket"),
      shingleHashRows(docs, 3)
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
        .withColumn("bucket", pmod(col("h"), lit(64)).cast("int")),
      "BM25 postings")
  }
}
