package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Generator-driven equivalence between the interpreted HOF reference
  * formulations (transform/aggregate lambdas — simple, obviously correct)
  * and the codegen formulations the queries actually run (window-lead
  * shingle rows, positional-power fingerprints, exploded trigrams). The
  * HOF versions serve as executable specifications; the rewrites must
  * agree on arbitrary text, not just the synthetic corpus. */
class TextEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-text-equiv")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('ü', 'ß', 'é', '中', '!', '.')))
  } yield cs.mkString

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ", " \t ")
    // whitespace-EDGED text is where tokenizations diverge: Spark's trim
    // strips U+0020 only, so a leading tab/newline survives and yields an
    // empty first token, and trailing separators yield a trailing empty
    // token (split limit -1). Every formulation must agree on these.
    pre <- Gen.oneOf("", " ", "\t", "\n ", "  \t")
    post <- Gen.oneOf("", " ", "\t ", " \n", "\t")
  } yield pre + ws.mkString(sep) + post

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("window-lead shingle rows == HOF shingleHashes (sets, n=2 and n=3)") {
    val docs = docsDf(samples(textGen, 120))
    for (n <- Seq(2, 3)) {
      val hof = docs.where(size(words(col("text"))) >= 3)
        .select(col("doc_id"), explode(shingleHashes(col("text"), n)).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val codegen = shingleHashRows(docs, n).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(codegen == hof, s"n=$n")
    }
  }

  test("positional-power fingerprint == HOF fold fingerprint") {
    val docs = docsDf(samples(textGen, 120))
    val hof = docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val codegen = fingerprintRows(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(codegen.keySet == hof.keySet)
    codegen.foreach { case (id, fp) => assert(fp == hof(id), s"doc $id") }
  }

  test("16 MIN aggregates over shingle rows == HOF minhashes") {
    val docs = docsDf(samples(textGen, 120))
    val hof = docs.where(size(words(col("text"))) >= 3)
      .select(col("doc_id"), minhashes(shingleHashes(col("text"), 3), 16).as("mh"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val minCols = (0 until 16).map(j =>
      min((col("h") * (2 * j + 3) + (j * j + 1)) % HashP).as(s"m$j"))
    val codegen = shingleHashRows(docs, 3).distinct()
      .groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .collect()
      .map(r => (r.getLong(0), (1 to 16).map(r.getLong(_)).toSeq)).toMap
    assert(codegen.keySet == hof.keySet && codegen.nonEmpty)
    codegen.foreach { case (id, mh) => assert(mh == hof(id), s"doc $id") }
  }

  test("bit-exploded vote sums == HOF simhash48") {
    val docs = docsDf(samples(textGen, 120))
    val hof = docs.where(size(words(col("text"))) >= 3)
      .select(col("doc_id"), simhash48(shingleHashes(col("text"), 3)).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val codegen = shingleHashRows(docs, 3).distinct()
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(47))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(((col("h") * (col("b") * 2 + 1) + col("b")) % HashP)
        .bitwiseAND(lit(1L)) * 2 - 1).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(lit(0L))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(codegen.keySet == hof.keySet && codegen.nonEmpty)
    codegen.foreach { case (id, sh) => assert(sh == hof(id), s"doc $id") }
  }

  test("graft_shingles generator == explode(shingles) HOF, via SQL") {
    graft.GraftExtensions.register(spark)
    val docs = docsDf(samples(textGen, 120))
    docs.createOrReplaceTempView("sgl_probe")
    for (n <- Seq(2, 3)) {
      val hof = docs.select(col("doc_id"),
        explode(shingles(col("text"), n)).as("shingle"))
        .collect().map(r => (r.getLong(0), r.getString(1))).groupBy(identity)
        .view.mapValues(_.length).toMap
      val gen = spark.sql(
        s"SELECT doc_id, s.shingle FROM sgl_probe " +
          s"LATERAL VIEW graft_shingles(text, $n) s AS shingle")
        .collect().map(r => (r.getLong(0), r.getString(1))).groupBy(identity)
        .view.mapValues(_.length).toMap
      assert(gen == hof, s"n=$n") // same rows WITH multiplicity
    }
  }

  test("dual-window generator == two single-window shingle passes") {
    // The q75 single-scan primitive: one DualShinglesExpr pass must
    // emit exactly the rows of a ShinglesExpr(n1) pass (h1, with
    // multiplicity) and a ShinglesExpr(n2) pass (non-null h2, with
    // multiplicity). n1 ≥ 3 so shingleHashRows' ≥3-word filter cannot
    // diverge from the generator's ≥n1-word contract.
    val docs = docsDf(samples(textGen, 120))
    for ((n1, n2) <- Seq((3, 5), (8, 16))) {
      def bag(rows: Seq[(Long, Long)]) =
        rows.groupBy(identity).view.mapValues(_.length).toMap
      val dual = dualShingleHashRows(docs, n1, n2).collect()
      val got1 = bag(dual.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      val got2 = bag(dual.filter(!_.isNullAt(2))
        .map(r => (r.getLong(0), r.getLong(2))).toSeq)
      val want1 = bag(shingleHashRows(docs, n1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
      val want2 = bag(shingleHashRows(docs, n2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
      assert(got1 == want1, s"h1 stream diverges at n1=$n1")
      assert(got2 == want2, s"h2 stream diverges at n2=$n2")
    }
  }

  test("tri-window generator == word explode + dual + single passes") {
    // The q109 single-scan primitive: one TriShinglesExpr pass must
    // emit exactly the exploded word stream (term, with multiplicity),
    // the (h1, h2) rows of dualShingleHashRows(1, 2), and the non-null
    // h3 rows of shingleHashRows(3) — every member of the composed
    // ingest job reads a projection of the same frame.
    val docs = docsDf(samples(textGen, 120))
    def bagL(rows: Seq[(Long, Long)]) =
      rows.groupBy(identity).view.mapValues(_.length).toMap
    def bagS(rows: Seq[(Long, String)]) =
      rows.groupBy(identity).view.mapValues(_.length).toMap
    val tri = triShingleHashRows(docs).collect()
    // term stream == explode(words) (null-text docs emit nothing)
    val gotTerms = bagS(tri.map(r => (r.getLong(0), r.getString(1))).toSeq)
    val wantTerms = bagS(docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(gotTerms == wantTerms, "term stream diverges from words()")
    // (h1, h2) == the dual generator at (1, 2)
    val dual = dualShingleHashRows(docs, 1, 2).collect()
    assert(bagL(tri.map(r => (r.getLong(0), r.getLong(2))).toSeq) ==
      bagL(dual.map(r => (r.getLong(0), r.getLong(1))).toSeq),
      "h1 stream diverges from the dual generator")
    assert(bagL(tri.filter(!_.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(3))).toSeq) ==
      bagL(dual.filter(!_.isNullAt(2))
        .map(r => (r.getLong(0), r.getLong(2))).toSeq),
      "h2 stream diverges from the dual generator")
    // non-null h3 == the single-window 3-gram pass
    assert(bagL(tri.filter(!_.isNullAt(4))
        .map(r => (r.getLong(0), r.getLong(4))).toSeq) ==
      bagL(shingleHashRows(docs, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq),
      "h3 stream diverges from shingleHashRows(3)")
  }

  test("fingerprintRows fails loudly past the power-table cap") {
    val big = docsDf(Seq(Seq.fill(8200)("w").mkString(" ")))
    val e = intercept[Exception](fingerprintRows(big).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("at most")))
  }

  test("exploded char trigrams == HOF charTrigrams (distinct sets)") {
    val docs = docsDf(samples(textGen, 120))
    val hof = docs.select(col("doc_id"), explode(charTrigrams(col("text"))).as("tg"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val lc = lower(col("text"))
    val codegen = docs.select(col("doc_id"), lc.as("lc"))
      .where(length(col("lc")) >= 3)
      .select(col("doc_id"), col("lc"),
        explode(sequence(lit(1), length(col("lc")) - 2)).as("i"))
      .select(col("doc_id"), substr(col("lc"), col("i"), lit(3)).as("tg"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(codegen == hof)
  }
}
