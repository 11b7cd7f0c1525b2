package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Three shingle window sizes from ONE pass over the token stream: one
  * output row per `n1`-gram position carrying the `n1`-gram plus — when
  * the position also starts a full `n2`-/`n3`-gram (`n1 ≤ n2 ≤ n3`) —
  * those grams, else null. Exists for the composed crawl-ingest job
  * (q109): the incremental family's members each need a different gram
  * stream from the SAME batch (unigrams for vocabulary/DSIR, bigrams
  * for the conditional-surprisal LM, word 3-grams for MinHash banding
  * and the BM25 postings), and running them separately tokenizes and
  * re-scans the batch once per member. This generator tokenizes once
  * and emits all three streams, so the whole ingest derivation is a
  * single batch scan. Row-equivalent to the single-window passes by
  * construction (property-tested in TextEquivalenceSpec): the s1 column
  * is exactly `ShinglesExpr(text, n1)` and the non-null s2/s3 values
  * are exactly `ShinglesExpr(text, n2)`/`ShinglesExpr(text, n3)` —
  * every n2-/n3-gram start is also an n1-gram start.
  *
  * Null/short-input contract matches [[ShinglesExpr]]: null text or
  * fewer than n1 words → no rows; fewer than n2/n3 → that column all
  * null. */
case class TriShinglesExpr(text: Expression, n1: Expression,
    n2: Expression, n3: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n1, n2, n3)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType &&
        n1.dataType == IntegerType && n1.foldable &&
        n2.dataType == IntegerType && n2.foldable &&
        n3.dataType == IntegerType && n3.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_tri_shingles expects (string, int literal, int literal, " +
        s"int literal), got (${text.dataType.simpleString}, " +
        s"${n1.dataType.simpleString}, ${n2.dataType.simpleString}, " +
        s"${n3.dataType.simpleString})")

  override def elementSchema: StructType =
    StructType(Seq(StructField("s1", StringType),
      StructField("s2", StringType), StructField("s3", StringType)))

  private lazy val n1Val: Int = n1.eval(null).asInstanceOf[Int]
  private lazy val n2Val: Int = {
    val v = n2.eval(null).asInstanceOf[Int]
    require(v >= n1Val, s"graft_tri_shingles needs n1 <= n2, got $n1Val > $v")
    v
  }
  private lazy val n3Val: Int = {
    val v = n3.eval(null).asInstanceOf[Int]
    require(v >= n2Val, s"graft_tri_shingles needs n2 <= n3, got $n2Val > $v")
    v
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      // Tokenization matches ShinglesExpr / TextFunctions.words exactly:
      // Spark-trim (U+0020 only) then split("\s+", -1).
      val str = t.asInstanceOf[UTF8String].toString
      var b = 0; var e = str.length
      while (b < e && str.charAt(b) == ' ') b += 1
      while (e > b && str.charAt(e - 1) == ' ') e -= 1
      val ws = str.substring(b, e).split("\\s+", -1)
      if (ws.length < n1Val) Nil
      else (0 to ws.length - n1Val).map { i =>
        InternalRow(
          UTF8String.fromString(ws.slice(i, i + n1Val).mkString(" ")),
          if (i <= ws.length - n2Val)
            UTF8String.fromString(ws.slice(i, i + n2Val).mkString(" "))
          else null,
          if (i <= ws.length - n3Val)
            UTF8String.fromString(ws.slice(i, i + n3Val).mkString(" "))
          else null)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TriShinglesExpr =
    copy(text = newChildren(0), n1 = newChildren(1), n2 = newChildren(2),
      n3 = newChildren(3))
}
