package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Two shingle window sizes from ONE pass over the token stream: one
  * output row per `n1`-gram position, carrying the `n1`-gram and — when
  * the position also starts a full `n2`-gram (`n1 < n2`) — the `n2`-gram,
  * else null. Exists for the multi-window decontamination scan (q75):
  * probing 8- and 16-token windows with two [[ShinglesExpr]] passes
  * reads and re-tokenizes the full corpus twice; this generator tokenizes
  * once and emits both streams, so the whole probe is a single corpus
  * scan. Row-equivalent to the two single-window passes by construction
  * (property-tested): the s1 column is exactly `ShinglesExpr(text, n1)`
  * and the non-null s2 values are exactly `ShinglesExpr(text, n2)` —
  * every n2-gram start is also an n1-gram start.
  *
  * Null/short-input contract matches [[ShinglesExpr]]: null text or
  * fewer than n1 words → no rows; fewer than n2 → s2 all null. */
case class DualShinglesExpr(text: Expression, n1: Expression, n2: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n1, n2)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType &&
        n1.dataType == IntegerType && n1.foldable &&
        n2.dataType == IntegerType && n2.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_dual_shingles expects (string, int literal, int literal), got " +
        s"(${text.dataType.simpleString}, ${n1.dataType.simpleString}, " +
        s"${n2.dataType.simpleString})")

  override def elementSchema: StructType =
    StructType(Seq(StructField("s1", StringType),
      StructField("s2", StringType)))

  private lazy val n1Val: Int = n1.eval(null).asInstanceOf[Int]
  private lazy val n2Val: Int = {
    val v = n2.eval(null).asInstanceOf[Int]
    require(v >= n1Val, s"graft_dual_shingles needs n1 <= n2, got $n1Val > $v")
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
          else null)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DualShinglesExpr =
    copy(text = newChildren(0), n1 = newChildren(1), n2 = newChildren(2))
}
