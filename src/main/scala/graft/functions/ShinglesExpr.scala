package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (the UDTF leg of the UDF/UDAF/UDTF
  * surface, SURVEY.md §2.2): one output row per word n-gram shingle of a
  * text column. SQL: `SELECT doc_id, s.shingle FROM docs LATERAL VIEW
  * graft_shingles(text, 3) s AS shingle` — same rows as exploding
  * [[TextFunctions.shingles]], property-tested equivalent.
  *
  * A Generator's eval is one virtual call per INPUT row returning an
  * iterator (GenerateExec drives it) — unlike per-element HOF lambdas,
  * this costs O(1) dispatch per row, so CodegenFallback is fine here.
  *
  * Null/short-input contract: null text or fewer than n words → no rows
  * (matches `explode(shingles(c, n))`, which drops empty arrays). */
case class ShinglesExpr(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_shingles expects (string, int literal), got " +
        s"(${text.dataType.simpleString}, ${n.dataType.simpleString})")

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType)))

  private lazy val nVal: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      // Tokenization must match TextFunctions.words — i.e. Spark's
      // `split(trim(c), "\s+")` — EXACTLY, or the generator and the HOF
      // formulation diverge on whitespace-edged text: Spark's trim
      // strips U+0020 only (Java String.trim strips all control chars
      // ≤ U+0020, so a leading tab would tokenize differently), and
      // Spark's split keeps trailing empty fields (Java's default
      // limit-0 split drops them).
      val str = t.asInstanceOf[UTF8String].toString
      var b = 0; var e = str.length
      while (b < e && str.charAt(b) == ' ') b += 1
      while (e > b && str.charAt(e - 1) == ' ') e -= 1
      val ws = str.substring(b, e).split("\\s+", -1)
      if (ws.length < nVal) Nil
      else (0 to ws.length - nVal).map { i =>
        InternalRow(UTF8String.fromString(
          ws.slice(i, i + nVal).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShinglesExpr =
    copy(text = newChildren(0), n = newChildren(1))
}
