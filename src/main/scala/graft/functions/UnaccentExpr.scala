package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen accent stripper — Unicode NFD decomposition with all
  * combining marks (`\p{M}`) removed, the standard "café → cafe"
  * canonicalization dedup pipelines run before hashing (CC-Net's
  * text normalizer does exactly this; DuckDB: `strip_accents(s)`).
  * Spark has no built-in equivalent (`translate` would need an
  * explicit per-codepoint map), and a Scala UDF would break
  * whole-stage codegen on the hottest path of the corpus — so this is
  * the custom-`Expression` rung of the operator ladder.
  *
  * ASCII fast path: pure-ASCII strings (the overwhelming majority of
  * any web corpus at byte grain) return the input UTF8String
  * UNCHANGED — no String materialization, no Normalizer call; the
  * byte scan is one pass checking the high bit.
  *
  * Null contract: null string → null (UnaryExpression default).
  */
case class UnaccentExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_unaccent expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unaccent"

  override protected def nullSafeEval(s: Any): Any =
    UnaccentExpr.unaccent(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.UnaccentExpr$$.MODULE$$.unaccent($s)")

  override protected def withNewChildInternal(newChild: Expression): UnaccentExpr =
    copy(child = newChild)
}

object UnaccentExpr {

  // compiled once: the non-ASCII path must not pay Pattern.compile
  // per row on accent-heavy corpora
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** NFD-decompose and drop combining marks; pure-ASCII inputs return
    * the input object itself (no allocation). */
  def unaccent(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      Marks.matcher(java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.NFD)).replaceAll(""))
  }
}
