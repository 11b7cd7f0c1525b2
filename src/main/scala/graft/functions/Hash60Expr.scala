package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen 60-bit md5 hash of a string — the cross-engine hash
  * primitive (DuckDB: `('0x' || substr(md5(s),1,15))::bigint`), computed
  * directly from the digest bytes instead of the built-in 3-expression
  * chain `conv(substring(md5(s),1,15),16,10)`, which materializes a hex
  * string, substrings it, and re-parses it per row.
  *
  * The first 15 hex chars of the digest are its first 60 bits, i.e. the
  * big-endian value of bytes 0..7 shifted right by 4 — asserted equal to
  * the built-in chain for arbitrary strings by TextFunctionsSpec, and by
  * every oracle-checked query that hashes text.
  *
  * Null contract: null string → null (UnaryExpression default).
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(s: Any): Any =
    Hash60Expr.hash60(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.Hash60Expr$$.MODULE$$.hash60($s.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

object Hash60Expr {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes): big-endian bytes 0..7, >>> 4. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (d(i) & 0xffL)
      i += 1
    }
    acc >>> 4
  }
}
