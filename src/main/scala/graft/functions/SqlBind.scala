package graft.functions

import scala.util.matching.Regex

/** Injection-safe SQL parameter binding — behavioral parity with the
  * reference's `sql_bind` (conecta-python/conecta/__init__.py:46-106,
  * tests conecta-python/conecta/tests/test_bind.py:4-22).
  *
  * Semantics:
  *   - `:name` placeholders are replaced by escaped SQL literals: strings
  *     get single-quote doubling and are wrapped in `'...'`; numbers render
  *     verbatim; `null`/None renders as `NULL`.
  *   - `IDENT(:name)` quotes the value as an identifier (default `"..."`),
  *     applied before plain substitution so the wrapper is consumed.
  *   - A placeholder only matches on word boundaries (`:val` does not match
  *     inside `:val2`).
  *
  * For runtime parameterization inside the engine prefer Spark's built-in
  * parameterized SQL (`spark.sql(sqlText, args)`); this utility exists for
  * parity and for building SQL sent to external JDBC sources.
  */
object SqlBind {

  def sqlBind(sql: String, parameters: Map[String, Any],
      charDelimiter: String = ":", quoteIdentWith: String = "\""): String = {
    parameters.foldLeft(sql) { case (acc, (key, value)) =>
      val replacement = formatValue(value)
      val toReplace = Regex.quote(charDelimiter + key)
      val identQuoted =
        Regex.quoteReplacement(replacement.replace("'", quoteIdentWith))
      val step1 = s"IDENT\\($toReplace\\)".r
        .replaceAllIn(acc, identQuoted)
      s"(?<!\\w)$toReplace(?!\\w)".r
        .replaceAllIn(step1, Regex.quoteReplacement(replacement))
    }
  }

  private def formatValue(value: Any): String = value match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => d.toString
    case f: Float => f.toString
    case s: Short => s.toString
    case b: Byte => b.toString
    case b: BigInt => b.toString
    case b: BigDecimal => b.toString
    case null | None => "NULL"
    case other =>
      throw new IllegalArgumentException(
        s"unsupported parameter type: ${other.getClass.getName}")
  }
}
