package graft.sources

import org.apache.spark.sql.jdbc.JdbcDialect
import org.apache.spark.sql.types._

/** Registered JDBC dialect that makes [[TypeMapping]]'s documented PG
  * conventions EXECUTE on `jdbc:postgresql` reads (they were previously a
  * unit-tested constant table with no caller). Registered dialects take
  * precedence over Spark's built-in PostgresDialect, and returning None
  * falls back to it — so this overrides exactly the types whose
  * convention differs from Spark's default AND whose JDBC getter under
  * the overridden Catalyst type is still valid:
  *
  *   - uuid → StringType canonical form (Spark default also strings
  *     uuid, but via the generic OTHER branch; pinned here so the
  *     documented convention does not depend on dialect internals)
  *   - json / jsonb → StringType (raw JSON text pass-through)
  *   - geometry / geography (PostGIS) → BinaryType raw EWKB
  *     (reference: postgres.rs:243-255 passes EWKB through untouched;
  *     decode with [[Geo.decodeEwkb]])
  *
  * TIME's µs-since-midnight convention cannot be expressed here — a
  * LongType mapping would make Spark call `ResultSet.getLong` on a TIME
  * column, which JDBC drivers reject. It is applied as a post-read
  * projection in [[JdbcSource]] (same observable result: a LongType
  * column of µs since midnight).
  */
object GraftPgDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:postgresql")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    typeName.toLowerCase match {
      case "uuid" | "json" | "jsonb" => Some(StringType)
      case "geometry" | "geography" => Some(BinaryType)
      case _ => None // Spark's PostgresDialect default
    }
}
