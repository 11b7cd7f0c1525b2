package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, ResultSetMetaData, Types}

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.StructType

import graft.sources.JdbcSource

/** Static replay of the PostgreSQL JDBC driver's metadata for the
  * reference's type-zoo DDL (conecta-python/conecta/tests/test_data/
  * pg_datatypes_ddl.sql:1-65 and pg_postgis_datatypes_ddl.sql) — the
  * sandbox has no live Postgres, so conformance is checked by driving
  * Spark's REAL schema-resolution entry point
  * (`JdbcUtils.getSchema(conn, rs, dialect, _, _)`) with a
  * reflection-proxy ResultSet that reports exactly the
  * (java.sql.Types code, type name, precision, scale) tuples pgjdbc's
  * `PgResultSetMetaData` reports for each column. Public-knowledge
  * sources for the tuples: the pgjdbc documented behavior that
  * `getColumnTypeName` returns the PG internal name (`int2`, `bpchar`,
  * `_int4` for arrays, `serial` for auto-increment int4) and
  * `getColumnType` maps bool→BIT, int2→SMALLINT, int4→INTEGER,
  * int8→BIGINT, numeric→NUMERIC, float4→REAL, float8→DOUBLE,
  * bpchar→CHAR, varchar/text→VARCHAR, date→DATE, time/timetz→TIME,
  * timestamp/timestamptz→TIMESTAMP, bytea→BINARY, arrays→ARRAY, and
  * everything without a JDBC category (uuid, json, interval, geo,
  * ranges, PostGIS) → OTHER.
  */
object PgFixture {

  /** (column name, JDBC type code, PG type name, precision, scale) —
    * one row per column of pg_datatypes_ddl.sql, in DDL order. */
  final case class Col(name: String, code: Int, pgName: String,
      precision: Int = 0, scale: Int = 0)

  val datatypes: Seq[Col] = Seq(
    Col("id", Types.INTEGER, "serial", 10),
    Col("small_int", Types.SMALLINT, "int2", 5),
    Col("int_", Types.INTEGER, "int4", 10),
    Col("big_int", Types.BIGINT, "int8", 19),
    Col("decimal_", Types.NUMERIC, "numeric", 10, 2),
    Col("numeric_", Types.NUMERIC, "numeric", 12, 4),
    Col("real_", Types.REAL, "float4", 8),
    Col("double_", Types.DOUBLE, "float8", 17),
    Col("char_", Types.CHAR, "bpchar", 1),
    Col("bpchar_", Types.CHAR, "bpchar", 5),
    Col("varchar_", Types.VARCHAR, "varchar", 50),
    Col("text_", Types.VARCHAR, "text"),
    Col("bool_", Types.BIT, "bool", 1),
    Col("date_", Types.DATE, "date"),
    Col("time_", Types.TIME, "time"),
    Col("timetz_", Types.TIME, "timetz"),
    Col("timestamp_", Types.TIMESTAMP, "timestamp"),
    Col("timestamptz_", Types.TIMESTAMP, "timestamptz"),
    Col("interval_", Types.OTHER, "interval"),
    Col("json_", Types.OTHER, "json"),
    Col("jsonb_", Types.OTHER, "jsonb"),
    Col("uuid_", Types.OTHER, "uuid"),
    Col("bytea_", Types.BINARY, "bytea"),
    Col("point_", Types.OTHER, "point"),
    Col("circle_", Types.OTHER, "circle"),
    Col("line_", Types.OTHER, "line"),
    Col("box_", Types.OTHER, "box"),
    Col("lseg_", Types.OTHER, "lseg"),
    Col("path_", Types.OTHER, "path"),
    Col("polygon_", Types.OTHER, "polygon"),
    Col("int_array", Types.ARRAY, "_int4"),
    Col("text_array", Types.ARRAY, "_text"),
    Col("smallint_array", Types.ARRAY, "_int2"),
    Col("bigint_array", Types.ARRAY, "_int8"),
    Col("decimal_array", Types.ARRAY, "_numeric", 10, 2),
    Col("numeric_array", Types.ARRAY, "_numeric", 12, 4),
    Col("real_array", Types.ARRAY, "_float4"),
    Col("double_array", Types.ARRAY, "_float8"),
    Col("char_array", Types.ARRAY, "_bpchar", 5),
    Col("varchar_array", Types.ARRAY, "_varchar", 50),
    Col("bool_array", Types.ARRAY, "_bool"),
    Col("date_array", Types.ARRAY, "_date"),
    Col("time_array", Types.ARRAY, "_time"),
    Col("timetz_array", Types.ARRAY, "_timetz"),
    Col("timestamp_array", Types.ARRAY, "_timestamp"),
    Col("timestamptz_array", Types.ARRAY, "_timestamptz"),
    Col("interval_array", Types.ARRAY, "_interval"),
    Col("json_array", Types.ARRAY, "_json"),
    Col("jsonb_array", Types.ARRAY, "_jsonb"),
    Col("uuid_array", Types.ARRAY, "_uuid"),
    Col("bytea_array", Types.ARRAY, "_bytea"),
    Col("point_array", Types.ARRAY, "_point"),
    Col("circle_array", Types.ARRAY, "_circle"),
    Col("int_range", Types.OTHER, "int4range"),
    Col("num_range", Types.OTHER, "numrange"),
    Col("ts_range", Types.OTHER, "tsrange"),
    Col("int4range_array", Types.ARRAY, "_int4range"),
    Col("numrange_array", Types.ARRAY, "_numrange"),
    Col("tsrange_array", Types.ARRAY, "_tsrange"),
  )

  /** pg_postgis_datatypes_ddl.sql — every column reports as OTHER with
    * type name "geometry" (pgjdbc reports the UDT's base name). */
  val postgisDatatypes: Seq[Col] = Seq(
    "point_", "linestring_", "polygon_", "polygon_holed", "geom_collection"
  ).map(Col(_, Types.OTHER, "geometry"))

  /** The dialect chain a real `jdbc:postgresql` read resolves against
    * (GraftPgDialect registered in front of Spark's PostgresDialect). */
  def pgDialect: JdbcDialect = {
    JdbcSource.ensureDialect()
    JdbcDialects.get("jdbc:postgresql://localhost:5432/db")
  }

  /** Run the given columns through Spark's real JDBC schema resolution
    * (`JdbcUtils.getSchema`) exactly as a `spark.read.jdbc` against
    * PostgreSQL would. `preferTimestampNTZ` mirrors the reader option of
    * the same name. */
  def resolveSchema(cols: Seq[Col], preferTimestampNTZ: Boolean): StructType =
    JdbcUtils.getSchema(mockConnection(), mockResultSet(cols), pgDialect,
      false, preferTimestampNTZ)

  private def proxy[T](iface: Class[T])(
      handler: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          handler(m.getName, if (args == null) Array.empty else args)
      }).asInstanceOf[T]

  private def mockMeta(cols: Seq[Col]): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData]) { (name, args) =>
      def col = cols(args(0).asInstanceOf[Integer] - 1)
      name match {
        case "getColumnCount" => Int.box(cols.length)
        case "getColumnLabel" | "getColumnName" => col.name
        case "getColumnType" => Int.box(col.code)
        case "getColumnTypeName" => col.pgName
        case "getPrecision" => Int.box(col.precision)
        case "getScale" => Int.box(col.scale)
        // pgjdbc: nullability unknown from a bare SELECT's metadata
        case "isNullable" => Int.box(ResultSetMetaData.columnNullable)
        case "isSigned" => Boolean.box(true)
        case other => sys.error(s"unmocked ResultSetMetaData.$other")
      }
    }

  private def mockResultSet(cols: Seq[Col]): ResultSet = {
    val md = mockMeta(cols)
    proxy(classOf[ResultSet]) { (name, _) =>
      name match {
        case "getMetaData" => md
        case "next" => Boolean.box(false)
        case "close" | "wasNull" => Boolean.box(false)
        case other => sys.error(s"unmocked ResultSet.$other")
      }
    }
  }

  private def mockConnection(): Connection =
    proxy(classOf[Connection]) { (name, _) =>
      name match {
        case "close" | "isClosed" => Boolean.box(false)
        case other => sys.error(s"unmocked Connection.$other")
      }
    }
}
