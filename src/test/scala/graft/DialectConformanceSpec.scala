package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Geo, GraftPgDialect, TypeMapping}

/** Conformance of the engine's PostgreSQL type conventions against the
  * reference's full type zoo, without a live Postgres: every column of
  * `conecta-python/conecta/tests/test_data/pg_datatypes_ddl.sql:1-65` and
  * `pg_postgis_datatypes_ddl.sql` is replayed through Spark's REAL JDBC
  * schema resolution (`JdbcUtils.getSchema` with the registered dialect
  * chain — see [[PgFixture]]), one assertion per SURVEY.md §1.3 mapping
  * row, plus the reference's golden EWKB bytes
  * (`tests/databases/test_postgres.py:13-31`) through [[Geo.decodeEwkb]].
  *
  * The engine's PG read path sets `preferTimestampNTZ=true`
  * ([[graft.sources.JdbcSource]]), so the resolved schema here uses the
  * same flag: plain `timestamp` must land as TimestampNTZType — the
  * reference's Timestamp(µs, no tz) — while `timestamptz` stays
  * TimestampType (instant semantics; capability superset, the reference
  * panics on it).
  */
class DialectConformanceSpec extends AnyFunSuite {

  private lazy val resolved: Map[String, DataType] =
    PgFixture.resolveSchema(PgFixture.datatypes, preferTimestampNTZ = true)
      .fields.map(f => f.name -> f.dataType).toMap

  private lazy val resolvedGis: Map[String, DataType] =
    PgFixture.resolveSchema(PgFixture.postgisDatatypes,
        preferTimestampNTZ = true)
      .fields.map(f => f.name -> f.dataType).toMap

  private def check(col: String, expected: DataType): Unit =
    assert(resolved(col) == expected, s"column $col")

  // --- §1.3 implemented-mapping rows (reference to_native_ty,
  //     postgres.rs:595-646 → schema.rs:70-141) ---

  test("BOOL → BooleanType") { check("bool_", BooleanType) }
  test("INT2 → ShortType") { check("small_int", ShortType) }
  test("INT4 → IntegerType") {
    check("int_", IntegerType)
    check("id", IntegerType) // serial reports as auto-increment int4
  }
  test("INT8 → LongType") { check("big_int", LongType) }
  test("FLOAT4 → FloatType") { check("real_", FloatType) }
  test("FLOAT8 → DoubleType") { check("double_", DoubleType) }
  test("CHAR/BPCHAR/TEXT/VARCHAR → StringType") {
    Seq("char_", "bpchar_", "varchar_", "text_")
      .foreach(check(_, StringType))
  }
  test("BYTEA → BinaryType") { check("bytea_", BinaryType) }
  test("UUID → StringType canonical form (GraftPgDialect pin)") {
    check("uuid_", StringType)
    // the pin itself, independent of what Spark's fallback would choose
    assert(GraftPgDialect.getCatalystType(java.sql.Types.OTHER, "uuid", 0,
      new MetadataBuilder).contains(StringType))
  }
  test("DATE → DateType") { check("date_", DateType) }
  test("TIME → LongType µs since midnight after the read projection") {
    // JDBC layer materializes a 1970-01-01 wall-clock timestamp (NTZ
    // under the engine's flag); JdbcSource.timeToMicros projects it to
    // the documented LongType µs (live-verified against Derby, JdbcSpec)
    check("time_", TimestampNTZType)
    assert(TypeMapping.pgTypeToSpark("time") == LongType)
  }
  test("TIMESTAMP → TimestampNTZType (reference: Timestamp µs, no tz)") {
    check("timestamp_", TimestampNTZType)
    assert(TypeMapping.pgTypeToSpark("timestamp") == TimestampNTZType)
  }
  test("INT2/4/8_ARRAY → ArrayType(Short/Integer/Long)") {
    check("smallint_array", ArrayType(ShortType))
    check("int_array", ArrayType(IntegerType))
    check("bigint_array", ArrayType(LongType))
  }
  test("FLOAT4/8_ARRAY → ArrayType(Float/Double)") {
    check("real_array", ArrayType(FloatType))
    check("double_array", ArrayType(DoubleType))
  }
  test("TEXT_ARRAY → ArrayType(String)") {
    check("text_array", ArrayType(StringType))
    check("char_array", ArrayType(StringType))
    check("varchar_array", ArrayType(StringType))
  }
  test("BOOL_ARRAY → ArrayType(Boolean)") {
    check("bool_array", ArrayType(BooleanType))
  }
  test("BYTEA_ARRAY → ArrayType(Binary)") {
    check("bytea_array", ArrayType(BinaryType))
  }
  test("UUID_ARRAY → ArrayType(String)") {
    check("uuid_array", ArrayType(StringType))
  }

  // --- native geometric types: JDBC materializes the text form; the
  //     read projection decodes to the documented ArrayType(Double)
  //     encodings (reference decoders postgres.rs:31-290) ---

  private val geoText = Map(
    "point" -> ("(1.5,-2)", Seq(1.5, -2.0)),
    "line" -> ("{1,-1,0}", Seq(1.0, -1.0, 0.0)),
    "circle" -> ("<(0,0),5>", Seq(0.0, 0.0, 5.0)),
    "box" -> ("(2,2),(0,0)", Seq(2.0, 2.0, 0.0, 0.0)),
    "lseg" -> ("[(0,0),(1,1)]", Seq(0.0, 0.0, 1.0, 1.0)),
    "path" -> ("((0,0),(1,1),(2,0))", Seq(0.0, 3.0, 0, 0, 1, 1, 2, 0)),
    "polygon" -> ("((0,0),(1,0),(1,1))", Seq(0.0, 0, 1, 0, 1, 1)),
  )

  for ((t, (text, coords)) <- geoText)
    test(s"$t → ArrayType(Double) ${TypeMapping.pgTypeToSpark(t)}") {
      check(t + "_", StringType) // JDBC layer: PG text form
      assert(TypeMapping.pgTypeToSpark(t) == ArrayType(DoubleType))
      assert(Geo.parseGeoText(t, text).toSeq == coords)
    }

  test("reference fixture row: the pg_datatypes_data.sql geo values " +
      "decode through their PG OUTPUT text forms") {
    // the exact values the reference inserts
    // (tests/test_data/pg_datatypes_data.sql:83-89), written here in
    // the TEXT FORM Postgres prints them back in (line normalizes to
    // {a,b,c}; box reorders to upper-right first — documented output
    // behavior, which is what the JDBC read path sees)
    assert(Geo.parseGeoText("point", "(1,2)").toSeq == Seq(1.0, 2))
    // '((0,0),(1,1))'::line → the line x − y = 0 → {1,-1,0}
    assert(Geo.parseGeoText("line", "{1,-1,0}").toSeq == Seq(1.0, -1, 0))
    assert(Geo.parseGeoText("circle", "<(0,0),5>").toSeq ==
      Seq(0.0, 0, 5))
    // '((0,0),(2,2))'::box → prints '(2,2),(0,0)'
    assert(Geo.parseGeoText("box", "(2,2),(0,0)").toSeq ==
      Seq(2.0, 2, 0, 0))
    assert(Geo.parseGeoText("lseg", "[(0,0),(3,4)]").toSeq ==
      Seq(0.0, 0, 3, 4))
    // closed path (parens form): [open=0, n=4, coords...]
    assert(Geo.parseGeoText("path", "((1,1),(4,1),(4,4),(1,4))").toSeq ==
      Seq(0.0, 4, 1, 1, 4, 1, 4, 4, 1, 4))
    assert(Geo.parseGeoText("polygon", "((0,0),(4,0),(2,3))").toSeq ==
      Seq(0.0, 0, 4, 0, 2, 3))
  }

  test("PostGIS geometry → BinaryType raw EWKB (GraftPgDialect)") {
    PgFixture.postgisDatatypes.map(_.name)
      .foreach(c => assert(resolvedGis(c) == BinaryType, c))
  }

  test("GraftPgDialect is load-bearing for geometry (Spark default " +
      "would materialize a string, losing the raw-EWKB contract)") {
    JdbcDialects.unregisterDialect(GraftPgDialect)
    try {
      val bare = JdbcDialects.get("jdbc:postgresql://localhost:5432/db")
      assert(bare.getCatalystType(java.sql.Types.OTHER, "geometry", 0,
        new MetadataBuilder).contains(StringType))
    } finally JdbcDialects.registerDialect(GraftPgDialect)
    assert(PgFixture.pgDialect.getCatalystType(java.sql.Types.OTHER,
      "geometry", 0, new MetadataBuilder).contains(BinaryType))
  }

  // --- capability-superset rows (the reference PANICS on all of these:
  //     to_native_ty postgres.rs:642; §1.3 "explicitly unsupported") ---

  test("superset: NUMERIC(p,s) → DecimalType(p,s)") {
    check("decimal_", DecimalType(10, 2))
    check("numeric_", DecimalType(12, 4))
  }
  test("superset: TIMESTAMPTZ → TimestampType (instant)") {
    check("timestamptz_", TimestampType)
    assert(TypeMapping.pgTypeToSpark("timestamptz") == TimestampType)
  }
  test("superset: TIMETZ → TimestampType (instant on 1970-01-01)") {
    check("timetz_", TimestampType)
  }
  test("superset: INTERVAL → StringType raw text pass-through") {
    // PG intervals mix month and day-time fields; Spark's day-time
    // interval cannot represent months, so the engine passes the text
    // through rather than silently lossy-casting
    check("interval_", StringType)
    assert(TypeMapping.pgTypeToSpark("interval") == StringType)
  }
  test("superset: JSON/JSONB → StringType (GraftPgDialect pin)") {
    check("json_", StringType)
    check("jsonb_", StringType)
  }
  test("superset: range types → StringType text form") {
    Seq("int_range", "num_range", "ts_range").foreach(check(_, StringType))
  }
  test("superset: decimal/date/timestamp/interval/json/range arrays " +
      "resolve (reference panics)") {
    check("decimal_array", ArrayType(DecimalType(10, 2)))
    check("numeric_array", ArrayType(DecimalType(12, 4)))
    check("date_array", ArrayType(DateType))
    check("time_array", ArrayType(TimestampNTZType))
    check("timetz_array", ArrayType(TimestampType))
    check("timestamp_array", ArrayType(TimestampNTZType))
    check("timestamptz_array", ArrayType(TimestampType))
    check("interval_array", ArrayType(StringType))
    check("json_array", ArrayType(StringType))
    check("jsonb_array", ArrayType(StringType))
    check("point_array", ArrayType(StringType))
    check("circle_array", ArrayType(StringType))
    check("int4range_array", ArrayType(StringType))
    check("numrange_array", ArrayType(StringType))
    check("tsrange_array", ArrayType(StringType))
  }

  // --- the reference's golden EWKB vectors, byte-for-byte
  //     (test_postgres.py:13-31; little-endian, SRID 4326 flag) ---

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden EWKB: POINT(99 777)") {
    assert(Geo.decodeEwkb(hex(
      "0101000020e61000000000000000c058400000000000488840")).toSeq ==
      Seq(99.0, 777.0))
  }

  test("golden EWKB: LINESTRING(0 0,1 1,2 1,2 2)") {
    assert(Geo.decodeEwkb(hex(
      "0102000020e61000000400000000000000000000000000000000000000000000" +
      "000000f03f000000000000f03f0000000000000040000000000000f03f000000" +
      "00000000400000000000000040")).toSeq ==
      Seq(0.0, 0, 1, 1, 2, 1, 2, 2))
  }

  test("golden EWKB: POLYGON((0 0,1 0,1 1,0 1,0 0))") {
    assert(Geo.decodeEwkb(hex(
      "0103000020e6100000010000000500000000000000000000000000000000000000" +
      "000000000000f03f0000000000000000000000000000f03f000000000000f03f" +
      "0000000000000000000000000000f03f00000000000000000000000000000000"))
      .toSeq == Seq(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0))
  }

  test("golden EWKB: holed POLYGON keeps both rings in order") {
    assert(Geo.decodeEwkb(hex(
      "0103000020e61000000200000005000000000000000000000000000000000000" +
      "000000000000002440000000000000000000000000000024400000000000002440" +
      "000000000000000000000000000024400000000000000000000000000000000005" +
      "000000000000000000f03f000000000000f03f000000000000f03f000000000000" +
      "0040000000000000004000000000000000400000000000000040000000000000f0" +
      "3f000000000000f03f000000000000f03f")).toSeq ==
      Seq(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0, // exterior
        1, 1, 1, 2, 2, 2, 2, 1, 1, 1)) // interior ring
  }

  test("golden EWKB: GEOMETRYCOLLECTION(POINT(2 0),POLYGON(...))") {
    assert(Geo.decodeEwkb(hex(
      "0107000020e610000002000000010100000000000000000000400000000000000000" +
      "0103000000010000000500000000000000000000000000000000000000000000" +
      "000000f03f0000000000000000000000000000f03f000000000000f03f000000" +
      "0000000000000000000000f03f00000000000000000000000000000000")).toSeq ==
      Seq(2.0, 0, // the point
        0, 0, 1, 0, 1, 1, 0, 1, 0, 0)) // the polygon ring
  }
}
