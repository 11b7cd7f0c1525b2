package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TypeMapping.pgTypeToSpark

/** The SURVEY.md §1.3 mapping table, asserted row by row — including the
  * deliberate superset (types the reference panics on). */
class TypeMappingSpec extends AnyFunSuite {

  test("reference-implemented scalar types") {
    assert(pgTypeToSpark("bool") == BooleanType)
    assert(pgTypeToSpark("int2") == ShortType)
    assert(pgTypeToSpark("int4") == IntegerType)
    assert(pgTypeToSpark("int8") == LongType)
    assert(pgTypeToSpark("float4") == FloatType)
    assert(pgTypeToSpark("float8") == DoubleType)
    assert(pgTypeToSpark("text") == StringType)
    assert(pgTypeToSpark("varchar") == StringType)
    assert(pgTypeToSpark("bpchar") == StringType)
    assert(pgTypeToSpark("bytea") == BinaryType)
    assert(pgTypeToSpark("uuid") == StringType)
    assert(pgTypeToSpark("date") == DateType)
    assert(pgTypeToSpark("time") == LongType)       // µs since midnight
    assert(pgTypeToSpark("timestamp") == TimestampNTZType)
  }

  test("array types (both _int4 and int4[] spellings)") {
    assert(pgTypeToSpark("_int4") == ArrayType(IntegerType))
    assert(pgTypeToSpark("int8[]") == ArrayType(LongType))
    assert(pgTypeToSpark("_text") == ArrayType(StringType))
    assert(pgTypeToSpark("_bool") == ArrayType(BooleanType))
    assert(pgTypeToSpark("_bytea") == ArrayType(BinaryType))
    assert(pgTypeToSpark("_uuid") == ArrayType(StringType))
    assert(pgTypeToSpark("_float8") == ArrayType(DoubleType))
  }

  test("geo encodings (reference hand-written decoders → double arrays)") {
    for (t <- Seq("point", "line", "circle", "box", "lseg", "path", "polygon"))
      assert(pgTypeToSpark(t) == ArrayType(DoubleType), t)
    assert(pgTypeToSpark("geometry") == BinaryType) // EWKB pass-through
  }

  test("superset: types the reference panics on") {
    assert(pgTypeToSpark("numeric(12,2)") == DecimalType(12, 2))
    assert(pgTypeToSpark("numeric") == DecimalType(38, 18))
    assert(pgTypeToSpark("timestamptz") == TimestampType)
    assert(pgTypeToSpark("interval") == StringType) // raw text; PG
    // intervals mix month + day-time fields, unrepresentable in one
    // Spark interval type
    assert(pgTypeToSpark("jsonb") == StringType)
  }

  test("unknown types raise (matching to_native_ty's panic contract)") {
    intercept[IllegalArgumentException](pgTypeToSpark("tsvector"))
  }

  test("full pg_datatypes_ddl.sql type zoo: every column maps or fails loudly") {
    // The reference's integration DDL, column per column
    // (conecta-python/conecta/tests/test_data/pg_datatypes_ddl.sql).
    // Three classes: (a) reference-supported types MUST map; (b) types the
    // reference panics on but this engine supports (documented superset)
    // MUST map; (c) types neither supports MUST throw loudly — silent
    // fallback to a wrong type is the only unacceptable outcome.
    val referenceSupported = Seq(
      "serial" -> IntegerType, "smallint" -> ShortType,
      "integer" -> IntegerType, "bigint" -> LongType,
      "real" -> FloatType, "double precision" -> DoubleType,
      "char" -> StringType, "varchar" -> StringType, "text" -> StringType,
      "boolean" -> BooleanType, "date" -> DateType, "time" -> LongType,
      "timestamp" -> TimestampNTZType, "uuid" -> StringType,
      "bytea" -> BinaryType,
      "point" -> ArrayType(DoubleType), "circle" -> ArrayType(DoubleType),
      "line" -> ArrayType(DoubleType), "box" -> ArrayType(DoubleType),
      "lseg" -> ArrayType(DoubleType), "path" -> ArrayType(DoubleType),
      "polygon" -> ArrayType(DoubleType),
      "integer[]" -> ArrayType(IntegerType),
      "text[]" -> ArrayType(StringType),
      "smallint[]" -> ArrayType(ShortType),
      "bigint[]" -> ArrayType(LongType),
      "real[]" -> ArrayType(FloatType),
      "double precision[]" -> ArrayType(DoubleType),
      "varchar[]" -> ArrayType(StringType),
      "boolean[]" -> ArrayType(BooleanType),
      "uuid[]" -> ArrayType(StringType),
      "bytea[]" -> ArrayType(BinaryType))
    for ((t, expected) <- referenceSupported)
      assert(pgTypeToSpark(t) == expected, t)

    val supersetSupported = Seq(
      "numeric(10, 2)" -> DecimalType(10, 2),
      "numeric(12, 4)" -> DecimalType(12, 4),
      "interval" -> StringType,
      "json" -> StringType, "jsonb" -> StringType,
      "timestamp with time zone" -> TimestampType,
      "numeric(10, 2)[]" -> ArrayType(DecimalType(10, 2)),
      "json[]" -> ArrayType(StringType),
      "jsonb[]" -> ArrayType(StringType),
      "timestamp with time zone[]" -> ArrayType(TimestampType),
      "interval[]" -> ArrayType(StringType))
    for ((t, expected) <- supersetSupported)
      assert(pgTypeToSpark(t) == expected, t)

    // neither engine supports these (reference panics; we throw):
    // timetz (no Spark counterpart), range types, and their arrays
    for (t <- Seq("time with time zone", "int4range", "numrange", "tsrange",
        "int4range[]", "numrange[]", "tsrange[]", "time with time zone[]"))
      intercept[IllegalArgumentException](pgTypeToSpark(t))
  }
}
