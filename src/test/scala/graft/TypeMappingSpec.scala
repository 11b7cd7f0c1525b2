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
    assert(pgTypeToSpark("interval") == DayTimeIntervalType())
    assert(pgTypeToSpark("jsonb") == StringType)
  }

  test("unknown types raise (matching to_native_ty's panic contract)") {
    intercept[IllegalArgumentException](pgTypeToSpark("tsvector"))
  }
}
