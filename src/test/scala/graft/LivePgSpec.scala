package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Geo

/** OPT-IN live-PostgreSQL conformance — the same assertions
  * [[DialectConformanceSpec]] pins offline, replayed against a real
  * server when `GRAFT_PG_URL` is set (e.g.
  * `jdbc:postgresql://localhost:5432/postgres?user=postgres&password=pg`).
  * Every test is `assume`-gated: with the variable unset the suite
  * reports canceled, not failed, so the default offline run stays
  * deterministic (this sandbox has no egress — the fixtures above ARE
  * the round-to-round gate; this suite exists so a deployment with a
  * database can close the reference's live-integration loop, reference
  * conftest: conecta-python/conecta/tests/conftest.py:23-91).
  *
  * Requires the PostgreSQL JDBC driver on the test classpath (any
  * postgresql-*.jar next to the Spark jars works). The suite creates
  * and drops its own `graft_pg_datatypes` table — point it at a
  * scratch database. PostGIS assertions run only when the `postgis`
  * extension is installed; they cancel otherwise.
  */
class LivePgSpec extends AnyFunSuite {

  private def url: Option[String] = sys.env.get("GRAFT_PG_URL")

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-live-pg-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the reference fixture, trimmed to the columns the offline spec
  // pins (pg_datatypes_ddl.sql / pg_datatypes_data.sql)
  private val Ddl =
    """CREATE TABLE graft_pg_datatypes (
      |  id serial primary key,
      |  small_int smallint, int_ integer, big_int bigint,
      |  decimal_ numeric(10,2), real_ real, double_ double precision,
      |  varchar_ varchar(50), text_ text, bool_ boolean,
      |  date_ date, time_ time, timestamp_ timestamp,
      |  timestamptz_ timestamp with time zone,
      |  json_ json, jsonb_ jsonb, uuid_ uuid, bytea_ bytea,
      |  point_ point, circle_ circle, line_ line, box_ box,
      |  lseg_ lseg, path_ path, polygon_ polygon,
      |  int_array integer[], text_array text[]
      |)""".stripMargin

  private val Insert =
    """INSERT INTO graft_pg_datatypes (small_int, int_, big_int,
      |  decimal_, real_, double_, varchar_, text_, bool_, date_, time_,
      |  timestamp_, timestamptz_, json_, jsonb_, uuid_, bytea_,
      |  point_, circle_, line_, box_, lseg_, path_, polygon_,
      |  int_array, text_array)
      |VALUES (5, 1000, 9000000000, 12345.67, 3.14, 2.71828,
      |  'Hello, world!', 'Some long text here...', TRUE,
      |  '2025-08-22', '14:30:00', '2025-08-22 14:30:00',
      |  '2025-08-22 14:30:00+00', '{"key": "value"}', '{"user": "alice"}',
      |  'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11', '\xDEADBEEF',
      |  '(1,2)', '<(0,0),5>', '((0,0),(1,1))'::line,
      |  '((0,0),(2,2))'::box, '[(0,0),(3,4)]'::lseg,
      |  '((1,1),(4,1),(4,4),(1,4))'::path, '((0,0),(4,0),(2,3))',
      |  ARRAY[1,2,3], ARRAY['foo','bar','baz'])""".stripMargin

  private def withFixture[A](u: String)(body: String => A): A = {
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute("DROP TABLE IF EXISTS graft_pg_datatypes")
      st.execute(Ddl)
      st.execute(Insert)
      body(u)
    } finally {
      try {
        conn.createStatement()
          .execute("DROP TABLE IF EXISTS graft_pg_datatypes")
      } finally conn.close()
    }
  }

  test("live PG: resolved schema matches the offline fixture pins") {
    assume(url.isDefined, "GRAFT_PG_URL not set — offline run")
    withFixture(url.get) { u =>
      val df = Graft.readSql(spark, u,
        "select * from graft_pg_datatypes")
      val t = df.schema.fields.map(f => f.name -> f.dataType).toMap
      assert(t("small_int") == ShortType)
      assert(t("int_") == IntegerType)
      assert(t("big_int") == LongType)
      assert(t("decimal_") == DecimalType(10, 2))
      assert(t("real_") == FloatType)
      assert(t("double_") == DoubleType)
      assert(t("varchar_") == StringType && t("text_") == StringType)
      assert(t("bool_") == BooleanType)
      assert(t("date_") == DateType)
      assert(t("timestamp_") == TimestampNTZType,
        "plain timestamp must resolve NTZ (preferTimestampNTZ)")
      assert(t("timestamptz_") == TimestampType)
      assert(t("json_") == StringType && t("jsonb_") == StringType)
      assert(t("uuid_") == StringType)
      assert(t("bytea_") == BinaryType)
      assert(t("int_array") == ArrayType(IntegerType))
      assert(t("text_array") == ArrayType(StringType))
    }
  }

  test("live PG: the fixture row's geo text forms decode to the " +
      "golden coordinate arrays") {
    assume(url.isDefined, "GRAFT_PG_URL not set — offline run")
    withFixture(url.get) { u =>
      val r = Graft.readSql(spark, u,
        "select point_::text p, circle_::text c, line_::text l, " +
          "box_::text b, lseg_::text s, path_::text pa, " +
          "polygon_::text po, uuid_::text uu, json_::text js " +
          "from graft_pg_datatypes").collect().head
      assert(Geo.parseGeoText("point", r.getString(0)).toSeq ==
        Seq(1.0, 2))
      assert(Geo.parseGeoText("circle", r.getString(1)).toSeq ==
        Seq(0.0, 0, 5))
      assert(Geo.parseGeoText("line", r.getString(2)).toSeq ==
        Seq(1.0, -1, 0), "PG normalizes ((0,0),(1,1)) to {1,-1,0}")
      assert(Geo.parseGeoText("box", r.getString(3)).toSeq ==
        Seq(2.0, 2, 0, 0), "PG prints boxes upper-right first")
      assert(Geo.parseGeoText("lseg", r.getString(4)).toSeq ==
        Seq(0.0, 0, 3, 4))
      assert(Geo.parseGeoText("path", r.getString(5)).toSeq ==
        Seq(0.0, 4, 1, 1, 4, 1, 4, 4, 1, 4))
      assert(Geo.parseGeoText("polygon", r.getString(6)).toSeq ==
        Seq(0.0, 0, 4, 0, 2, 3))
      assert(r.getString(7) == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
      assert(r.getString(8).contains("\"key\""))
    }
  }

  test("live PG: PostGIS EWKB bytes decode to the reference's golden " +
      "coordinates (requires the postgis extension)") {
    assume(url.isDefined, "GRAFT_PG_URL not set — offline run")
    val conn = DriverManager.getConnection(url.get)
    val hasPostgis =
      try {
        val rs = conn.createStatement().executeQuery(
          "select count(*) from pg_extension where extname = 'postgis'")
        rs.next() && rs.getLong(1) > 0
      } finally conn.close()
    assume(hasPostgis, "postgis extension not installed — skipping")
    val df = Graft.readSql(spark, url.get,
      "select ST_GeomFromText('POINT (99 777)', 4326) as point, " +
        "ST_GeomFromText('LINESTRING (0 0, 1 1, 2 1, 2 2)', 4326) " +
        "as linestring")
    val r = df.collect().head
    // the same bytes the reference's golden test pins
    // (tests/databases/test_postgres.py:13-31)
    assert(Geo.decodeEwkb(r.getAs[Array[Byte]]("point")).toSeq ==
      Seq(99.0, 777.0))
    assert(Geo.decodeEwkb(r.getAs[Array[Byte]]("linestring")).toSeq ==
      Seq(0.0, 0, 1, 1, 2, 1, 2, 2))
  }
}
