package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source abstraction — the Scala counterpart of the reference's `Source`
  * trait (conecta-core/src/source/source.rs:6-51), which is also its test
  * seam (mocked as DummySource in conecta-core/src/metadata.rs:103-261).
  *
  * A Source knows how to: probe a schema without reading data, fetch
  * MIN/MAX of a partition column (pushed down), sum COUNT(*) over a set of
  * queries in one statement, and execute one SQL query into a DataFrame.
  * Partition planning itself is source-agnostic (graft.plans.Planner).
  */
trait Source {

  def spark: SparkSession

  /** `LIMIT 0` schema probe — conecta-core/src/source/postgres.rs:528-530.
    * All fields are reported nullable, matching the reference's forced
    * nullability (conecta-core/src/schema.rs:154). */
  def schemaOf(query: String): StructType = {
    val s = execute(schemaQuery(query)).schema
    StructType(s.fields.map(_.copy(nullable = true)))
  }

  /** The probe SQL itself (postgres.rs:528-530). */
  def schemaQuery(query: String): String =
    s"select * from ($query) as query_inner limit 0"

  /** MIN/MAX of the partition column, pushed down as one aggregate query —
    * conecta-core/src/source/postgres.rs:556-563,585-592. */
  def fetchMinMax(query: String, col: String): (Long, Long) = {
    val row = execute(minMaxQuery(query, col)).collect().head
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"MIN/MAX of $col returned NULL — empty input or all-null column")
    (toLong(row.get(0)), toLong(row.get(1)))
  }

  /** Aliases matter: some dialects (Derby) auto-name unaliased expression
    * columns "1","2", which Spark's generated outer SELECT then cannot
    * reference. */
  def minMaxQuery(query: String, col: String): String =
    s"select cast(min($col) as bigint) as min_v, " +
      s"cast(max($col) as bigint) as max_v from ($query) as query_inner"

  /** FROM-less scalar SELECTs (the reference's merged-COUNT shape) are
    * PostgreSQL-legal but some dialects (Derby) demand a FROM clause;
    * a source may supply its 1-row dual table here. Empty for PG and
    * parquet — the reference template is unchanged there. */
  protected def dualFrom: String = ""

  /** Sum of COUNT(*) over n queries in a single statement —
    * conecta-core/src/source/postgres.rs:512-526. */
  def mergedCountQuery(queries: Seq[String]): String =
    queries.zipWithIndex
      .map { case (q, i) => s"(select count(*) from ($q) as t$i)" }
      .mkString("select ", " + ", s" as total_count$dualFrom")

  def fetchMergedCount(queries: Seq[String]): Long =
    toLong(execute(mergedCountQuery(queries)).collect().head.get(0))

  /** Per-query COUNT(*) — the preallocation probe of postgres.rs:353-366,
    * kept as an optional stats feature. */
  def fetchCounts(queries: Seq[String]): Seq[Long] =
    queries.map(q => toLong(execute(
      s"select count(*) as cnt from ($q) as q_count").collect().head.get(0)))

  /** First table referenced in the query's FROM clause — the reference's
    * `get_table_name` (conecta-core/src/source/postgres.rs:532-554, which
    * walks a sqlparser AST the same way). Spark-native: Catalyst's SQL
    * parser produces the logical plan, and the first UnresolvedRelation in
    * top-down/left-to-right order IS the first FROM-clause table — no
    * hand-rolled SQL string parsing, full dialect coverage (CTEs,
    * subqueries, joins) for free. */
  def tableName(query: String): String = {
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    plan.collectFirst {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.mkString(".")
    }.getOrElse(throw new IllegalArgumentException(
      s"could not extract a table name from: $query"))
  }

  /** Execute one SQL query against this source, returning a DataFrame. */
  def execute(query: String): DataFrame

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case d: java.math.BigDecimal => d.longValueExact()
    case o => o.toString.toLong
  }
}

object Source {

  /** Scheme → source dispatch, mirroring parse_uri/get_source
    * (conecta-core/src/source/mod.rs:33-82). Recognized:
    *   - `postgres://`, `postgresql://`, `jdbc:...` → JDBC source
    *   - `parquet://<dir>` or a bare directory path → Parquet source over the
    *     driver-style table directory (one `<table>.parquet` per table).
    */
  def forConnection(spark: SparkSession, conn: String): Source = {
    val scheme = conn.takeWhile(_ != ':')
    scheme match {
      case "postgres" | "postgresql" =>
        new JdbcSource(spark, "jdbc:postgresql" + conn.dropWhile(_ != ':'))
      case "jdbc" => new JdbcSource(spark, conn)
      case "parquet" =>
        new ParquetSource(spark, conn.stripPrefix("parquet://"))
      case _ if conn.startsWith("/") || conn.startsWith("file:") =>
        new ParquetSource(spark, conn)
      case other =>
        throw new IllegalArgumentException(s"unsupported source scheme: $other")
    }
  }

  /** Credential-sanitizing error rewrite, kept from the reference's Polars
    * integration (conecta-python/conecta/ext/__init__.py:49-52): the
    * `user:pass@` section of a connection URI is masked with asterisks. */
  def sanitizeCredentials(s: String): String =
    s.replaceAll("://[^/@\\s:]+:[^/@\\s]+@", "://***:***@")
}
