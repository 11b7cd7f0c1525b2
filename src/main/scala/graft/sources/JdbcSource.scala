package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

import graft.plans.PartitionPlan

/** JDBC source — the Spark-native counterpart of the reference's Postgres
  * source (conecta-core/src/source/postgres.rs).
  *
  * The reference's architecture (pool → N rayon workers → one bounded query
  * each → cursor stream → columnar transpose, postgres.rs:340-485) IS
  * Spark's partitioned JDBC read: `spark.read.jdbc(url, table, predicates,
  * props)` runs one executor task per predicate, each over its own
  * connection, into columnar batches. The connection-pool sizing rule
  * (max_pool_size defaults to partition count, conecta-core/src/lib.rs:131-139)
  * maps to `numPartitions`.
  *
  * Type conventions ([[TypeMapping]]) execute on two layers:
  *   - [[GraftPgDialect]] (registered once, below) overrides the Catalyst
  *     type where the JDBC getter allows it (uuid/json → string,
  *     PostGIS geometry → EWKB bytes);
  *   - `applyConventions` projects the rest after the load, driven by the
  *     column type names from a zero-row JDBC metadata probe (the same
  *     prepared-statement describe the reference's schema probe runs,
  *     postgres.rs LIMIT 0): TIME → LongType µs since midnight, native
  *     geometric text forms → the documented ArrayType(Double) encodings
  *     via [[Geo.parseGeoText]].
  *
  * Verified end-to-end against embedded Derby (JdbcSpec): partitioned
  * reads with one executor-side connection per predicate, min/max plan
  * metadata, multi-query union, and the TIME µs convention — the Source
  * trait is the test seam, exactly as in the reference
  * (conecta-core/src/metadata.rs:103-261).
  */
final class JdbcSource(val spark: SparkSession, url: String,
    props: Properties = new Properties()) extends Source {

  JdbcSource.ensureDialect()

  /** PG reads resolve plain TIMESTAMP as TimestampNTZType — the
    * reference's Timestamp(µs, no tz) convention (schema.rs:100) —
    * while TIMESTAMPTZ stays TimestampType (the dialect pins it).
    * Scoped to postgresql so the Derby/test paths keep Spark defaults.
    * Asserted per type-zoo column in DialectConformanceSpec. */
  private val preferNtz = url.startsWith("jdbc:postgresql")

  /** Derby (the live test dialect) rejects FROM-less scalar SELECTs;
    * PG keeps the reference's exact merged-COUNT template. */
  override protected def dualFrom: String =
    if (url.startsWith("jdbc:derby")) " from SYSIBM.SYSDUMMY1" else ""

  override def execute(query: String): DataFrame =
    applyConventions(
      spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("preferTimestampNTZ", preferNtz)
        .load(),
      query)

  /** Execute a partition plan: one Spark partition per predicate, matching
    * "one RecordBatch per partition" (conecta-core/src/lib.rs:30-40). */
  def readPlan(plan: PartitionPlan): DataFrame = {
    if (plan.predicates.nonEmpty) {
      // single partitioned query → predicates array, 1 task per range
      val query = plan.config.queries.head
      val dbtable = s"($query) as query_inner"
      val p = new Properties()
      p.putAll(props)
      p.setProperty("preferTimestampNTZ", String.valueOf(preferNtz))
      applyConventions(
        spark.read.jdbc(url, dbtable, plan.predicates.toArray, p), query)
    } else {
      // one or more unpartitioned queries → union of single-partition reads
      plan.dataQueries.map(execute).reduce(_ unionAll _)
    }
  }

  /** Column label → database type name, from the prepared statement's
    * ResultSetMetaData — a zero-row describe, no data fetched. */
  private[graft] def columnDbTypes(query: String): Map[String, String] =
    try {
      val conn = DriverManager.getConnection(url, props)
      try {
        val md = conn.prepareStatement(query).getMetaData
        if (md == null) Map.empty
        else (1 to md.getColumnCount)
          .map(i => md.getColumnLabel(i).toLowerCase ->
            String.valueOf(md.getColumnTypeName(i)).toLowerCase)
          .toMap
      } finally conn.close()
    } catch {
      // Conventions are best-effort sugar, but degrading must be LOUD: a
      // flaky probe connection would otherwise silently change the schema
      // of TIME/geo columns between runs.
      case e: Exception =>
        System.err.println("[graft] WARN: type-convention probe failed " +
          s"for ${Source.sanitizeCredentials(url)} — TIME/geo conventions " +
          "skipped this read: " +
          Source.sanitizeCredentials(String.valueOf(e.getMessage)))
        Map.empty
    }

  private def applyConventions(df: DataFrame, query: String): DataFrame = {
    val dbTypes = columnDbTypes(query)
    if (dbTypes.isEmpty) df
    else JdbcSource.applyTypeConventions(df, dbTypes)
  }
}

object JdbcSource {
  private val dialectRegistered = new java.util.concurrent.atomic.AtomicBoolean

  /** Register [[GraftPgDialect]] exactly once per JVM (registration
    * prepends — repeated calls would shadow with duplicates). */
  def ensureDialect(): Unit =
    if (dialectRegistered.compareAndSet(false, true))
      JdbcDialects.registerDialect(GraftPgDialect)

  private val geoTextTypes =
    Set("point", "line", "circle", "box", "lseg", "path", "polygon")

  /** The post-read type-conventions projection, split from the live
    * metadata probe so the static PG replay (PgRowConformanceSpec) can
    * drive the REAL projection over replayed rows: TIME → LongType µs
    * since midnight, native geometric text forms → the documented
    * ArrayType(Double) encodings via [[Geo.parseGeoText]]. `dbTypes` is
    * column label → database type name (lowercase), as
    * `columnDbTypes` probes it. */
  private[graft] def applyTypeConventions(df: DataFrame,
      dbTypes: Map[String, String]): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      dbTypes.get(f.name.toLowerCase) match {
        case Some("time") => timeToMicros(f).as(f.name)
        case Some(t) if geoTextTypes(t) && f.dataType == StringType =>
          geoParse(t)(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    if (cols.zip(df.schema.fieldNames).forall {
      case (c, n) => c == col(n) }) df
    else df.select(cols: _*)
  }

  /** TIME → µs since midnight (TypeMapping's documented convention;
    * reference: Time64(µs), postgres.rs:607). JDBC getters surface TIME as
    * a timestamp on 1970-01-01 (per the JDBC spec), so µs-since-epoch IS
    * µs-since-midnight; the extract fallback covers drivers/dialects that
    * surface a native time type instead. */
  private def timeToMicros(f: StructField): Column = f.dataType match {
    case TimestampType => unix_micros(col(f.name))
    case LongType | IntegerType => col(f.name).cast(LongType)
    // TimestampNTZType deliberately takes the extract path below: casting
    // NTZ→Timestamp reinterprets the 1970-01-01 wall clock in the session
    // timezone, which offsets the µs-since-midnight convention under any
    // non-UTC spark.sql.session.timeZone. The wall-clock fields are
    // timezone-independent.
    case _ =>
      ((hour(col(f.name)).cast(LongType) * 3600L +
        minute(col(f.name)).cast(LongType) * 60L) * 1000000L +
        (expr(s"extract(SECOND FROM ${f.name})") * 1000000L).cast(LongType))
  }

  /** Null-safe UDF wrapper for the geometric text decoder. UDF is fine
    * here: geo columns are metadata-scale, never the 100 TB hot path. */
  private def geoParse(pgType: String) =
    udf((s: String) => Option(s).map(Geo.parseGeoText(pgType, _)))
}
