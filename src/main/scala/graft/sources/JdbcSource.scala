package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Verified end-to-end against embedded Derby (JdbcSpec): partitioned
  * reads with one executor-side connection per predicate, min/max plan
  * metadata, and multi-query union — the Source trait is the test seam,
  * exactly as in the reference (conecta-core/src/metadata.rs:103-261).
  */
final class JdbcSource(val spark: SparkSession, url: String,
    props: Properties = new Properties()) extends Source {

  override def execute(query: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .load()

  /** Execute a partition plan: one Spark partition per predicate, matching
    * "one RecordBatch per partition" (conecta-core/src/lib.rs:30-40). */
  def readPlan(plan: PartitionPlan): DataFrame = {
    if (plan.predicates.nonEmpty) {
      // single partitioned query → predicates array, 1 task per range
      val dbtable = s"(${plan.config.queries.head}) as query_inner"
      spark.read.jdbc(url, dbtable, plan.predicates.toArray, props)
    } else {
      // one or more unpartitioned queries → union of single-partition reads
      plan.dataQueries.map(execute).reduce(_ unionAll _)
    }
  }
}
