package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Classifier, CorpusQuality, CrawlIngest, Embeddings, Media, MediaIngest, ReferenceParity, Relational, StreamingParity, TextPipeline, WordVectors}

/** Driver contract — every implemented operator from SURVEY.md §2 gets a
  * `queries` entry; every SQL-expressible one gets a matching DuckDB oracle
  * in `oracleSql` with IDENTICAL column names and a deterministic ORDER BY
  * on both sides. Query groups live in [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Graft.readSql(spark, dir,
      Seq("select * from lineitem"),
      partitionOn = Some("l_orderkey"), partitionNum = Some(4))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceParity.defs ++ Relational.defs ++ TextPipeline.defs ++
      CorpusQuality.defs ++ Embeddings.defs ++ Media.defs ++ MediaIngest.defs ++
      StreamingParity.defs ++ CrawlIngest.defs ++ Classifier.defs ++
      WordVectors.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceParity.oracles ++ Relational.oracles ++ TextPipeline.oracles ++
      CorpusQuality.oracles ++ Embeddings.oracles ++ Media.oracles ++ MediaIngest.oracles ++
      StreamingParity.oracles ++ CrawlIngest.oracles ++ Classifier.oracles ++
      WordVectors.oracles
}
