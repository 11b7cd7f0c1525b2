package org.apache.spark.sql

import org.apache.spark.rdd.RDD

/** Access bridge for Spark's `private[sql]` Arrow conversion — lives in
  * the `org.apache.spark.sql` package solely to satisfy the access
  * qualifier. Public surface is [[graft.sources.ArrowSink]]. */
object GraftArrowBridge {

  /** One Arrow IPC RecordBatch (serialized bytes) per Spark partition —
    * the reference's one-RecordBatch-per-partition contract
    * (conecta-core/src/lib.rs:30-52). */
  def toArrowBatchRdd(df: Dataset[Row]): RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .toArrowBatchRdd

  /** Wrap a raw Catalyst Expression as a Column (classic backend). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst Expression (classic backend). */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
