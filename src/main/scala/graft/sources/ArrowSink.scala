package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftArrowBridge}

/** Arrow interchange sink — the Spark counterpart of the reference's
  * pyarrow/arro3/nanoarrow backends (conecta-python/src/lib.rs:96-101):
  * the result leaves the engine as Arrow columnar batches, one
  * RecordBatch per partition, with no row-wise copy on the executor side
  * (Spark's ArrowConverters writes column vectors directly).
  *
  * At cluster scale the RDD stays distributed; `collectIpcBatches` is the
  * driver-side hand-off only for results that fit on the driver — the
  * same contract as the reference's in-memory Arrow table.
  */
object ArrowSink {

  /** One serialized Arrow IPC RecordBatch per partition (distributed). */
  def arrowBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    GraftArrowBridge.toArrowBatchRdd(df)

  /** Driver-side collect of the per-partition IPC batches. */
  def collectIpcBatches(df: DataFrame): Array[Array[Byte]] =
    arrowBatchRdd(df).collect()
}
