package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftArrowBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's internal bloom-filter expressions (the
  * machinery behind `InjectRuntimeFilter`'s row-group pruning, reused
  * here to COMPILE membership side-tables): [[agg]] folds a key column
  * into one serialized `org.apache.spark.util.sketch.BloomFilter`
  * (TypedImperativeAggregate — partial buffers merge, so the build is
  * one distributed pass), and [[mightContain]] probes a driver-held
  * filter binary per row, codegen'd via `BloomFilterMightContain`.
  *
  * Contract: NO false negatives — a key that was aggregated always
  * probes true — so a negative probe proves non-membership and may skip
  * exact verification; a positive probe proves nothing and must still be
  * verified by the exact join (CorpusEquivalenceSpec pins both halves).
  * Keys are pre-hashed with `xxhash64` on both sides, matching the
  * aggregate's expected long input.
  */
object Bloom {

  /** Aggregate `c`'s values into one bloom-filter binary sized for
    * `expectedItems` keys across `numBits` bits. */
  def agg(c: Column, expectedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(
      new XxHash64(Seq(expression(c))),
      Literal(expectedItems), Literal(numBits), 0, 0)
      .toAggregateExpression())

  /** Per-row membership probe of `c` against a filter binary collected
    * to the driver (a 1-row artifact read — the bounded-metadata grain).
    * The binary rides the plan as a foldable literal, the shape
    * `BloomFilterMightContain` requires; at the conf-capped default
    * (≤ 2^27 bits = 16 MB) that is broadcast-equivalent cost. */
  def mightContain(filter: Array[Byte], c: Column): Column =
    column(BloomFilterMightContain(Literal(filter),
      new XxHash64(Seq(expression(c)))))
}
