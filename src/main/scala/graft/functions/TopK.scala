package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (SURVEY.md §2.2 "UDF/UDAF surface") — keeps at
  * most k rows per group ordered by (score DESC, key ASC), with a
  * mergeable buffer: partial top-k lists combine associatively, so Spark
  * runs it with map-side partial aggregation and a k-row shuffle per
  * group instead of the full-partition sort a `row_number() <= k` window
  * needs. At 100 TB that is the difference between shuffling k rows per
  * group and sorting every row.
  *
  * Determinism: total order on (score DESC, k1..k4 ASC) — ties cannot
  * reorder across partitionings, so results are partition-invariant.
  */
object TopK {

  /** One scored row: score + a 4-part unique tie-break key (matches the
    * lineitem unique key shape; generic enough for any table). */
  case class Scored(score: Double, k1: Long, k2: Long, k3: Long, k4: Long)

  private val ord: Ordering[Scored] =
    Ordering.by(s => (-s.score, s.k1, s.k2, s.k3, s.k4))

  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      insert(buf, a)

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      b2.foldLeft(b1)(insert)

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()

    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()

    // k is small; an ordered Vector insert beats heap overhead at this size
    // and keeps the buffer a plain encodable product.
    private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      if (buf.size == k && ord.gteq(a, buf.last)) buf
      else {
        val i = buf.indexWhere(b => ord.lt(a, b)) match {
          case -1 => buf.size
          case n => n
        }
        val merged = (buf.take(i) :+ a) ++ buf.drop(i)
        if (merged.size > k) merged.take(k) else merged
      }
    }
  }
}
