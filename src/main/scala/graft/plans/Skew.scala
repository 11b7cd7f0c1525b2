package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: when one side's join key is heavily skewed
  * (a handful of hot keys own most rows), a plain equi-join sends every
  * row of a hot key to ONE reducer — the straggler that dominates the
  * stage. Salting splits each hot key into `k` sub-keys:
  *
  *   - skewed side: salt = a deterministic hash of OTHER columns mod k
  *     (never rand() — results must be stable under retries/re-planning)
  *   - other side: each row replicates k times, once per salt value
  *
  * The join on (key, salt) then spreads a hot key over k reducers at the
  * cost of k× the small side — the classic trade when the small side is
  * orders of magnitude smaller than the hot key's row count. AQE's
  * runtime skew-join splitting handles moderate skew automatically;
  * explicit salting is the deterministic, plan-level tool for the
  * pathological cases AQE can't fix (a single key too big for one
  * executor even after splitting).
  *
  * Row-parity with the plain join is exact: salting only refines the
  * partitioning key; (key, salt) matches iff key matches (every salt
  * value exists on the replicated side).
  */
object Skew {

  /** Inner equi-join of `skewed` and `small` on `key`, with `skewed`
    * salted `k` ways by the deterministic expression `saltBy`. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String, k: Int,
      saltBy: Column): DataFrame = {
    require(k > 0, s"salt fan-out must be positive, got $k")
    val salted = skewed.withColumn("__salt", pmod(hash(saltBy), lit(k)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(k - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
