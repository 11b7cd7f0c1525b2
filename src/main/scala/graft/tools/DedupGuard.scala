package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.slf4j.LoggerFactory

/** Loud accounting for dropped candidate buckets in the near-dup queries
  * (q27 LSH bands, q29 prefix blocks): a bucket of size m emits m²
  * candidate pairs, so one pathological key can swamp the whole stage —
  * buckets over the configured cap are excluded from candidate
  * generation. That is a correctness-affecting guard and must never be
  * silent: every drop is WARN-logged and counted here, process-wide, so
  * tests and operators can observe the event (the `require(iter <= 100)`
  * fail-loudly instinct of the q53 clustering loop, applied to candidate
  * generation).
  */
object DedupGuard {
  private val log = LoggerFactory.getLogger(getClass)

  /** Total buckets dropped since the last [[reset]]. */
  val skippedBuckets = new AtomicLong(0)

  /** Largest dropped bucket's row count since the last [[reset]]. */
  val largestSkipped = new AtomicLong(0)

  def noteSkipped(n: Long, maxSize: Long, cap: Int, what: String): Unit = {
    skippedBuckets.addAndGet(n)
    largestSkipped.updateAndGet(m => math.max(m, maxSize))
    log.warn(s"[graft] $what: dropped $n candidate bucket(s) over " +
      s"cap=$cap (largest = $maxSize docs); near-duplicate pairs bridged " +
      s"ONLY by those buckets will be missed")
  }

  def reset(): Unit = { skippedBuckets.set(0); largestSkipped.set(0) }
}
