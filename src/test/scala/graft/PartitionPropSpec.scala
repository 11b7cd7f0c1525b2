package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Bounds

/** Generator-driven properties for the partition bounds math — the
  * invariants the reference asserts only by example
  * (conecta-core/src/partition.rs:136-172): full coverage of [min,max],
  * disjointness, ordering, and the float-stride uneven-split behavior.
  * (Raw ScalaCheck Gen with a fixed seed — the scalatestplus bridge is not
  * in the offline dependency cache.) */
class PartitionPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val argsGen = for {
    min <- Gen.chooseNum(-1000000L, 1000000L)
    span <- Gen.chooseNum(1L, 10000000L)
    n <- Gen.chooseNum(1, 64)
  } yield (min, min + span, n)

  test("bounds cover [min,max] contiguously, ordered, non-empty") {
    samples(argsGen, 500).foreach { case (min, max, n) =>
      val bs = Bounds.bounds(min, max, n)
      assert(bs.nonEmpty && bs.size <= n)
      assert(bs.head._1 == min)
      assert(bs.last._2 == max)
      // contiguous: each stop == next start (half-open [lo,hi) chain)
      bs.sliding(2).foreach {
        case Seq((_, stop), (start2, _)) => assert(stop == start2)
        case _ =>
      }
      bs.foreach { case (lo, hi) => assert(lo <= hi) }
    }
  }

  test("every value in [min,max] lands in exactly one partition") {
    val smallGen = for {
      min <- Gen.chooseNum(0L, 1000L)
      span <- Gen.chooseNum(1L, 500L)
      n <- Gen.chooseNum(1, 10)
    } yield (min, min + span, n)
    samples(smallGen, 200).foreach { case (min, max, n) =>
      val bs = Bounds.bounds(min, max, n)
      (min to max).foreach { v =>
        // membership rule: [lo,hi) for all but the last range, [lo,hi] last
        val hits = bs.zipWithIndex.count { case ((lo, hi), i) =>
          if (i == bs.size - 1) v >= lo && v <= hi else v >= lo && v < hi
        }
        assert(hits == 1, s"value $v in bounds($min,$max,$n)=$bs hit $hits")
      }
    }
  }

  test("reference example: bounds(0,10,3) = [(0,3),(3,6),(6,10)]") {
    // partition.rs:150-153 — float stride, last takes remainder
    assert(Bounds.bounds(0, 10, 3) == Seq((0L, 3L), (3L, 6L), (6L, 10L)))
  }
}
