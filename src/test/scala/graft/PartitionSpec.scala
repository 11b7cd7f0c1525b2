package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans._

/** Planner unit tests — same cases as the reference's in-module tests
  * (conecta-core/src/partition.rs:136-301, metadata.rs:103-261), plus
  * randomized properties the reference only asserts by example. */
class PartitionSpec extends AnyFunSuite {

  test("bounds: even split") {
    assert(Bounds.bounds(0, 10, 2) == Seq((0L, 5L), (5L, 10L)))
  }

  test("bounds: uneven split — last takes remainder") {
    assert(Bounds.bounds(0, 10, 3) == Seq((0L, 3L), (3L, 6L), (6L, 10L)))
  }

  test("bounds: single partition") {
    assert(Bounds.bounds(5, 10, 1) == Seq((5L, 10L)))
  }

  test("bounds: invalid args error") {
    intercept[IllegalArgumentException](Bounds.bounds(10, 5, 3))
    intercept[IllegalArgumentException](Bounds.bounds(0, 10, 0))
    intercept[IllegalArgumentException](Bounds.bounds(5, 5, 2))
  }

  test("bounds property: ranges are contiguous and cover [min,max]") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val min = rnd.between(-100000L, 100000L)
      val max = min + rnd.between(1L, 1000000L)
      val n = rnd.between(1, 65)
      val bs = Bounds.bounds(min, max, n)
      assert(bs.length == n)
      assert(bs.head._1 == min)
      assert(bs.last._2 == max)
      bs.sliding(2).foreach {
        case Seq((_, stop), (start2, _)) => assert(stop == start2)
        case _ =>
      }
      bs.foreach { case (lo, hi) => assert(lo <= hi) }
    }
  }

  test("config: multiple queries exclude partition options") {
    intercept[IllegalArgumentException] {
      PartitionConfig(Seq("q1", "q2"), partitionOn = Some("c"))
    }
    intercept[IllegalArgumentException] {
      PartitionConfig(Seq("q1", "q2"), partitionNum = Some(2))
    }
    intercept[IllegalArgumentException] {
      PartitionConfig(Seq("q1", "q2"), partitionRange = Some((0L, 5L)))
    }
  }

  test("config: partitionNum/partitionRange require partitionOn") {
    intercept[IllegalArgumentException] {
      PartitionConfig(Seq("q"), partitionNum = Some(2))
    }
    intercept[IllegalArgumentException] {
      PartitionConfig(Seq("q"), partitionRange = Some((0L, 5L)))
    }
  }

  test("config: range min >= max errors") {
    intercept[IllegalArgumentException] {
      PartitionConfig(Seq("q"), partitionOn = Some("c"),
        partitionRange = Some((5L, 5L)))
    }
  }

  test("modes: on+num → OnePartitionedQuery; >1 query → PartitionedQueries; else unpartitioned") {
    assert(PartitionConfig(Seq("q"), Some("c"), Some(2)).mode ==
      QueryPartitioningMode.OnePartitionedQuery)
    assert(PartitionConfig(Seq("q1", "q2")).mode ==
      QueryPartitioningMode.PartitionedQueries)
    assert(PartitionConfig(Seq("q")).mode ==
      QueryPartitioningMode.OneUnpartitionedQuery)
    // range-without-num quirk (partition.rs:75-79, metadata.rs:219-237)
    assert(PartitionConfig(Seq("q"), Some("c"), None, Some((0L, 9L))).mode ==
      QueryPartitioningMode.OneUnpartitionedQuery)
  }

  test("plan: bounded queries use half-open ranges with closed tail") {
    val plan = Planner.createPartitionPlan(
      PartitionConfig(Seq("select * from t"), Some("id"), Some(3)),
      fetchMinMax = _ => (0L, 10L))
    assert(plan.dataQueries == Seq(
      "select * from (select * from t) as query_inner where id >= 0 and id < 3",
      "select * from (select * from t) as query_inner where id >= 3 and id < 6",
      "select * from (select * from t) as query_inner where id >= 6 and id <= 10"))
    assert(plan.predicates.last == "id >= 6 and id <= 10")
    assert(plan.minValue.contains(0L) && plan.maxValue.contains(10L))
  }

  test("plan: user range skips the min/max fetch") {
    val plan = Planner.createPartitionPlan(
      PartitionConfig(Seq("q"), Some("id"), Some(2), Some((4L, 8L))),
      fetchMinMax = _ => fail("min/max must not be fetched when range given"))
    assert(plan.numPartitions == 2)
    assert(plan.minValue.contains(4L) && plan.maxValue.contains(8L))
  }

  test("plan: range-without-num records range but generates no bounded queries") {
    val plan = Planner.createPartitionPlan(
      PartitionConfig(Seq("q"), Some("id"), None, Some((4L, 8L))),
      fetchMinMax = _ => fail("no fetch expected"))
    assert(plan.dataQueries == Seq("q"))
    assert(plan.predicates.isEmpty)
    assert(plan.minValue.contains(4L) && plan.maxValue.contains(8L))
  }

  test("plan: JSON rendering round-trips key fields") {
    val plan = Planner.createPartitionPlan(
      PartitionConfig(Seq("select 1"), Some("id"), Some(2)),
      fetchMinMax = _ => (1L, 9L))
    val js = plan.toJson
    assert(js.contains("\"min_value\":1"))
    assert(js.contains("\"max_value\":9"))
    assert(js.contains("\"partition_num\":2"))
  }
}
