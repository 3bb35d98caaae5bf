package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(-7L, 0L, 3L, 10L, 15L, 99L, 100L, 250L)
    .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
  // overlapping, touching, negative-spanning, and empty intervals
  private def ranges = Seq(
    (1L, 0L, 10L), (2L, 5L, 15L), (3L, -10L, -1L), (4L, 100L, 100L),
    (5L, 90L, 260L), (6L, 50L, 40L) // inverted → contributes nothing
  ).toDF("rid", "lo", "hi")

  private def pairsVia(width: Long): Set[(Long, Long)] =
    RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", width)
      .select("pid", "rid").as[(Long, Long)].collect().toSet

  private val expected: Set[(Long, Long)] =
    points.crossJoin(ranges)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet

  test("matches the nested-loop pair set, inclusive ends, negatives") {
    assert(pairsVia(8L) == expected)
  }

  test("every qualifying pair exactly once, any bucket width") {
    Seq(1L, 3L, 50L, 1000L).foreach { w =>
      val rows = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", w)
        .select("pid", "rid").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.distinct.size, s"dup pairs at width $w")
      assert(rows.toSet == expected, s"wrong pairs at width $w")
    }
  }

  test("plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  // Past 2^53 a double can no longer represent every long (near 2^60 the
  // grid steps by 128), so the old `floor(v.cast(double)/w)` bucketing
  // collapses distinct keys and skews buckets vs exact integer division.
  // The integer-floorDiv bucketing must keep the pair set exactly equal
  // to the nested-loop oracle out there, including at widths that do not
  // divide the double grid.
  test("exact pair set above 2^53 (doubles can't represent the keys)") {
    val base = 1L << 60
    val bigPoints = Seq(base - 130L, base - 1L, base, base + 63L, base + 65L,
      base + 70L, base + 127L, base + 128L, base + 129L, Long.MaxValue - 3L,
      -(base + 65L), Long.MinValue + 2L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
    val bigRanges = Seq(
      (1L, base - 2L, base + 66L), (2L, base + 64L, base + 64L),
      (3L, base + 65L, base + 130L), (4L, Long.MaxValue - 10L, Long.MaxValue),
      (5L, -(base + 100L), -(base + 60L)), (6L, Long.MinValue, Long.MinValue + 5L)
    ).toDF("rid", "lo", "hi")
    val oracle = bigPoints.crossJoin(bigRanges)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    Seq(1L, 3L, 64L, 127L).foreach { w =>
      val rows = RangeJoin.pointInRange(bigPoints, "v", bigRanges, "lo", "hi", w)
        .select("pid", "rid").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.distinct.size, s"dup pairs at width $w")
      assert(rows.toSet == oracle, s"wrong pairs at width $w")
    }
  }

  // ------------------------------------------------------- interval overlap
  // touching, nested, disjoint, negative-spanning, and inverted intervals
  private def leftIvals = Seq(
    (10L, 0L, 10L), (11L, -20L, -5L), (12L, 100L, 200L), (13L, 7L, 7L),
    (14L, 50L, 30L) // inverted → contributes nothing
  ).toDF("lid", "llo", "lhi")

  private val overlapExpected: Set[(Long, Long)] =
    leftIvals.crossJoin(ranges)
      .filter(col("llo") <= col("lhi") && col("lo") <= col("hi") &&
        col("llo") <= col("hi") && col("lo") <= col("lhi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet

  test("intervalOverlap matches the nested loop, exactly once, any width") {
    Seq(1L, 4L, 16L, 500L).foreach { w =>
      val rows = RangeJoin.intervalOverlap(
          leftIvals, "llo", "lhi", ranges, "lo", "hi", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.distinct.size, s"dup pairs at width $w")
      assert(rows.toSet == overlapExpected, s"wrong pairs at width $w")
    }
  }

  test("intervalOverlap plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.intervalOverlap(
        leftIvals, "llo", "lhi", ranges, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
