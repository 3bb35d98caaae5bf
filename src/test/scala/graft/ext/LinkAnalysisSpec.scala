package graft.ext

import graft.SparkSpec

class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  /** Straight Scala replay of the fixed-point spec, for tiny graphs. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int,
      dNum: Int): Map[String, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val floor0 = 1000000000000L / n
    var r = nodes.map(_ -> floor0).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        r(s) * w / outw(s)
      }.sum).toMap
      r = nodes.map(nd =>
        nd -> (dNum * in.getOrElse(nd, 0L) + (100 - dNum) * floor0) / 100)
        .toMap
    }
    r
  }

  test("pageRank matches the integer spec on a hand graph") {
    val edges = Seq(
      ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "a", 1L), ("d", "c", 3L))
    val got = LinkAnalysis.pageRank(
        edges.toDF("s", "d", "w"), "s", "d", "w", iterations = 5)
      .as[(String, Long)].collect().toMap
    val want = reference(edges, 5, 85)
    assert(got == want, s"got $got\nwant $want")
    // authority shape: d has no inbound edge — teleport share only, the
    // strict minimum; a and c sit on the a↔c cycle and accumulate rank
    assert(got("d") < got.values.filterNot(_ == got("d")).min)
  }

  test("pageRank is partitioning-independent and damping-sensitive") {
    val edges = (1L to 400L).map(i =>
      (s"n${i % 37}", s"n${(i * 7) % 41}", (i % 5) + 1))
      .toDF("s", "d", "w")
    val a = LinkAnalysis.pageRank(edges, "s", "d", "w", 4)
      .as[(String, Long)].collect().toMap
    val b = LinkAnalysis.pageRank(edges.repartition(13), "s", "d", "w", 4)
      .as[(String, Long)].collect().toMap
    assert(a == b)
    val c = LinkAnalysis.pageRank(edges, "s", "d", "w", 4, dampingNum = 50)
      .as[(String, Long)].collect().toMap
    assert(a != c)
  }

  test("pageRank plan does not grow with iterations (lineage cut per round)") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("s", "d", "w")
    val r8 = LinkAnalysis.pageRank(edges, "s", "d", "w", 8)
    // a materialized (checkpointed) result's plan is a scan, not 8 joins
    val plan = r8.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"lineage not cut:\n$plan")
  }

  test("personalized: mass concentrates at seeds; unreachable nodes starve") {
    // a→b→c chain plus isolated pair d↔e; seed = {a}
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("d", "e", 1L), ("e", "d", 1L)).toDF("s", "d", "w")
    val seeds = Seq("a").toDF("node")
    val got = LinkAnalysis.personalizedPageRank(
        edges, "s", "d", "w", seeds, iterations = 6)
      .as[(String, Long)].collect().toMap
    // d/e receive no teleport and no inflow from the seeded component
    assert(got("d") == 0L && got("e") == 0L, got.toString)
    assert(got("a") > 0L && got("b") > 0L && got("c") > 0L)
    // only the seed gets teleport, so it outranks its followers here
    assert(got("a") > got("c"), got.toString)
  }

  test("label propagation: a triangle converges to its min label; " +
      "a bare pair oscillates deterministically") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("c", "b", 1L), ("c", "a", 1L), ("a", "c", 1L),
      ("x", "y", 1L), ("y", "x", 1L)).toDF("s", "d", "w")
    val got = LinkAnalysis.labelPropagation(edges, "s", "d", "w", 3)
      .as[(String, String)].collect().toMap
    assert(got("a") == "a" && got("b") == "a" && got("c") == "a", got.toString)
    // synchronous LPA's known bipartite artifact (GraphFrames shares
    // it): an isolated pair swaps labels every round — DETERMINISTIC,
    // so after 3 (odd) rounds each carries the other's label, and
    // after 4 its own again
    assert(got("x") == "y" && got("y") == "x", got.toString)
    val even = LinkAnalysis.labelPropagation(edges, "s", "d", "w", 4)
      .as[(String, String)].collect().toMap
    assert(even("x") == "x" && even("y") == "y", even.toString)
  }

  test("label propagation weights dominate ties deterministically") {
    // b hears label 'a' with weight 1 and label 'z' with weight 3
    val edges = Seq(("a", "b", 1L), ("z", "b", 3L), ("b", "a", 1L),
      ("b", "z", 1L)).toDF("s", "d", "w")
    val got = LinkAnalysis.labelPropagation(edges, "s", "d", "w", 1)
      .as[(String, String)].collect().toMap
    assert(got("b") == "z", got.toString)
    // equal weights → smallest label wins: a and z both weigh 2
    val tie = Seq(("a", "b", 2L), ("z", "b", 2L), ("b", "a", 1L),
      ("b", "z", 1L)).toDF("s", "d", "w")
    val got2 = LinkAnalysis.labelPropagation(tie, "s", "d", "w", 1)
      .as[(String, String)].collect().toMap
    assert(got2("b") == "a", got2.toString)
  }
}
