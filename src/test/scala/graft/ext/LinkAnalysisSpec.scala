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
}
