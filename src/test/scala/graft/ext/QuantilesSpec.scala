package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact grouped quantiles over the compressed (group, value, count)
  * frame: discrete (lower) quantile semantics, integer arithmetic. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p100", 1L, 1L))

  test("known small distributions") {
    // g=a: 1..10 -> p50=5 (cum 5 >= 5), p90=9, p100=10
    // g=b: all equal -> every quantile is that value
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 7).map(_ => ("b", 42L))).toDF("g", "v")
    val out = Quantiles.exactQuantiles(df, "g", "v", pcts)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((5L, 9L, 10L, 10L)))
    assert(out("b") == ((42L, 42L, 42L, 7L)))
  }

  test("matches sort-based quantiles on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      (s"g${i % 3}", (rnd.nextInt(40) + 1).toLong))
    val df = rows.toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, "g", "v", pcts)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      def q(num: Long, den: Long): Long =
        sorted(((num * sorted.size + den - 1) / den - 1).toInt)
      assert(got(g) == ((q(1, 2), q(9, 10), q(1, 1))), s"group $g")
    }
  }

  test("keepAboveGroupQuantile keeps exactly each group's top quartile") {
    // g=a: 1..8 -> p75 = 6, kept {6,7,8}; g=b: all 5s -> threshold 5,
    // EVERY row kept (ties at the cutoff are inclusive by design)
    val df = ((1 to 8).map(v => ("a", v.toLong)) ++
      (1 to 4).map(_ => ("b", 5L))).toDF("g", "v")
    val kept = Quantiles.keepAboveGroupQuantile(df, "g", "v", 3L, 4L)
    val byG = kept.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(byG("a").map(_._2).sorted.toSeq == Seq(6L, 7L, 8L))
    assert(byG("a").forall(r => r._4 == 6L && r._3 == 8L))
    assert(byG("b").length == 4 && byG("b").forall(_._4 == 5L))
    // deterministic under repartitioning
    val again = Quantiles
      .keepAboveGroupQuantile(df.repartition(5), "g", "v", 3L, 4L)
    assert(again.except(kept).isEmpty && kept.except(again).isEmpty)
  }

  test("sampleQuantiles is deterministic, mergeable-shaped, near exact") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => ("g", i, (i % 1000).toDouble))
      .toDF("grp", "id", "v")
    val pcts = Seq(("p50", 1L, 2L), ("p90", 9L, 10L))
    val a = Quantiles.sampleQuantiles(df, "grp", "id", "v", 500, pcts)
      .collect().head
    val b = Quantiles.sampleQuantiles(df.repartition(17), "grp", "id", "v",
      500, pcts).collect().head
    assert(a == b) // layout-independent
    assert(a.getAs[Long]("sample_rows") == 500L)
    // v is uniform on [0,1000): the sampled p50/p90 must be near 500/900
    assert(math.abs(a.getAs[Double]("p50") - 500) < 80, a.toString)
    assert(math.abs(a.getAs[Double]("p90") - 900) < 60, a.toString)
  }
}
