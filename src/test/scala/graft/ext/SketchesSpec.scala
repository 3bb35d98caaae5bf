package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, bounded error above, and a
  * deterministic result under any physical partitioning. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("exact when the group holds fewer than k distinct values") {
    val df = (0 until 1000).map(i => ("g", s"v${i % 37}")).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64).collect()
    assert(got.length == 1 && got.head.getLong(1) == 37L)
  }

  test("estimate within 15% at k=256 on 10k distinct values") {
    val df = (0 until 10000).map(i => ("g", s"value_$i")).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 256)
      .collect().head.getLong(1)
    assert(math.abs(est - 10000L) <= 1500L, s"estimate $est too far from 10000")
  }

  test("deterministic under repartitioning; groups are independent") {
    val rows = (0 until 5000).map(i => (s"g${i % 3}", s"v${i % (700 + i % 3)}"))
    val a = Sketches.kmvDistinct(rows.toDF("g", "v"), Seq("g"), "v", k = 128)
      .orderBy("g").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val b = Sketches.kmvDistinct(
        rows.toDF("g", "v").repartition(17, col("v")), Seq("g"), "v", k = 128)
      .orderBy("g").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(a == b && a.size == 3)
  }

  test("duplicates never inflate the estimate") {
    val base = (0 until 500).map(i => ("g", s"v$i"))
    val dup = base ++ base ++ base
    val a = Sketches.kmvDistinct(base.toDF("g", "v"), Seq("g"), "v", k = 64)
      .collect().head.getLong(1)
    val b = Sketches.kmvDistinct(dup.toDF("g", "v"), Seq("g"), "v", k = 64)
      .collect().head.getLong(1)
    assert(a == b)
  }

  private def cellMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("count-min: estimates never undercount; exact when collision-free") {
    val rows = (0 until 3000).map(i => s"tok${i % 37}").toDF("v")
    val cells = Sketches.countMinCells(rows, "v", depth = 4, width = 512)
    val est = Sketches.countMinEstimate(rows, "v", cells, depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = (0 until 3000).map(i => s"tok${i % 37}")
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (t, n) => assert(est(t) >= n, s"undercounted $t") }
    // 37 values in 512 cells across 4 rows: at least one row is
    // collision-free for every value (pigeonhole odds; deterministic
    // hashes make this a fixed property of the test data)
    assert(est == exact, "expected exact estimates at this sketch size")
  }

  test("count-min cells are mergeable: sketch(A union B) = sum of sketches") {
    val a = (0 until 1000).map(i => s"t${i % 31}").toDF("v")
    val b = (0 until 800).map(i => s"t${i % 53}").toDF("v")
    val merged = cellMap(Sketches.countMinCells(a.union(b), "v", 4, 256))
    val summed = {
      val ca = cellMap(Sketches.countMinCells(a, "v", 4, 256))
      val cb = cellMap(Sketches.countMinCells(b, "v", 4, 256))
      (ca.keySet ++ cb.keySet).map(k =>
        k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    }
    assert(merged == summed)
  }
}
