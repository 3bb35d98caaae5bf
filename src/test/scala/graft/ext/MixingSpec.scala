package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, s"d${i % 3}", 10L + i % 7))
      .toDF("id", "dom", "tok")

  test("selection is deterministic and partitioning-independent") {
    val df = corpus(500)
    val parts = Map("d0" -> 1L, "d1" -> 2L, "d2" -> 3L)
    val a = Mixing.sampleToBudget(df.repartition(1), "id", "dom", "tok",
      budgetTokens = 900L, parts = parts)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Mixing.sampleToBudget(df.repartition(13), "id", "dom", "tok",
      budgetTokens = 900L, parts = parts, bucketNibbles = 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("per-domain tokens land within one document of the integer target") {
    val df = corpus(600)
    val parts = Map("d0" -> 1L, "d1" -> 2L, "d2" -> 3L)
    // targets: floor(1200*p/6) = 200/400/600
    val sel = Mixing.sampleToBudget(df, "id", "dom", "tok", 1200L, parts)
    val sums = Mixing.mixtureSummary(sel, "dom")
      .select("dom", "sum_tokens").as[(String, Long)].collect().toMap
    val targets = Map("d0" -> 200L, "d1" -> 400L, "d2" -> 600L)
    for ((d, t) <- targets) {
      assert(sums(d) >= t, s"$d under target: ${sums(d)} < $t")
      assert(sums(d) < t + 17, s"$d overshoots by more than one doc")
    }
    // the selected set is exactly the offset-below-target prefix
    assert(sel.filter(col("offset") >= 600L).count() == 0)
  }

  test("a domain smaller than its target is taken whole; absent domains are excluded") {
    val df = Seq((1L, "small", 5L), (2L, "small", 5L),
      (3L, "big", 50L), (4L, "big", 50L), (5L, "other", 9L))
      .toDF("id", "dom", "tok")
    val sel = Mixing.sampleToBudget(df, "id", "dom", "tok",
      budgetTokens = 200L, parts = Map("small" -> 1L, "big" -> 1L))
    val byDom = sel.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("small") == 2)   // 10 tokens available vs 100 target
    assert(byDom("big") == 2)     // 100 tokens = target, exclusive rule keeps both
    assert(!byDom.contains("other"))
  }
}
