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

  test("temperature mixture: sqrt targets upweight small domains, selection exact") {
    // d0 has 9× the tokens of d1 → sqrt tempers the 9:1 ratio to 3:1
    val df = ((1 to 900).map(i => (i.toLong, "d0", 10L)) ++
      (901 to 1000).map(i => (i.toLong, "d1", 10L)))
      .toDF("id", "dom", "tok")
    val sel = Mixing.sampleToTemperatureBudget(df, "id", "dom", "tok",
      budgetTokens = 4000L)
    val tg = sel.groupBy("dom").agg(max("target")).as[(String, Long)]
      .collect().toMap
    // shares: sqrt(9000)=94.868…, sqrt(1000)=31.623…; targets 3:1 ±1 floor
    assert(math.abs(tg("d0") - 3L * tg("d1")) <= 3,
      s"sqrt tempering should give ~3:1, got $tg")
    assert(tg.values.sum <= 4000L && tg.values.sum > 3990L)
    // selection honors the exclusive-offset rule per domain
    assert(sel.filter(col("offset") >= col("target")).count() == 0)
    val sums = sel.groupBy("dom").agg(sum("n_tokens")).as[(String, Long)]
      .collect().toMap
    for ((d, t) <- tg) assert(sums(d) >= t && sums(d) < t + 11,
      s"$d: ${sums(d)} vs target $t")
    // deterministic and partitioning-independent
    val again = Mixing.sampleToTemperatureBudget(df.repartition(17), "id",
      "dom", "tok", 4000L, bucketNibbles = 1).select("id").as[Long]
      .collect().sorted.toSeq
    assert(again == sel.select("id").as[Long].collect().sorted.toSeq)
  }

  test("upsampleToBudget replicates small domains across tagged epochs") {
    // d0: 100 docs × 10 tokens = 1000 mass; d1: 10 docs × 10 = 100 mass
    val df = ((1 to 100).map(i => (i.toLong, "d0", 10L)) ++
      (101 to 110).map(i => (i.toLong, "d1", 10L))).toDF("id", "dom", "tok")
    // equal parts of 1000: d0 target 500 (downsample), d1 target 500
    // (5 full epochs of its 100-token mass)
    val up = Mixing.upsampleToBudget(df, "id", "dom", "tok",
      budgetTokens = 1000L, parts = Map("d0" -> 1L, "d1" -> 1L))
    val byDom = up.groupBy("dom")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"),
        max("epoch").as("maxe"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // d0: plain downsample prefix — 50 docs, epoch 0 only
    assert(byDom("d0")._2 == 50L && byDom("d0")._4 == 0L)
    // d1: every doc exactly 5 times, epochs 0..4, 500 tokens total
    assert(byDom("d1")._2 == 50L && byDom("d1")._3 == 500L &&
      byDom("d1")._4 == 4L)
    assert(up.filter(col("dom") === "d1").groupBy("id").count()
      .filter(col("count") =!= 5L).count() == 0L)
    // fractional epoch: target 550 → 5 full + the md5-prefix half epoch
    val frac = Mixing.upsampleToBudget(df, "id", "dom", "tok", 1100L,
      Map("d0" -> 1L, "d1" -> 1L))
      .filter(col("dom") === "d1")
    assert(frac.count() == 55L)
    assert(frac.groupBy("id").count().as[(Long, Long)].collect()
      .forall { case (_, c) => c == 5L || c == 6L })
    // the downsample half matches sampleToBudget's selection exactly
    val down = Mixing.sampleToBudget(df, "id", "dom", "tok", 1000L,
      Map("d0" -> 1L, "d1" -> 1L)).filter(col("dom") === "d0")
      .select("id").as[Long].collect().sorted.toSeq
    val upD0 = up.filter(col("dom") === "d0").select("id").as[Long]
      .collect().sorted.toSeq
    assert(upD0 == down)
    // partitioning independence
    val again = Mixing.upsampleToBudget(df.repartition(13), "id", "dom",
      "tok", 1000L, Map("d0" -> 1L, "d1" -> 1L), bucketNibbles = 1)
    assert(again.select("id", "epoch").as[(Long, Long)].collect().sorted.toSeq
      == up.select("id", "epoch").as[(Long, Long)].collect().sorted.toSeq)
  }
}
