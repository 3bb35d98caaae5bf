package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("bernoulli sample is seed-deterministic and near the target rate") {
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.bernoulli(df, 0.1, seed = 7).as[Long].collect().toSet
    val b = Sampling.bernoulli(df, 0.1, seed = 7).as[Long].collect().toSet
    assert(a == b) // same seed + partitioning → same sample
    assert(math.abs(a.size - 1000) < 200, s"rate off: ${a.size}")
    val c = Sampling.bernoulli(df, 0.1, seed = 8).as[Long].collect().toSet
    assert(a != c) // different seed → different sample
  }

  test("byKeyHash sample is partitioning-independent and near the target rate") {
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.byKeyHash(df, "id", 0.1).as[Long].collect().toSet
    val b = Sampling.byKeyHash(df.repartition(17), "id", 0.1).as[Long].collect().toSet
    assert(a == b) // content-derived → layout can't change the sample
    assert(math.abs(a.size - 10000 * 25 / 256) < 150, s"rate off: ${a.size}")
  }

  test("weightedBernoulli favors heavy rows in proportion and is layout-independent") {
    val df = (1L to 20000L).map(i => (i, if (i % 100 == 0) 100L else 1L))
      .toDF("id", "w")
    val a = Sampling.weightedBernoulli(df, "id", "w", expectedK = 500)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedBernoulli(df.repartition(13), "id", "w", 500)
      .select("id").as[Long].collect().toSet
    assert(a == b) // content-derived -> layout can't change the sample
    // W = 19800*1 + 200*100 = 39800; heavy rows have p = 500*100/39800 > 1
    // -> ALL 200 heavy rows kept; light rows p = 500/39800 ~ 1.26%
    val heavy = a.count(_ % 100 == 0)
    assert(heavy == 200, s"heavy rows must all be kept: $heavy")
    val light = a.size - heavy
    val expLight = 19800.0 * 500 / 39800
    assert(math.abs(light - expLight) < 120, s"light rate off: $light vs $expLight")
  }

  test("systematicPps returns exactly k per group, weighted, layout-independent") {
    val df = (1L to 9000L).map(i => (s"g${i % 3}", i, (i % 7) + 1L))
      .toDF("grp", "id", "w")
    val a = Sampling.systematicPps(df, Seq("grp"), "id", "w", k = 40)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val b = Sampling.systematicPps(df.repartition(11), Seq("grp"), "id", "w", 40)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(a == b)
    val perGroup = a.groupBy(_._1).map { case (g, rows) => g -> rows.size }
    assert(perGroup.values.forall(_ == 40), s"per-group sizes: $perGroup")
    // weight-proportionality: mean weight of sampled rows must exceed the
    // population mean (4.0) since heavy rows are favored
    val wOf = df.select("id", "w").as[(Long, Long)].collect().toMap
    val meanW = a.toSeq.map(r => wOf(r._2)).sum.toDouble / a.size
    assert(meanW > 4.3, s"sampled mean weight not pps-shaped: $meanW")
  }

  test("systematicPps selects an oversized row once, shrinking the sample") {
    val df = (Seq((1L, 1000L)) ++ (2L to 101L).map(i => (i, 1L)))
      .toDF("id", "w")
    val got = Sampling.systematicPps(df, Seq.empty, "id", "w", k = 10)
      .select("id").as[Long].collect()
    assert(got.contains(1L), "the dominant row must be selected")
    assert(got.length < 10 && got.length >= 1, s"absorbed multiples: ${got.length}")
  }
}
