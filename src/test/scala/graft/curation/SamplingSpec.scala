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
}
