package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated groups on axes of a 16-dim space: group g peaks at
  // dim 4g (so every 4-dim subspace sees exactly one separated group),
  // plus deterministic small jitter.
  private def corpus(n: Int, jitter: Double = 0.05) = {
    val rows = (0 until n).map { i =>
      val g = i % 4
      val base = Array.fill(16)(jitter * ((i * 7 + 3) % 5))
      base(g * 4) = 1.0
      (i.toLong, base.map(_.toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("topK is deterministic and independent of partitioning") {
    val df = corpus(120)
    val a = ProductQuantization.topK(df.repartition(7), queryId = 0L,
      k = 10, m = 4, ksub = 8, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val b = ProductQuantization.topK(df.repartition(2), queryId = 0L,
      k = 10, m = 4, ksub = 8, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    assert(a == b)
    assert(a.size == 10 && a.map(_._3) == (1L to 10L))
    assert(!a.exists(_._1 == 0L), "query row must be excluded")
  }

  test("nearest neighbors share the query's group") {
    // query 0 is group 0; its PQ-nearest rows must be group-0 members
    // (identical up to jitter, so every subspace code matches).
    val df = corpus(120, jitter = 0.0)
    val top = ProductQuantization.topK(df, queryId = 0L, k = 10,
      m = 4, ksub = 8, iters = 2)
      .as[(Long, Long, Long)].collect()
    assert(top.forall(_._1 % 4 == 0), s"non-group-0 neighbor: ${top.toSeq}")
    assert(top.forall(_._2 == 0L), "zero-jitter group mates must be at PQ distance 0")
  }

  test("pq distance never underestimates wildly vs exact on separated data") {
    // sanity on ordering: a same-group row must rank before any
    // cross-group row for the zero-jitter corpus.
    val df = corpus(40, jitter = 0.0)
    val top1 = ProductQuantization.topK(df, queryId = 1L, k = 3,
      m = 4, ksub = 8, iters = 2)
      .as[(Long, Long, Long)].collect().minBy(_._3)
    assert(top1._1 % 4 == 1L)
  }

  test("dim must divide into m subspaces") {
    val bad = Seq((1L, Seq.fill(10)(0.5f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      ProductQuantization.topK(bad, queryId = 1L, k = 1, m = 4)
    }
  }
}
