package graft.ext

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  test("a 10-token span shared by two docs covers exactly 10 tokens in each") {
    val docs = Seq(
      (1L, s"$shared unique1 unique2"),
      (2L, s"prefix $shared tail"),
      (3L, "nothing here matches anything else at all ever once")
    ).toDF("doc_id", "text")
    val cov = SpanDedup.coverage(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(cov == Seq((1L, 12L, 10L), (2L, 12L, 10L), (3L, 9L, 0L)))
  }

  test("within-document repetition alone is not cross-document duplication") {
    val docs = Seq(
      (1L, s"$shared filler $shared"),
      (2L, "totally different words that never repeat anywhere in this corpus")
    ).toDF("doc_id", "text")
    val cov = SpanDedup.coverage(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(cov.map(_._3) == Seq(0L, 0L))
  }

  test("docs shorter than the window are never marked; result is partitioning-independent") {
    val docs = Seq(
      (1L, "short doc"),
      (2L, shared),
      (3L, shared)
    ).toDF("doc_id", "text")
    val a = SpanDedup.coverage(docs.repartition(1), "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = SpanDedup.coverage(docs.repartition(7), "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a == Seq((1L, 2L, 0L), (2L, 10L, 10L), (3L, 10L, 10L)))
  }
}
