package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram LM scoring: exact MLE arithmetic on a hand-checked corpus,
  * determinism under repartitioning, and the short-document guard. */
class NgramLMSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked MLE scores") {
    // doc0: "a b a b" -> bigrams (a b), (b a), (a b); doc1: "a b"
    // c(a b)=3, c(b a)=1; prefix c(a·)=3, c(b·)=1
    // doc0: (1e6·3/3 + 1e6·1/1 + 1e6·3/3) / 3 = 1e6; doc1: 1e6·3/3 = 1e6
    val df = Seq((0L, "a b a b"), (1L, "a b")).toDF("doc_id", "text")
    val got = NgramLM.bigramScores(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L, 1000000L), (1L, 1L, 1000000L)))
  }

  test("rarer continuations score lower") {
    // "x y" occurs once, "x z" occurs 3 times: P(y|x)=1/4, P(z|x)=3/4
    val df = Seq((0L, "x y"), (1L, "x z"), (2L, "x z"), (3L, "x z"))
      .toDF("doc_id", "text")
    val got = NgramLM.bigramScores(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((0L, 250000L), (1L, 750000L), (2L, 750000L),
      (3L, 750000L)))
  }

  test("documents under two tokens are excluded; partitioning-independent") {
    val docs = (0 until 200).map { i =>
      (i.toLong, if (i % 50 == 0) "solo" else s"w${i % 7} w${i % 5} w${i % 3}")
    }
    val df1 = docs.toDF("doc_id", "text")
    val df2 = df1.repartition(13, col("text"))
    val a = NgramLM.bigramScores(df1, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = NgramLM.bigramScores(df2, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.size == docs.count(_._2 != "solo"))
  }
}
