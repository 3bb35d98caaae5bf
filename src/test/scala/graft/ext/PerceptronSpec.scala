package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-perceptron training: learns a separable vocabulary split,
  * weights are a pure function of the (unordered) document set, and the
  * degenerate shapes (empty text, single class) stay well-defined. */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies → linearly separable by unigram buckets
  private def docs = (0 until 60).map { i =>
    if (i % 2 == 0) (i.toLong, "good solid prose with real words", true)
    else (i.toLong, "zz qq xx spam junk noise", false)
  }.toDF("id", "text", "pos")

  test("learns a separable split: training accuracy 100%") {
    val w = Perceptron.train(docs, "text", col("pos"), iterations = 3)
    val (_, pred) = Perceptron.predict(col("text"), w)
    val wrong = docs.filter(pred =!= col("pos")).count()
    assert(wrong == 0L, s"$wrong misclassified after 3 rounds")
  }

  test("weights are partitioning-independent") {
    val a = Perceptron.train(docs.repartition(1), "text", col("pos"), 2)
    val b = Perceptron.train(docs.repartition(7, col("id")), "text",
      col("pos"), 2)
    assert(a.toSeq == b.toSeq)
  }

  test("empty and null text score as bias only") {
    val d = Seq((1L, "", false), (2L, null: String, false),
      (3L, "words here", true)).toDF("id", "text", "pos")
    val w = Perceptron.train(d, "text", col("pos"), iterations = 2)
    val scores = d.select(col("id"), Perceptron.margin(col("text"), w))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) == w(Perceptron.Bias.toInt))
    assert(scores(2L) == w(Perceptron.Bias.toInt))
  }

  test("single-class input pushes every margin positive") {
    val d = (0 until 20).map(i => (i.toLong, s"tok$i common", true))
      .toDF("id", "text", "pos")
    val w = Perceptron.train(d, "text", col("pos"), iterations = 2)
    val (_, pred) = Perceptron.predict(col("text"), w)
    assert(d.filter(!pred).count() == 0L)
  }
}
