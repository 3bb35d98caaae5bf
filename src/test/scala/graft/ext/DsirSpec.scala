package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target docs repeat "alpha", raw-only docs repeat "omega": alpha's
  // bucket must out-weigh omega's, so target-like docs score higher.
  private def corpus = Seq(
    (1L, "alpha alpha alpha", "a", true),
    (2L, "alpha alpha beta", "a", true),
    (3L, "omega omega omega", "a", false),
    (4L, "omega omega gamma", "a", false),
    (5L, "alpha omega", "b", false),
    (6L, "alpha alpha alpha alpha", "b", true),
    (7L, "omega", "b", false),
    (8L, null.asInstanceOf[String], "b", false)
  ).toDF("doc_id", "text", "src", "tgt")

  test("target-heavy tokens get larger weights than raw-only tokens") {
    val w = Dsir.bucketWeights(corpus, "text", col("tgt"))
    assert(w.length == QualityModel.Buckets.toInt)
    def bkt(t: String) = corpus.sparkSession.range(1)
      .select((Dedup.md5Key28(lit(t)) % QualityModel.Buckets).cast("int"))
      .head().getInt(0)
    assert(w(bkt("alpha")) > w(bkt("omega")))
    // never-seen buckets keep the neutral ratio-1 weight
    val neutral = (0 until w.length).toSet --
      Seq("alpha", "beta", "gamma", "omega").map(bkt).toSet
    assert(neutral.forall(b => w(b) == Dsir.Scale))
  }

  test("selection keeps the per-group top slice, deterministically") {
    val a = Dsir.select(corpus.repartition(5), "text", "src", col("tgt"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Dsir.select(corpus.repartition(2), "text", "src", col("tgt"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // alpha-dominated docs must survive their group's 75th percentile;
    // omega-only docs must not.
    assert(a.contains(1L) && !a.contains(3L))
  }

  test("null/empty text scores 0") {
    val w = Dsir.bucketWeights(corpus, "text", col("tgt"))
    val s = corpus.withColumn("s", Dsir.score(col("text"), w))
      .filter(col("doc_id") === 8L).select("s").as[Long].head()
    assert(s == 0L)
  }
}
