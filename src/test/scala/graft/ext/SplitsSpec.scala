package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leakage-safe splitting: near-dup components move as one unit, the
  * assignment is deterministic and partitioning-independent, and no
  * near-dup pair ever straddles the split. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"),
    (3L, "completely different text about training data pipelines here"),
    (4L, "yet another unrelated document speaking of something else"),
    (5L, "the quick brown fox jumps over the lazy dog again and once more")
  ).toDF("doc_id", "text")

  test("near-dup docs land on the same side; singletons split independently") {
    val split = Splits.leakageSafeSplit(docs, "doc_id", "text",
      n = 3, threshold = 0.5)
    val m = split.as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m.size == 5)
    // 1, 2, 5 are near-dups of each other → one unit, one side
    assert(m(1L)._1 == m(2L)._1 && m(2L)._1 == m(5L)._1)
    assert(m(1L)._2 == m(2L)._2 && m(2L)._2 == m(5L)._2)
    // singletons keep their own unit
    assert(m(3L)._1 == 3L && m(4L)._1 == 4L)
  }

  test("no near-dup pair straddles the split (invariant check)") {
    val split = Splits.leakageSafeSplit(docs, "doc_id", "text",
      n = 3, threshold = 0.5)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val straddling = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")),
        Seq("id_a"))
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")),
        Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0L)
  }

  test("assignment is deterministic and partitioning-independent") {
    val a = Splits.leakageSafeSplit(docs.repartition(1), "doc_id", "text",
      n = 3, threshold = 0.5).as[(Long, Long, String)].collect().sorted.toSeq
    val b = Splits.leakageSafeSplit(docs.repartition(7), "doc_id", "text",
      n = 3, threshold = 0.5).as[(Long, Long, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("eval share tracks evalOf256 on a singleton-only corpus") {
    val many = (1 to 2000).map(i => (i.toLong, s"unique document number $i " +
      s"content ${i * 37} markers ${i * 101}")).toDF("doc_id", "text")
    val split = Splits.leakageSafeSplit(many, "doc_id", "text",
      n = 3, threshold = 0.95, evalOf256 = 64) // 25%
    val frac = split.filter(col("split") === "eval").count().toDouble / 2000
    assert(frac > 0.18 && frac < 0.32, s"eval fraction $frac far from 0.25")
  }
}
