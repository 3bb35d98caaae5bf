package graft.ext

import graft.SparkSpec
import graft.curation.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The q137 composed-pipeline invariants that hold on ANY corpus —
  * the oracle gate pins exact values on the fixtures; these pin the
  * stage ALGEBRA: monotone survivor counts, keep-the-smallest-id
  * semantics at both dedup stages, and a shard assignment that is a
  * balanced partition of exactly the mixture's selection. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // 120 docs, 3 sources; ids ≡ 1,2 (mod 40) share one near-identical
  // text family per source (planted near-dups), ids ≡ 3,4 are exact
  // duplicates of each other, the rest are unique English-ish text
  private def docs: DataFrame = (1 to 120).map { i =>
    val src = s"src${i % 3}"
    val base = s"the quick brown fox jumps over the lazy dog and runs to " +
      s"the river bank with a stick number ${i / 40}"
    val text = i % 40 match {
      case 1 => base + " extra"
      case 2 => base + " added"
      case 3 | 4 => s"a common duplicate text for the group in source $src " +
        "that is long enough to pass the quality gate easily today"
      case _ => base + s" unique tail $i of source $src for the test corpus"
    }
    (i.toLong, src, text)
  }.toDF("doc_id", "source", "text")

  private def stages(df: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val gated = TextAnalysis.qualityFeatures(df)
      .withColumn("lang_guess", TextAnalysis.langId(col("text")))
      .filter(col("lang_guess") === "en" && col("n_tokens") > 0)
      .select(col("doc_id"), col("source"), col("text"))
    val exact = Dedup.exact(gated, "doc_id", "text")
    val losers = Dedup.nearDupComponents(exact, "doc_id", "text", 3, 0.8)
      .filter(col("doc_id") =!= col("component")).select(col("doc_id"))
    (gated, exact, exact.join(losers, Seq("doc_id"), "left_anti"))
  }

  test("each stage only removes rows, and removes by keep-smallest-id") {
    val (gated, exact, unique) = stages(docs)
    val (ng, ne, nu) = (gated.count(), exact.count(), unique.count())
    assert(ng >= ne && ne >= nu && nu > 0, s"not monotone: $ng $ne $nu")
    // exact dups (ids ≡ 3,4 mod 40 per source-family text) keep the min id
    val exIds = exact.select("doc_id").as[Long].collect().toSet
    val dupFamily = (1 to 120).filter(i => i % 40 == 3 || i % 40 == 4)
      .groupBy(i => s"src${i % 3}")
    dupFamily.values.foreach { ids =>
      assert(exIds.contains(ids.min.toLong))
      ids.tail.foreach(i => assert(!exIds.contains(i.toLong),
        s"non-minimal exact dup $i survived"))
    }
    // planted near-dups (≡ 1,2 mod 40, same base) collapse to min id
    val unIds = unique.select("doc_id").as[Long].collect().toSet
    assert(unIds.contains(1L) && !unIds.contains(2L),
      s"near-dup family should keep 1, drop 2: $unIds")
  }

  test("shard assignment partitions exactly the selected set, balanced") {
    val (_, _, unique) = stages(docs)
    val withTok = unique
      .withColumn("tok", TextAnalysis.tokenCount(col("text")).cast("long"))
    val parts = Map("src0" -> 1L, "src1" -> 2L, "src2" -> 3L)
    val sel = Mixing.sampleToBudget(withTok, "doc_id", "source", "tok",
      budgetTokens = 600L, parts = parts)
    val sharded = Sampling.deterministicShuffle(sel, "doc_id", numShards = 4)
    val n = sel.count()
    assert(sharded.count() == n, "sharding must not add or drop rows")
    val perShard = sharded.groupBy("shard").count()
      .select("count").as[Long].collect()
    assert(perShard.sum == n && perShard.max - perShard.min <= 1,
      s"shards unbalanced: ${perShard.toSeq}")
    // deterministic under repartitioning
    val again = Sampling
      .deterministicShuffle(sel.repartition(7), "doc_id", numShards = 4)
      .select("doc_id", "shard", "shard_pos")
    assert(again.except(sharded.select("doc_id", "shard", "shard_pos"))
      .isEmpty)
  }
}
