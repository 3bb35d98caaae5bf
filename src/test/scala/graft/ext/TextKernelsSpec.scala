package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextBridge

/** Differential spec: the one-pass codegen'd text kernels must agree
  * exactly with the composed-functions formulation they replaced (which is
  * also the shape of the DuckDB oracle SQL), on real fixture text and on
  * crafted edge cases. */
class TextKernelsSpec extends SparkSpec {

  private def composedTokens(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "\\W+"), t => t =!= "")

  private def composedShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = composedTokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("token kernel matches composed split/lower/filter on fixture text") {
    val bad = docs
      .select(TextBridge.tokenArray(col("text")).as("k"),
        composedTokens(col("text")).as("c"))
      .filter(not(col("k") <=> col("c")))
      .count()
    assert(bad === 0)
  }

  test("shingle kernel matches composed form on fixture text (n=2,3,5)") {
    Seq(2, 3, 5).foreach { n =>
      val bad = docs
        .select(sort_array(TextBridge.shingleArray(col("text"), n)).as("k"),
          sort_array(composedShingles(col("text"), n)).as("c"))
        .filter(not(col("k") <=> col("c")))
        .count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("shingle kernel edge cases: empty, no word chars, shorter than n") {
    import spark.implicits._
    val edge = Seq("", "?!... --", "one", "one two", "a b a b a b",
      "Tabs\tand\nnewlines  and   runs", "ümläut ümläut x").toDF("text")
    val bad = edge
      .select(sort_array(TextBridge.shingleArray(col("text"), 3)).as("k"),
        sort_array(composedShingles(col("text"), 3)).as("c"))
      .filter(not(col("k") <=> col("c")))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("null text yields null arrays") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x y z")).toDF("text")
    val r = df.select(TextBridge.tokenArray(col("text")).as("t"),
      TextBridge.shingleArray(col("text"), 3).as("s")).collect()
    assert(r.exists(row => row.isNullAt(0) && row.isNullAt(1)))
  }

  test("dedup pipelines leave no persisted RDDs behind") {
    // scoped to ids THESE pipelines create: other suites' checkpoint
    // blocks are ContextCleaner-managed and may lawfully linger until GC
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val docs01 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Dedup.jaccardPairs(docs01, "doc_id", "text", n = 3, threshold = 0.8).count()
    Dedup.minhashLshPairs(docs01, "doc_id", "text", portable = true).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"dedup left persisted RDDs: $leaked")
  }
}
