package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching over the corpus vocabulary — the
  * typo/variant-detection step of corpus diagnostics (OCR noise, tokenizer
  * damage) as an EXACT edit-distance-1 pair join that never goes
  * all-pairs (driver-mandated LLM-pipeline extension; no reference
  * counterpart — designed Spark-first).
  *
  * Blocking is SymSpell's symmetric-delete scheme (Garbe 2012): each
  * token's candidate keys are itself plus every single-character
  * deletion. Two tokens within levenshtein distance 1 ALWAYS share a
  * key — substitution: both delete the differing position;
  * insertion/deletion: the shorter token IS a delete-variant of the
  * longer — so the equi-join over keys misses nothing. A shared key does
  * NOT imply distance ≤ 1 (delete different chars from different
  * tokens), so every candidate is verified with the codegen'd
  * `levenshtein` builtin.
  *
  * Scale: vocabulary extraction is one distinct shuffle (linear in
  * corpus tokens, output vocabulary-sized); variants multiply the vocab
  * by ~token-length (narrow); the candidate equi-join shuffles
  * vocab×length rows on the variant key — bounded blocks, never the
  * all-pairs square. */
object Fuzzy {

  /** `tok` plus its single-character-deletion variants, de-duplicated. */
  def deleteVariants(tok: Column): Column =
    array_distinct(concat(array(tok),
      transform(sequence(lit(1), length(tok)),
        i => concat(tok.substr(lit(1), i - 1),
          tok.substr(i + 1, lit(Int.MaxValue - 10))))))

  /** Distinct unordered pairs (t1 < t2) of DISTINCT values of `tokCol`
    * within levenshtein distance 1. */
  def typoPairs(tokens: DataFrame, tokCol: String): DataFrame = {
    val vocab = tokens.select(col(tokCol).as("tok"))
      .filter(col("tok").isNotNull && length(col("tok")) > 0).distinct()
    val vars = vocab.select(col("tok"),
      explode(deleteVariants(col("tok"))).as("v"))
    vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.tok") < col("b.tok"))
      .select(col("a.tok").as("t1"), col("b.tok").as("t2")).distinct()
      .filter(levenshtein(col("t1"), col("t2")) <= 1)
  }
}
