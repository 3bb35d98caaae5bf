package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the perplexity-filter
  * step of LLM data curation (CCNet / Gopher filter documents whose LM
  * score marks them as out-of-distribution; the reference's corpus-level
  * quality axis, re-expressed for a corpus-internal LM).
  *
  * The model is the corpus itself: bigram maximum-likelihood estimates
  * `P(w2|w1) = c(w1 w2) / c(w1·)` where both counts come from one pass
  * over the tokenized corpus. A document's score is the mean per-bigram
  * fixed-point probability `floor(scale · c(bigram) / c(prefix))`,
  * averaged with integer floor division — EVERY arithmetic step is
  * integer-exact, so a DuckDB oracle replays scores bit-for-bit (the same
  * engine-portability discipline as the k-means/SemDeDup chain; a float
  * log-perplexity would hash-mismatch across engines). Low scores =
  * improbable bigram sequences = the out-of-distribution tail a
  * perplexity filter drops.
  *
  * Scale shape (100 TB): tokenization and bigram explosion are pure
  * projections (one scan, corpus × ~2 rows); counting is two partial-
  * aggregated shuffles (bigram key, prefix key); scoring joins each
  * bigram occurrence to its two counts — shuffle joins on the count keys,
  * never a broadcast of an unbounded vocabulary — and the per-document
  * fold is one final hash aggregate on the document id. Everything is
  * linear in corpus tokens with no driver state; skewed stop-word
  * prefixes are AQE-split like any hot aggregation key. */
object NgramLM {

  /** Per-document bigram LM scores: (idCol, n_bigrams, lm_score), only
    * for documents with ≥ 1 bigram. `lm_score` is the mean fixed-point
    * bigram probability in [0, scale]. */
  def bigramScores(df: DataFrame, idCol: String, textCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, "scale must be positive")
    val toks = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") >= 2)
    // bigram occurrences, one row each (duplicates count per occurrence)
    val bg = toks.select(col(idCol),
        explode(transform(sequence(lit(1), col("__n") - 1), i =>
          concat_ws(" ", element_at(col("__t"), i),
            element_at(col("__t"), i + 1)))).as("__bg"))
      .withColumn("__w1", substring_index(col("__bg"), " ", 1))
    val cb = bg.groupBy(col("__bg")).agg(count(lit(1)).as("__cb"))
    val cp = bg.groupBy(col("__w1")).agg(count(lit(1)).as("__cp"))
    bg.join(cb, "__bg").join(cp, "__w1")
      // integer floor division (both engines truncate identically on
      // positives); scale·count stays far under 2^63 at any corpus size
      .withColumn("__s", expr(s"($scale * __cb) div __cp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(__s) div count(1)").as("lm_score"))
  }
}
