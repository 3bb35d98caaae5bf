package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained deterministic subword tokenizer (GreedyPiece): the
  * token counter a training-data pipeline budgets with, replacing the
  * whitespace approximation everywhere a `tokenCountCol` is accepted
  * ([[Packing.contiguousFill]], [[Mixing.sampleToBudget]], the q111
  * shard materializer).
  *
  * Training is fully relational and bounded: word frequencies are one
  * hash aggregate over the corpus (the distinct-word set is vocabulary-
  * sized — Heaps' law — not corpus-sized), candidate pieces are the
  * length-1..maxLen substrings of DISTINCT words weighted by word
  * frequency (one explode over the word set), and the vocab is all
  * single characters plus the `topMulti` heaviest multi-char pieces with
  * a total deterministic order (weight DESC, piece ASC). Only the final
  * vocab (model-sized, like k-means centroids) is collected; it ships to
  * executors as an expression reference object. Encoding is the
  * codegen'd greedy longest-match kernel
  * ([[org.apache.spark.sql.graft.SubwordKernels]]) — one scan, no join,
  * no shuffle at any corpus size.
  *
  * Every step (substring enumeration, weighting, tie-breaking, greedy
  * match) is chosen to be exactly replayable in ANSI-ish SQL, so the
  * DuckDB oracle re-derives the vocab AND the per-document counts
  * bit-for-bit (q134).
  */
object Subword {

  /** A trained piece vocabulary. `pieces` contains every single
    * character seen in training plus the selected multi-char pieces. */
  final case class Vocab(pieces: Array[String], maxPieceLen: Int) {
    require(pieces.nonEmpty, "empty vocab")
    def size: Int = pieces.length
  }

  /** Train on the corpus' normalized words. One aggregate for word
    * frequencies, one explode+aggregate over DISTINCT words for piece
    * weights, one vocab-sized collect. */
  def trainVocab(df: DataFrame, textCol: String, topMulti: Int = 64,
      maxPieceLen: Int = 5): Vocab = {
    require(topMulti >= 0 && maxPieceLen >= 1, "bad vocab parameters")
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // Every substring occurrence position counts once, weighted by the
    // word's corpus frequency. The HOF enumeration runs over DISTINCT
    // words only (vocabulary-sized input), so interpreted lambdas are
    // irrelevant to scale here; `filter(length = l)` drops the
    // truncated substrings near word ends instead of branching on
    // sequence bounds (Spark's sequence(1, 0) would count DOWN).
    val pieces0 = words.select(col("freq"),
      explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen),
           |  l -> filter(transform(sequence(1, greatest(length(w) - l + 1, 1)),
           |              s -> substring(w, s, l)),
           |       p -> length(p) = l)))""".stripMargin)).as("piece"))
    val chars = pieces0.filter(length(col("piece")) === 1)
      .select(col("piece")).distinct()
    val multi = pieces0.filter(length(col("piece")) >= 2)
      .groupBy(col("piece")).agg(sum(col("freq")).as("weight"))
      .orderBy(col("weight").desc, col("piece").asc)
      .limit(topMulti)
      .select(col("piece"))
    val all = chars.union(multi).distinct()
      .collect().map(_.getString(0)).sorted
    Vocab(all, maxPieceLen)
  }

  /** Per-row subword token count of `text` under `vocab` — a codegen'd
    * column usable anywhere a whitespace token count was. */
  def tokenCount(text: Column, vocab: Vocab): Column =
    org.apache.spark.sql.graft.SubwordBridge.subwordCount(
      text, vocab.pieces, vocab.maxPieceLen)
}
