package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share at least
  * one word n-gram with any document of an evaluation/benchmark set — the
  * standard guard against benchmark leakage when assembling a training
  * corpus (long-n-gram overlap is the published recipe: n of 8-13 words
  * makes coincidental collisions vanishingly rare while catching verbatim
  * inclusion and light paraphrase).
  *
  * Scale design (the 100 TB contract): eval sets are tiny next to the
  * corpus (millions of n-grams vs trillions), so the eval side collapses
  * to a DISTINCT 128-bit key set that broadcasts, and the train side is a
  * narrow stateless projection (tokenize → shingle → md5) semi-joined
  * against it — the corpus is never shuffled, never collected, and the
  * only wide op is the final per-doc DISTINCT, sized by the HIT list.
  * Keys are md5(shingle), so the join moves 16-byte keys instead of
  * n-word strings, and the same keys are derivable in any engine for
  * cross-checking.
  */
object Contamination {

  /** (id, md5-of-shingle) postings of a document frame — narrow, no
    * shuffle; [[Dedup.shingles]] already emits the per-doc distinct set. */
  private def keyed(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol),
        explode(Dedup.shingles(col(textCol), n)).as("__sh"))
      .select(col(idCol), md5(col("__sh")).as("__k"))

  /** Distinct ids of `train` documents sharing ≥1 word n-gram with `eval`.
    * The eval key set is broadcast — size it accordingly (a benchmark
    * suite's n-grams are a few MB; for eval sets beyond broadcast range
    * pass `broadcastEval = false` to fall back to a shuffled semi-join). */
  def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, broadcastEval: Boolean = true): DataFrame = {
    val evalKeys0 = keyed(eval, idCol, textCol, n).select(col("__k")).distinct()
    val evalKeys = if (broadcastEval) broadcast(evalKeys0) else evalKeys0
    keyed(train, idCol, textCol, n)
      .join(evalKeys, Seq("__k"), "left_semi")
      .select(col(idCol)).distinct()
  }
}
