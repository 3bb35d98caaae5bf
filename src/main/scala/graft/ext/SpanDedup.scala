package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-span detection — the token-window formulation of exact
  * substring deduplication (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): a span duplicated VERBATIM across
  * documents is marked wherever it occurs, even when the containing
  * documents are otherwise different — the case document-level
  * (fingerprint / MinHash) dedup cannot see. The suffix-array exactness
  * of the paper is approximated by overlapping `w`-token windows: any
  * duplicated span of ≥ w tokens contains a duplicated window, so
  * coverage is exact for spans ≥ w and blind below w — the same
  * length-threshold the paper applies (their 50-token minimum).
  *
  * Pipeline shape (all relational, no driver state):
  *   1. explode each document into its overlapping w-token windows with
  *      their start offsets (one md5 key per window);
  *   2. a window key seen in ≥ 2 DISTINCT documents is duplicated —
  *      detected with min(id) ≠ max(id), one hash aggregate, no
  *      count-distinct sketch needed;
  *   3. semi-join the window list back to the duplicated keys;
  *   4. per document, the covered-token count is the union length of the
  *      surviving [start, start+w) intervals: sort by start and sum
  *      min(w, next_start − start) — a per-document window function over
  *      rows that exist only where duplication exists.
  *
  * Scale: step 1 multiplies the corpus ~w×; steps 2-3 shuffle window
  * keys — the dominant cost, linear in corpus tokens, and the standard
  * price of exact substring dedup at scale. Run it AFTER exact
  * document-level dedup (identical documents would make every window
  * "duplicated" k× over), and tune w: larger windows mean fewer spurious
  * matches and less key volume. The per-document interval union in step
  * 4 partitions by document id — bounded by document length, never by
  * corpus size. */
object SpanDedup {

  /** Per-document duplicated-span coverage: (idCol, n_tokens, dup_tokens)
    * where `dup_tokens` counts token positions covered by at least one
    * window duplicated across ≥ 2 documents. Documents shorter than `w`
    * tokens are never marked. */
  def coverage(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    require(w >= 2, "window must span at least 2 tokens")
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
    // overlapping windows with 1-based start offsets, keyed in the same
    // projection (one pass, no self-join); none for short docs
    val wins = toks.select(col(idCol),
        explode(when(col("__n") >= w,
          transform(sequence(lit(1), col("__n") - (w - 1)), i =>
            struct(i.as("s"),
              md5(concat_ws(" ", slice(col("__t"), i, lit(w)))).as("k"))))
          .otherwise(array().cast("array<struct<s:int,k:string>>")))
          .as("__w"))
      .select(col(idCol), col("__w.s").as("__s"), col("__w.k").as("__k"))
    val dupKeys = wins.groupBy(col("__k"))
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select(col("__k"))
    val dupWins = wins.join(dupKeys, "__k")
      .select(col(idCol), col("__s")).distinct()
    val nxt = lead(col("__s"), 1).over(
      Window.partitionBy(col(idCol)).orderBy(col("__s")))
    val covered = dupWins
      .withColumn("__c", least(lit(w.toLong),
        coalesce(nxt - col("__s"), lit(w.toLong)).cast("long")))
      .groupBy(col(idCol)).agg(sum(col("__c")).as("dup_tokens"))
    toks.select(col(idCol), col("__n").cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }
}
