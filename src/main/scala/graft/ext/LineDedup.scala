package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style line-level deduplication with REWRITE (Raffel et al. 2020:
  * "we discarded all but one of any three-sentence span occurring more
  * than once" — re-expressed at line granularity, the common production
  * variant). Document-level dedup keeps near-identical pages apart when
  * each carries unique content plus SHARED boilerplate (footers, cookie
  * banners, license blocks); line dedup removes the shared lines from
  * every document except the first (smallest id) and reassembles each
  * document from its surviving lines in original order.
  *
  * Pipeline shape (all relational, no driver state):
  *   1. split each document on the line delimiter and explode with the
  *      line index — narrow, codegen'd;
  *   2. one hash aggregate per distinct line: duplicated iff
  *      min(id) ≠ max(id) (no count-distinct), keeper = min(id);
  *   3. join lines back on the line key (the only other shuffle);
  *   4. reassemble per document: sort surviving lines by index, join —
  *      bounded by document length, never corpus size.
  *
  * Scale: cost is linear in corpus lines — two key shuffles over line
  * rows, the standard price of the C4 pass. The rewrite preserves the
  * original bytes of every kept line (dedup is by exact line content;
  * pair with [[Normalize]] upstream to catch reformatted copies). */
object LineDedup {

  /** Returns one row per document: `(idCol, n_lines, n_kept, rewritten)`.
    * A document whose every line is dropped survives with an empty
    * rewrite. `splitRegex` is a Java regex; `joinSep` restores the
    * delimiter in the rewritten text. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      splitRegex: String = "\n", joinSep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), splitRegex)).as(Seq("__idx", "__line")))
      .withColumn("__k", md5(col("__line")))
    val keys = lines.groupBy(col("__k"))
      .agg(min(col(idCol)).as("__keeper"),
        (min(col(idCol)) =!= max(col(idCol))).as("__dup"))
    lines.join(keys, "__k")
      .withColumn("__kept", !col("__dup") || col(idCol) === col("__keeper"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("__idx"),
                col("__kept").as("k"), col("__line").as("l")))),
              x => x.getField("k")),
            x => x.getField("l")),
          joinSep).as("rewritten"))
  }
}
