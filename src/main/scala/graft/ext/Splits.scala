package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/eval splitting — the assignment rule that keeps
  * NEAR-DUPLICATE documents on the same side of the split. A random
  * per-document split leaks: a training document's near-copy in the
  * eval set inflates every metric it touches (the train/test
  * contamination failure mode of web-scale corpora — same motivation
  * as q66's decontamination, applied at corpus-construction time).
  *
  * Rule: documents that share a near-dup component split as ONE UNIT —
  * the unit's id is the component representative (min member id, the
  * connected-components convention), singletons are their own unit —
  * and the side is a deterministic md5 bucket of the UNIT id, so the
  * split is reproducible run to run, independent of partitioning, and
  * needs no stored assignment table.
  *
  * Scale: near-dup components are the q65 machinery (prefix-filtered
  * Jaccard pairs → O(log d) connected-component join rounds); the split
  * itself is one left join + a hash — no shuffle beyond the component
  * build, no driver state. */
object Splits {

  /** (idCol, unit, split) for every document: `split` is 'train' or
    * 'eval'; `unit` is the leakage group the decision was made for.
    * `evalOf256` is the eval share in 1/256ths (51 ≈ 20%). */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      evalOf256: Int = 51): DataFrame =
    leakageSafeSplitFromComponents(df, idCol,
      Dedup.nearDupComponents(df, idCol, textCol, n, threshold), evalOf256)

  /** [[leakageSafeSplit]] over PRE-COMPUTED components — for callers that
    * already hold the near-dup component table (e.g. because they also
    * need the pair list, [[Dedup.jaccardPairsAndComponents]]), so the
    * component machinery is never run twice for one query. */
  def leakageSafeSplitFromComponents(df: DataFrame, idCol: String,
      comp: DataFrame, evalOf256: Int = 51): DataFrame = {
    require(evalOf256 > 0 && evalOf256 < 256, "evalOf256 must be in 1..255")
    val unit = coalesce(col("component"), col(idCol)).as("unit")
    val bucket = conv(substring(md5(col("unit").cast("string")), 1, 2),
      16, 10).cast("int")
    df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), unit)
      .withColumn("split",
        when(bucket < 256 - evalOf256, "train").otherwise("eval"))
      .drop("component")
  }
}
