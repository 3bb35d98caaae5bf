package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles without a global sort (driver-mandated
  * analytics extension; designed Spark-first).
  *
  * `approx_percentile` trades exactness for a sketch; a naive exact form
  * sorts each group through one task. This operator is exact AND
  * scale-safe for discrete domains: compress to `(group, value, count)`
  * with one hash aggregate — the map-side combine collapses the corpus
  * to |group × distinct value| rows — then run the per-group cumulative
  * window over the COMPRESSED frame, whose size is bounded by the value
  * domain, never the row count. The discrete quantile `q = num/den` is
  * the smallest value whose cumulative count reaches `ceil(q·n)`,
  * decided with the integer cross-multiplication `cum·den ≥ n·num` — no
  * floating point anywhere, so any engine replays it bit-identically. */
object Quantiles {

  /** One row per group: the named exact quantiles of `valueCol` plus
    * `n_rows`. `pcts` are `(outputName, numerator, denominator)` exact
    * rationals in (0, 1]. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[(String, Long, Long)]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall { case (_, n, d) => n > 0 && n <= d },
      s"quantiles must be rationals in (0,1]: $pcts")
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    val cum = counts.withColumn("__cum", sum("__c").over(byVal))
      .withColumn("__n", sum("__c").over(whole))
    val aggs = pcts.map { case (nm, num, den) =>
      min(when(col("__cum") * den >= col("__n") * num, col(valueCol))).as(nm)
    } :+ max(col("__n")).as("n_rows")
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic sample-quantile sketch: exact quantiles of a bottom-k
    * md5-ordered row sample — the path for CONTINUOUS value domains,
    * where [[exactQuantiles]]' compressed-domain contract (|distinct
    * values| bounded) does not hold. The sample is the k rows whose
    * md5(key) is smallest within each group: uniform (the hash is the
    * randomizer), DETERMINISTIC (retries/engines/partitionings agree),
    * and MERGEABLE (bottom-k of a union = bottom-k of the merged
    * bottom-ks, so per-batch sketches fold without re-reading history —
    * same state discipline as [[Sketches.kmvDistinct]]). Standard
    * order-statistics bounds apply: rank error is O(1/√k) with high
    * probability.
    *
    * Scale shape: one shuffle on the group columns for the windowed
    * bottom-k (the only pass over the data), then the quantile runs on
    * ≤ k rows per group. Output: per group, each named quantile of the
    * SAMPLE plus `sample_rows`. */
  def sampleQuantiles(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, k: Int,
      pcts: Seq[(String, Long, Long)]): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val sample = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
    exactQuantiles(sample, groupCol, valueCol, pcts)
      .withColumnRenamed("n_rows", "sample_rows")
  }

  /** Adaptive per-group gate: keep rows whose `scoreCol` reaches their
    * OWN group's exact `num/den` quantile — the "per-dump threshold"
    * pattern (a fixed global cutoff over- or under-prunes domains whose
    * score distributions differ; a per-domain percentile self-calibrates).
    * Returns the kept rows with `threshold` (the group's cutoff) and
    * `group_rows` (pre-filter group size) attached. Two passes over the
    * input (quantile + filter); the per-group thresholds are a
    * |groups|-row broadcast, so the filter pass is shuffle-free.
    *
    * `scoreCol` inherits [[exactQuantiles]]' discrete-domain contract:
    * the cumulative window runs over the (group, value) compression, so
    * a near-continuous double score should be quantized first (e.g.
    * `floor(score * 2^20)` — one IEEE multiply + floor, deterministic
    * everywhere) to bound the frame by grid resolution, not row count. */
  def keepAboveGroupQuantile(df: DataFrame, groupCol: String,
      scoreCol: String, num: Long, den: Long): DataFrame = {
    val th = exactQuantiles(df, groupCol, scoreCol, Seq(("__th", num, den)))
      .select(col(groupCol), col("__th"),
        col("n_rows").as("group_rows"))
    df.join(broadcast(th), Seq(groupCol))
      .filter(col(scoreCol) >= col("__th"))
      .withColumn("threshold", col("__th"))
      .drop("__th")
  }
}
