package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed n-gram importance weights (Xie
  * et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): estimate a target and a raw feature
  * distribution over HASHED token buckets, weight every document by how
  * target-like its tokens are, and keep the top slice per domain.
  *
  * Engine-portable variant: features are the token MULTISET hashed with
  * the same portable 28-bit md5 bucketing as [[QualityModel]]; the
  * per-bucket importance weight is the smoothed count ratio
  * `floor((tgt_b+1)·10⁶ / (raw_b+1))` — the paper's log-likelihood-ratio
  * normalizers `(T+B)/(R+B)` are a constant factor per token, so with
  * length-normalized scores they cancel out of every ranking and are
  * dropped; the ratio (not its log) keeps all arithmetic in exact int64
  * plus ONE correctly-rounded IEEE divide per bucket/document, which any
  * engine reproduces bit-for-bit (no libm, no float accumulation).
  *
  * Scale shape (100 TB): training is one token explode +
  * `groupBy(bucket)` whose partial aggregation reduces every task to
  * ≤[[QualityModel.Buckets]] rows before the only shuffle; the B bucket
  * weights come to the driver (bounded metadata, same contract as the
  * centroid collects in [[KMeans]]) and scoring is a codegen'd
  * `aggregate(...)` projection against the literal weight array — no
  * join, no second shuffle of the corpus. Selection reuses
  * [[Quantiles.keepAboveGroupQuantile]]: per-domain exact thresholds, a
  * |domains|-row broadcast, shuffle-free filter pass.
  */
object Dsir {

  import QualityModel.Buckets

  val Scale = 1000000L

  private def bucket(tok: Column): Column = Dedup.md5Key28(tok) % Buckets

  /** Train the B importance weights: for each hashed bucket, the smoothed
    * target/raw count ratio at scale 10⁶. Buckets with no tokens anywhere
    * default to ratio 1 (weight = [[Scale]]). `isTarget` marks the rows
    * whose token distribution is the target. */
  def bucketWeights(docs: DataFrame, textCol: String,
      isTarget: Column): Array[Long] = {
    val counts = docs
      .select(isTarget.as("__t"),
        explode(coalesce(TextAnalysis.tokens(col(textCol)),
          array().cast("array<string>"))).as("__tok"))
      // hash once into a named column, parse nibbles in the next select —
      // guaranteed single md5 per token without leaning on codegen CSE
      .select(col("__t"), md5(col("__tok")).as("__hx"))
      .select(col("__t"),
        (Dedup.md5Key28FromHex(col("__hx")) % Buckets).as("__b"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__raw"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tgt"))
      .collect()
    val w = Array.fill(Buckets.toInt)(Scale)
    counts.foreach { r =>
      val (b, raw, tgt) = (r.getLong(0).toInt, r.getLong(1), r.getLong(2))
      // IEEE double divide, correctly rounded — identical in any engine
      // (exact floorDiv would differ from a SQL replay's float division
      // in the rare quotient-at-integer-boundary case, so BOTH sides use
      // the same double formula).
      w(b) = math.floor((tgt + 1).toDouble * Scale / (raw + 1).toDouble).toLong
    }
    w
  }

  /** Length-normalized integer document score against trained weights:
    * `floor(Σ w[bucket(tok)] / n_tokens)` (0 for empty docs) — one
    * projection, no shuffle. Lambdas run interpreted, so each token is
    * md5-hashed ONCE (`transform` to hex first) and the bucket parsed
    * from the hex — see [[Dedup.md5Key28FromHex]]. */
  def score(textCol: Column, weights: Array[Long]): Column = {
    val wLit = typedLit(weights.toSeq)
    val toks = coalesce(TextAnalysis.tokens(textCol),
      array().cast("array<string>"))
    val hexes = transform(toks, t => md5(t))
    val s = aggregate(hexes, lit(0L),
      (acc, h) => acc + element_at(wLit,
        (Dedup.md5Key28FromHex(h) % Buckets).cast("int") + 1))
    when(size(toks) > 0,
      floor(s.cast("double") / size(toks)).cast("long")).otherwise(0L)
  }

  /** End-to-end selection: train weights on `isTarget` vs all, score
    * every document, keep those at-or-above their own `groupCol`'s exact
    * `num/den` score quantile. Returns the kept rows with `dsir_score`,
    * `threshold`, `group_rows`. */
  def select(docs: DataFrame, textCol: String, groupCol: String,
      isTarget: Column, num: Long = 3L, den: Long = 4L): DataFrame = {
    val w = bucketWeights(docs, textCol, isTarget)
    val scored = docs.withColumn("dsir_score", score(col(textCol), w))
    Quantiles.keepAboveGroupQuantile(scored, groupCol, "dsir_score", num, den)
  }
}
