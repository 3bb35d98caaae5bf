package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators (SURVEY §2A A9) — the reference simulates CDC
  * delta batches by sampling the base table
  * (reference/src/data_curation/utils/update_tpcds.py:56
  * `df.sample(False, p, seed)`).
  *
  * Two variants:
  *  - [[bernoulli]] — Spark's native per-row Bernoulli sampler. Fastest
  *    (no hashing), deterministic for a fixed seed AND input partitioning,
  *    which is the reference's exact behavior.
  *  - [[byKeyHash]] — portable content-derived sample: keep a row iff the
  *    first byte of md5(key) falls under the cut. Fully reproducible
  *    across engines, partitionings, and retries — the variant to use when
  *    a sample must be re-derivable (e.g. an oracle-checked delta
  *    fixture, or consistent sampling of both sides of a join on the
  *    same key).
  */
object Sampling {

  /** `df.sample(withReplacement = false, fraction, seed)`. */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Value of hex digit `i` (1-based) of md5(key-as-string) — portable to
    * any engine with md5/ascii/substr. */
  private def md5Nibble(key: Column, i: Int): Column = {
    val a = ascii(substring(md5(key.cast("string")), i, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** First byte of md5(key) in [0, 255] — the sampling hash. */
  def keyHashByte(key: Column): Column =
    md5Nibble(key, 1) * 16 + md5Nibble(key, 2)

  /** Keep rows whose md5-derived key byte < ⌊fraction·256⌋ (so the
    * realized rate is ⌊fraction·256⌋/256). */
  def byKeyHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(keyHashByte(col(keyCol)) < math.floor(fraction * 256).toInt)

  /** Stratified fixed-size sample: up to `k` rows per stratum, chosen by
    * md5(key) order (ties broken by the key itself) — a deterministic,
    * partitioning-independent per-group reservoir. The hash order makes
    * each stratum's pick uniform over its members yet fully reproducible
    * across engines/retries, unlike seeded reservoir sampling whose result
    * depends on row arrival order. One shuffle on the strata columns;
    * row_number is the standard top-k-per-key plan and AQE splits skewed
    * strata. */
  def stratifiedByHash(df: DataFrame, strataCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
