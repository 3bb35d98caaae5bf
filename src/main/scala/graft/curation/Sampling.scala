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

  /** Deterministic corpus shuffle + round-robin sharding — the "global
    * shuffle" trainers want before writing training shards: every row gets
    * a global position in md5(key) order (reproducible across engines,
    * partitionings, and retries — unlike `orderBy(rand(seed))`, whose
    * result depends on partitioning), then shard `pos % numShards` at
    * within-shard position `pos div numShards`, so consecutive corpus
    * neighbors land in different shards and every shard is a uniform
    * stratum of the corpus.
    *
    * Scale design: the global position is [[graft.ext.Packing]]'s two-pass
    * distributed prefix sum over a unit weight (bucket by an md5 prefix of
    * the order key itself → intra-bucket running counts at full
    * parallelism → broadcast tiny per-bucket offsets) — NOT a global-order
    * window, which would funnel 100 TB through one task. One scan, one
    * hash shuffle, no sampling pass.
    *
    * `keyCol` must be UNIQUE: positions are assigned per row and joined
    * back on the key, so a duplicated key would cross-match its position
    * rows (run exact dedup first, or pass a surrogate like
    * `monotonically_increasing_id` materialized to a column).
    *
    * Output: input columns plus `shard` and `shard_pos`. */
  def deterministicShuffle(df: DataFrame, keyCol: String, numShards: Int)
      : DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val pos = graft.ext.Packing.contiguousFill(
      df.select(col(keyCol), lit(1L).as("__one")),
      keyCol, "__one", budgetTokens = 1L)
      .select(col(keyCol), col("offset").as("__pos"))
    df.join(pos, Seq(keyCol))
      .withColumn("shard", (col("__pos") % numShards).cast("int"))
      .withColumn("shard_pos", expr(s"__pos div $numShards"))
      .drop("__pos")
  }

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
