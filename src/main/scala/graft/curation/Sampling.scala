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

  /** Weight-proportional Bernoulli sample (Poisson/pps sampling): each row
    * kept independently with probability `min(1, k·w/W)` where `W` is the
    * total weight — the expected sample size is ≈ `k` and heavy rows
    * (long documents, high-token domains) are favored in exact proportion
    * to their weight. This is the sampler a token-budgeted corpus wants:
    * sampling DOCUMENTS uniformly under-represents long ones per TOKEN;
    * pps sampling is uniform per token.
    *
    * Decision rule, integer-exact in any engine: keep iff
    * `h · W < k · w · 2^28`, with `h` the row's 28-bit md5-prefix hash —
    * int64 cross-multiplication, no division, no floats, so retries,
    * engines, and partitionings all replay the same sample.
    * Scale shape: one metadata-cheap total-weight aggregate broadcast as
    * a 1-row frame, then a pure filter projection — no shuffle of the
    * data itself, mergeable across batches (each batch can be sampled
    * against the corpus-level `W`). */
  def weightedBernoulli(df: DataFrame, keyCol: String, weightCol: String,
      expectedK: Long): DataFrame = {
    require(expectedK > 0, "expectedK must be positive")
    // 28-bit hash keeps both cross-products inside int64 (h·W ≤ 2^28·W;
    // k·w·2^28) for corpus weights up to ~2^34 — beyond that, pre-scale
    // the weights (sampling only reads their ratios).
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 7), 16, 10)
      .cast("long")
    val w = df.agg(sum(col(weightCol).cast("long")).as("__tw"))
    df.crossJoin(broadcast(w))
      .filter(h * col("__tw") <
        lit(expectedK) * col(weightCol).cast("long") * lit(1L << 28))
      .drop("__tw")
  }

  /** Fixed-size weight-proportional sample per group (systematic PPS,
    * Madow 1949): order the group's rows by md5(key) (the randomizer),
    * take the cumulative weight, and select every row whose cumulative
    * interval `[cum−w, cum)` contains a multiple of `W/k` — exactly `k`
    * rows per group (fewer only if a single row outweighs `W/k`, which
    * then absorbs several multiples but is selected once), each with
    * inclusion probability `min(1, k·w/W)`. Selection is the pure-int64
    * floor-division test `⌊cum·k/W⌋ > ⌊(cum−w)·k/W⌋` — no floats, so the
    * sample is bit-replayable across engines. `weightCol` must be
    * integral and positive.
    *
    * Scale shape: one shuffle on the group columns; the cumulative sum is
    * a per-group running window in md5 order (AQE handles skewed groups),
    * then a pure filter. No floats, no collect, no global sort. */
  def systematicPps(df: DataFrame, groupCols: Seq[String], keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val g = groupCols.map(col)
    val ord = Seq(md5(col(keyCol).cast("string")), col(keyCol))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(ord: _*)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val wLong = col(weightCol).cast("long")
    // pure int64 floor division (`div` here, `//` in the oracle); cum·k
    // must fit int64 — holds to W·k ≈ 9·10^18 (pre-scale weights beyond)
    df.withColumn("__cum", sum(wLong).over(wRun))
      .withColumn("__tw", sum(wLong).over(wAll))
      .filter(expr(s"(__cum * $k) div __tw") >
        expr(s"((__cum - ${weightCol}) * $k) div __tw"))
      .drop("__cum", "__tw")
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
