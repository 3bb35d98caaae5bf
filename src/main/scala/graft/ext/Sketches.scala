package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches, engine-portable by construction.
  *
  * The production question ("distinct users/URLs/documents per slice over
  * 100 TB") is usually answered with HyperLogLog, but HLL register layouts
  * differ across engines — Spark's `approx_count_distinct` and DuckDB's
  * can never hash-compare. KMV (k minimum values; Bar-Yossef et al. 2002)
  * gives the same accuracy class with a FULLY deterministic, replayable
  * state: the k smallest distinct md5-prefix hashes of the value set.
  * Estimate = `(k-1) · 2^48 / h_k` (floor), exact when the group holds
  * fewer than k distinct hashes. Every step is integer arithmetic on
  * md5 nibbles — any engine replays it bit-for-bit.
  *
  * Scale shape: one distinct-pairs shuffle (partial-aggregated) — the
  * dominant cost, linear in input; then top-k WITHOUT a whole-group
  * funnel: a first row_number pass over (group, salt) partitions bounds
  * every sort to the salt slice, and the second pass sees ≤ salts·k rows
  * per group. No driver state, no collect; the sketch rows themselves
  * (≤ k per group) are the only thing that ever concentrates. */
object Sketches {

  /** Per-group approximate distinct count of `valueCol`:
    * (groupCols…, approx_distinct). k trades accuracy (~1/√(k−2) relative
    * error) for sketch size. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 256, salts: Int = 64): DataFrame = {
    require(k >= 2 && k <= (1 << 16), "k must be in [2, 65536]")
    require(salts >= 1, "salts must be positive")
    val g = groupCols.map(col)
    // 48-bit md5-prefix hash: (k-1)·2^48 stays far inside int64, so the
    // estimate divides exactly in any engine
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 12),
      16, 10).cast("long")
    val pairs = df.select((g :+ h.as("__h")): _*).distinct()
    val salted = pairs.withColumn("__salt", (col("__h") % salts).cast("int"))
    val w1 = Window.partitionBy((g :+ col("__salt")): _*).orderBy(col("__h"))
    val local = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    val w2 = Window.partitionBy(g: _*).orderBy(col("__h"))
    val topk = local.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k)
    topk.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), max(col("__h")).as("__hk"))
      .withColumn("approx_distinct",
        when(col("__n") < k, col("__n"))
          .otherwise(expr(s"(${k - 1}L * ${1L << 48}L) div greatest(__hk, 1L)")))
      .drop("__n", "__hk")
  }

  /** HyperLogLog with DETERMINISTIC registers (Flajolet et al. 2007).
    * Engine-native HLLs (`approx_count_distinct`, DuckDB's) can never
    * hash-compare because register layouts differ; this one fixes every
    * bit: 48-bit md5-prefix hash, `m = 64` buckets (p=6) from `h mod 64`,
    * rank = leading-zero count of the remaining 42-bit word + 1. Where
    * KMV above keeps the k smallest hashes, HLL keeps m fixed REGISTERS
    * whose merge is element-wise max — the shape to persist per
    * batch/partition as a sketch table and fold across batches without
    * re-reading history (the union of two register tables max-aggregated
    * IS the sketch of the union).
    *
    * Estimation is integer-only so any engine replays it: the harmonic
    * sum `Σ 2^-reg` is scaled by 2^44 (max rank 43, so every term
    * `2^(44-reg)` is a positive int64; empty buckets contribute `2^44`),
    * and `est = HLL_NUM div S` with `HLL_NUM = floor(0.709 · m² · 2^44)`
    * (α_64 = 0.709 to fixed point; ≈5.1e16, inside int64). The
    * small-range branch (raw ≤ 2.5m with empty buckets) uses linear
    * counting from a precomputed integer table `floor(m·ln(m/V))` — the
    * only transcendental is evaluated once at plan build via StrictMath,
    * identical literals embedded in the oracle SQL. */
  private[ext] val HllM = 64
  private[ext] val HllNum = ((BigInt(1) << 56) * 709 / 1000).toLong
  private[ext] val HllLinearTable: IndexedSeq[Long] =
    (1 to HllM).map(v =>
      math.floor(HllM * StrictMath.log(HllM.toDouble / v)).toLong)

  /** Per-group HLL register table of `valueCol`:
    * (groupCols…, bucket, reg). One distinct-free hash agg — rows never
    * concentrate beyond m per group. Merge register tables from separate
    * batches by unioning and re-aggregating `max(reg)`. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 12),
      16, 10).cast("long")
    val w = (h / HllM).cast("long") // 42-bit word above the bucket bits
    // rank = 42-bit leading zeros + 1; bit length via base-2 render
    // (conv(w,10,2) has no leading zeros), w = 0 means all-zero word
    val rank = when(w === 0L, lit(43))
      .otherwise(lit(43) - length(conv(w.cast("string"), 10, 2)))
    df.select((g :+ (h % HllM).cast("int").as("bucket")
      :+ rank.cast("int").as("__rank")): _*)
      .groupBy((g :+ col("bucket")): _*)
      .agg(max(col("__rank")).as("reg"))
  }

  /** Collapse a register table to (groupCols…, approx_distinct). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val lcArr = array(HllLinearTable.map(lit): _*)
    registers
      .groupBy(g: _*)
      .agg(expr("sum(shiftleft(1L, 44 - reg))").as("__s"),
        count(lit(1)).as("__nb"))
      // empty buckets: reg = 0 ⇒ term 2^44 each
      .withColumn("__s",
        col("__s") + (lit(HllM.toLong) - col("__nb")) * lit(1L << 44))
      .withColumn("__raw", expr(s"${HllNum}L div __s"))
      .withColumn("__v", lit(HllM.toLong) - col("__nb")) // empty buckets
      .withColumn("approx_distinct",
        when(col("__raw") <= lit(5L * HllM / 2) && col("__v") > 0L,
          element_at(lcArr, col("__v").cast("int")))
          .otherwise(col("__raw")))
      .drop("__s", "__nb", "__raw", "__v")
  }

  /** The DuckDB replay of registers+estimate as a CTE fragment: expects
    * a preceding CTE `src(g…, v)`; defines `hll(g…, approx_distinct)`
    * for the caller's final SELECT. */
  def hllOracleSql(groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val lcCase = (1 to HllM)
      .map(v => s"WHEN $v THEN ${HllLinearTable(v - 1)}")
      .mkString(" ")
    s"""regs AS (
       |  SELECT $g, h % $HllM AS bucket,
       |    MAX(CASE WHEN h // $HllM = 0 THEN 43
       |        ELSE 43 - length(bin(h // $HllM)) END) AS reg
       |  FROM (SELECT $g,
       |      ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12))::BIGINT AS h
       |    FROM src) t
       |  GROUP BY $g, h % $HllM),
       |hest AS (
       |  SELECT $g,
       |    SUM(CAST(power(2, 44 - reg) AS BIGINT))
       |      + ($HllM - COUNT(*)) * CAST(power(2, 44) AS BIGINT) AS s,
       |    $HllM - COUNT(*) AS v
       |  FROM regs GROUP BY $g),
       |hll AS (SELECT $g,
       |  CAST(CASE WHEN ($HllNum // s) <= ${5L * HllM / 2} AND v > 0
       |    THEN CASE v $lcCase END
       |    ELSE $HllNum // s END AS BIGINT) AS approx_distinct
       |FROM hest)""".stripMargin
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of `valueCol`
    * frequencies: `depth × width` cells, cell (r, c) = Σ counts of values
    * with `h_r(v) = c`. Cell sums are ASSOCIATIVE — the sketch of a
    * union is the cell-wise sum of the sketches, so per-batch sketches
    * merge without re-reading history, and the build is one
    * partial-aggregated shuffle reduced to depth·width rows at any input
    * size. Hashes are 48-bit md5 prefixes of `"<r>|<value>"` mod width —
    * deterministic, any engine replays the cells bit-for-bit. */
  def countMinCells(df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2,
      s"need 1<=depth<=16, width>=2: $depth x $width")
    val rows = sequence(lit(0), lit(depth - 1))
    // Compress to (value, count) BEFORE hashing: cell sums are
    // associative, so hashing each distinct value once and summing its
    // count is identical to hashing every occurrence — and pays
    // depth×|vocab| md5s instead of depth×|corpus| (measured 8× at one
    // decade of fixture scale). The count shuffle partial-aggregates
    // map-side like any hash agg.
    df.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__n"))
      .select(col("__v"), col("__n"), explode(rows).as("__r"))
      .withColumn("__c",
        (conv(substring(md5(concat_ws("|", col("__r"), col("__v"))), 1, 12),
          16, 10).cast("long") % width).cast("int"))
      .groupBy(col("__r"), col("__c"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /** Point-query the sketch for each distinct value of `valueCol` in
    * `probe`: estimate = min over rows of the value's cell count (an
    * OVERestimate, never under). `cells` is broadcast-grade
    * (depth·width rows) regardless of corpus size. Returns
    * (value, est). */
  def countMinEstimate(probe: DataFrame, valueCol: String, cells: DataFrame,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val rows = sequence(lit(0), lit(depth - 1))
    probe.select(col(valueCol).as("value")).distinct()
      .select(col("value"), explode(rows).as("__r"))
      .withColumn("__c",
        (conv(substring(md5(concat_ws("|", col("__r"), col("value"))), 1, 12),
          16, 10).cast("long") % width).cast("int"))
      .join(broadcast(cells), Seq("__r", "__c"), "left")
      .groupBy(col("value"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
