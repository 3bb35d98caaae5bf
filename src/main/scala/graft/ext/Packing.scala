package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget training
  * sequences ("bins") by contiguous fill over a deterministic corpus
  * order — the step between a curated corpus and a trainer's fixed-length
  * batches. Contiguous fill starts each document in the bin where its
  * global token offset lands (`bin = floor(offset / budget)`), which is
  * deterministic, engine-portable, and splits nothing: a document longer
  * than the budget simply spans bins from its start bin. The order key is
  * md5(id), so packing doubles as the corpus shuffle trainers want
  * (neighboring source docs land in different sequences).
  *
  * Scale design (the 100 TB contract): the global prefix sum is NOT a
  * global-order window — `Window.orderBy` without partitions funnels the
  * corpus through ONE task. Instead it is the classic two-pass prefix sum:
  * range-partition by the order key, intra-partition running totals (a
  * window whose partition key is the range-partition id — each group is
  * exactly one task's data), then per-partition totals (one tiny row per
  * partition) cumulated into offsets and joined back by partition id via
  * broadcast. Two shuffles of the (id, tokens) projection, nothing ever
  * single-threaded, no driver-side data beyond P partition totals.
  */
object Packing {

  /** (id, bin, n_tokens, offset) per document: `offset` is the exclusive
    * global token offset where the document starts in md5(`idCol`) order,
    * `bin = floor(offset / budgetTokens)`. */
  def contiguousFill(df: DataFrame, idCol: String, tokenCountCol: String,
      budgetTokens: Long, numPartitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = df.select(col(idCol), col(tokenCountCol).cast("long").as("__tok"),
        md5(col(idCol).cast("string")).as("__ord"))
      .repartitionByRange(parts, col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    // Intra-partition running total: the window's partition key is the
    // range-partition id, so each window group is one task's rows — full
    // parallelism, no global funnel.
    val intra = keyed.withColumn("__run",
      sum(col("__tok")).over(Window.partitionBy(col("__pid"))
        .orderBy(col("__ord"), col(idCol))))
    // P partition totals → exclusive offsets (tiny: one row per partition).
    val offsets = keyed.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("__ptot"))
      .withColumn("__poff",
        coalesce(sum(col("__ptot")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__poff"))
    val off = col("__poff") + col("__run") - col("__tok")
    // Exact integer floor-division: long/long in Spark is DOUBLE division,
    // which silently loses precision past 2^53 total tokens — decimal
    // division + floor stays exact at any corpus size.
    val bin = floor(off.cast("decimal(38,6)") / budgetTokens).cast("long")
    intra.join(broadcast(offsets), Seq("__pid"))
      .select(col(idCol), col("__tok").as("n_tokens"),
        off.as("offset"), bin.as("bin"))
  }

  /** Per-bin packing summary: documents and tokens per training sequence
    * (docs counted in their start bin under contiguous fill). */
  def binSummary(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
}
