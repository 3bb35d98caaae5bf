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
  * corpus through ONE task. Instead: bucket every row by a PREFIX of its
  * own order key (the first `bucketNibbles` hex digits of the md5), so
  * bucket numeric order equals order-key order by construction and no
  * range sampling job is needed; run the running total inside each bucket
  * (hash-partitioned window, full parallelism); then cumulate the tiny
  * per-bucket totals into exclusive offsets and broadcast-join them back.
  * The keyed projection is localCheckpoint-materialized once, so the
  * corpus is scanned once and shuffled once — an earlier draft used
  * `repartitionByRange` + `spark_partition_id()`, which cost a sampling
  * scan AND a duplicate scan+shuffle (nondeterministic expressions are
  * never exchange-reused). Checkpoint blocks back the returned frame and
  * are freed by ContextCleaner when it is garbage-collected.
  */
object Packing {

  /** (id, bin, n_tokens, offset) per document: `offset` is the exclusive
    * global token offset where the document starts in md5(`idCol`) order,
    * `bin = floor(offset / budgetTokens)`. `bucketNibbles` sets the
    * prefix-sum fan-out (16^n buckets; 3 → 4096 — parallelism ceiling and
    * broadcast-offset count). */
  def contiguousFill(df: DataFrame, idCol: String, tokenCountCol: String,
      budgetTokens: Long, bucketNibbles: Int = 3): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(bucketNibbles >= 1 && bucketNibbles <= 8,
      "bucketNibbles must be in [1, 8]")
    val ord = md5(col(idCol).cast("string"))
    // Order-aligned deterministic bucket: the numeric value of the first
    // hex digits of the order key itself (lexicographic hex order ==
    // numeric order for a fixed-length lowercase prefix).
    val (keyed, _) = Materialize.checkpointTracked(
      df.select(col(idCol), col(tokenCountCol).cast("long").as("__tok"),
          ord.as("__ord"))
        .withColumn("__b",
          conv(substring(col("__ord"), 1, bucketNibbles), 16, 10).cast("long")))
    // Intra-bucket running total: hash-partitioned window, each bucket is
    // ~|corpus| / 16^nibbles rows — full parallelism, no global funnel.
    val intra = keyed.withColumn("__run",
      sum(col("__tok")).over(Window.partitionBy(col("__b"))
        .orderBy(col("__ord"), col(idCol))))
    // Per-bucket totals → exclusive offsets (16^nibbles tiny rows; the
    // agg re-reads the checkpointed blocks, not the source).
    val offsets = keyed.groupBy(col("__b"))
      .agg(sum(col("__tok")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__boff"))
    val off = col("__boff") + col("__run") - col("__tok")
    // Exact integer floor-division: long/long in Spark is DOUBLE division,
    // which silently loses precision past 2^53 total tokens — decimal
    // division + floor stays exact at any corpus size.
    val bin = floor(off.cast("decimal(38,6)") / budgetTokens).cast("long")
    intra.join(broadcast(offsets), Seq("__b"))
      .select(col(idCol), col("__tok").as("n_tokens"),
        off.as("offset"), bin.as("bin"))
  }

  /** Per-bin packing summary: documents and tokens per training sequence
    * (docs counted in their start bin under contiguous fill). */
  def binSummary(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
}
