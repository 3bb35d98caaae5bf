package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture sampling: cut a corpus down to a global token budget
  * split across domains by target weights — the "data mixing" step of a
  * training-data pipeline (so much web, so much code, so much books...),
  * run as a deterministic downsample instead of a random one so every
  * engine, retry, and rerun selects the SAME documents.
  *
  * Semantics: each domain `d` gets an exact integer token target
  * `floor(budget · parts(d) / Σparts)`; its documents are ordered by
  * md5(id) (a stable corpus shuffle) and taken while the domain's
  * EXCLUSIVE running token offset is below the target — so the selection
  * overshoots by at most one document per domain and never depends on
  * partitioning or float summation order. Domains absent from `parts`
  * are excluded entirely. A domain with fewer tokens than its target is
  * taken whole (no upsampling — mixing epochs are the trainer's job).
  *
  * Scale design (the 100 TB contract): the per-domain prefix sum reuses
  * [[Packing]]'s order-aligned md5-prefix bucket trick, partitioned one
  * level deeper by domain: the running total is a window over
  * (domain, bucket) — ~|corpus| / 16^nibbles rows per task, full
  * parallelism, no per-domain single-task funnel (a plain
  * `Window.partitionBy(domain)` would pull an entire domain — possibly
  * 90% of the corpus — through one task). Per-(domain, bucket) totals are
  * tiny (domains × 4096), cumulated by a window and broadcast back. One
  * scan, one shuffle.
  */
object Mixing {

  /** Selected documents: (idCol, domainCol, n_tokens, offset) where
    * `offset` is the document's exclusive token offset within its domain
    * in md5(id) order. `parts` are integer mixture weights; the domain
    * target is `floor(budgetTokens · parts(d) / Σparts)` computed in
    * BigInt (exact at any budget). */
  def sampleToBudget(df: DataFrame, idCol: String, domainCol: String,
      tokenCountCol: String, budgetTokens: Long, parts: Map[String, Long],
      bucketNibbles: Int = 3): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "parts must be non-empty positive integer weights")
    require(bucketNibbles >= 1 && bucketNibbles <= 7,
      "bucketNibbles must be in [1, 7]")
    val sumParts = parts.values.map(BigInt(_)).sum
    val targets: Map[String, Long] = parts.map { case (d, p) =>
      d -> (BigInt(budgetTokens) * p / sumParts).toLong
    }
    val ord = md5(col(idCol).cast("string"))
    val (keyed, _) = Materialize.checkpointTracked(
      df.filter(col(domainCol).isin(parts.keys.toSeq.map(lit): _*))
        .select(col(idCol), col(domainCol),
          col(tokenCountCol).cast("long").as("__tok"), ord.as("__ord"))
        .withColumn("__b",
          conv(substring(col("__ord"), 1, bucketNibbles), 16, 10).cast("long")))
    val intra = keyed.withColumn("__run",
      sum(col("__tok")).over(Window.partitionBy(col(domainCol), col("__b"))
        .orderBy(col("__ord"), col(idCol))))
    // per-(domain, bucket) totals → exclusive per-domain bucket offsets;
    // |domains| × 16^nibbles rows, the per-domain window here is tiny
    val offsets = keyed.groupBy(col(domainCol), col("__b"))
      .agg(sum(col("__tok")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.partitionBy(col(domainCol)).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(domainCol), col("__b"), col("__boff"))
    val target = targets.foldLeft(lit(0L)) { case (acc, (d, t)) =>
      when(col(domainCol) === d, lit(t)).otherwise(acc)
    }
    val off = col("__boff") + col("__run") - col("__tok")
    intra.join(broadcast(offsets), Seq(domainCol, "__b"))
      .filter(off < target)
      .select(col(idCol), col(domainCol), col("__tok").as("n_tokens"),
        off.as("offset"))
  }

  /** Per-domain mixture summary over the selected set. */
  def mixtureSummary(selected: DataFrame, domainCol: String): DataFrame =
    selected.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))

  /** Mixture with UPSAMPLING — the other half of data mixing: when a
    * domain's token target EXCEEDS its mass, its documents repeat across
    * training epochs (the standard small-domain/multilingual upweight;
    * [[sampleToBudget]] instead caps at one pass). Each document of
    * domain `d` is emitted `floor(target/mass)` times, plus once more if
    * its exclusive md5-order token offset falls below
    * `target mod mass` — so the fractional epoch is the SAME
    * deterministic prefix the downsampler would select, every emitted
    * copy is tagged with its epoch number, and the total selected tokens
    * per domain is within one document of the exact target. Pure integer
    * arithmetic end to end (one div, one mod per domain) — replayable on
    * any engine.
    *
    * Scale: the offset machinery is [[sampleToBudget]]'s (one scan, one
    * bucket-keyed shuffle); masses are a |domains|-row broadcast; the
    * epoch expansion is a narrow `explode(sequence(...))` whose output
    * size is the chosen budget, not the corpus. Domains with zero token
    * mass are excluded (an upsample target over nothing is undefined).
    *
    * Output: (idCol, domainCol, n_tokens, epoch) — one row per emitted
    * copy, `epoch` in [0, copies). */
  def upsampleToBudget(df: DataFrame, idCol: String, domainCol: String,
      tokenCountCol: String, budgetTokens: Long, parts: Map[String, Long],
      bucketNibbles: Int = 3): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "parts must be non-empty positive integer weights")
    require(bucketNibbles >= 1 && bucketNibbles <= 7,
      "bucketNibbles must be in [1, 7]")
    val sumParts = parts.values.map(BigInt(_)).sum
    val targets: Map[String, Long] = parts.map { case (d, p) =>
      d -> (BigInt(budgetTokens) * p / sumParts).toLong
    }
    val ord = md5(col(idCol).cast("string"))
    val (keyed, _) = Materialize.checkpointTracked(
      df.filter(col(domainCol).isin(parts.keys.toSeq.map(lit): _*))
        .select(col(idCol), col(domainCol),
          col(tokenCountCol).cast("long").as("__tok"), ord.as("__ord"))
        .withColumn("__b",
          conv(substring(col("__ord"), 1, bucketNibbles), 16, 10).cast("long")))
    val intra = keyed.withColumn("__run",
      sum(col("__tok")).over(Window.partitionBy(col(domainCol), col("__b"))
        .orderBy(col("__ord"), col(idCol))))
    val offsets = keyed.groupBy(col(domainCol), col("__b"))
      .agg(sum(col("__tok")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.partitionBy(col(domainCol)).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(domainCol), col("__b"), col("__boff"))
    val masses = keyed.groupBy(col(domainCol))
      .agg(sum(col("__tok")).as("__mass"))
    val target = targets.foldLeft(lit(0L)) { case (acc, (d, t)) =>
      when(col(domainCol) === d, lit(t)).otherwise(acc)
    }
    // exact integer epoch count: the double divide is exact because the
    // numerator is the remainder-stripped multiple and targets are capped
    // below 2^53 (required above)
    require(budgetTokens <= (1L << 53) - 1, "budgetTokens above 2^53")
    val off = col("__boff") + col("__run") - col("__tok")
    val fullEpochs = ((target - target % col("__mass")).cast("double") /
      col("__mass").cast("double")).cast("long")
    val copies = fullEpochs +
      when(off < target % col("__mass"), 1L).otherwise(0L)
    intra.join(broadcast(offsets), Seq(domainCol, "__b"))
      .join(broadcast(masses), Seq(domainCol))
      .filter(col("__mass") > 0L && copies > 0L)
      .select(col(idCol), col(domainCol), col("__tok").as("n_tokens"),
        explode(sequence(lit(0L), copies - 1L)).as("epoch"))
  }

  /** Temperature-scaled mixture (α = 1/2): domain targets proportional to
    * `sqrt(domainTokens)` instead of hand-set weights — the standard
    * multilingual/multi-domain rebalance that upweights small domains
    * relative to their natural share without hand-tuning. α = 1/2 keeps
    * the whole computation engine-replayable: IEEE `sqrt` is CORRECTLY
    * ROUNDED (unlike `ln`/`pow`), the share normalizer is accumulated as
    * a prefix sum in domain order (one fixed association — no
    * partition-order float sums), and the target is one multiply, one
    * divide, one floor. Selection then reuses the md5-order
    * exclusive-offset rule, identical scale shape to [[sampleToBudget]]
    * (the targets are a |domains|-row broadcast).
    *
    * Output: (idCol, domainCol, n_tokens, offset, target). */
  def sampleToTemperatureBudget(df: DataFrame, idCol: String,
      domainCol: String, tokenCountCol: String, budgetTokens: Long,
      bucketNibbles: Int = 3): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(bucketNibbles >= 1 && bucketNibbles <= 7,
      "bucketNibbles must be in [1, 7]")
    val ord = md5(col(idCol).cast("string"))
    val (keyed, _) = Materialize.checkpointTracked(
      df.select(col(idCol), col(domainCol),
          col(tokenCountCol).cast("long").as("__tok"), ord.as("__ord"))
        .withColumn("__b",
          conv(substring(col("__ord"), 1, bucketNibbles), 16, 10).cast("long")))
    // tempered targets: per-domain token mass → sqrt share → prefix-sum
    // normalizer (positive adds are monotone, so MAX(prefix) is the total)
    val mass = keyed.groupBy(col(domainCol)).agg(sum(col("__tok")).as("__n"))
    val wOrd = Window.orderBy(col(domainCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shares = mass
      .withColumn("__s", sqrt(col("__n").cast("double")))
      .withColumn("__cum", sum(col("__s")).over(wOrd))
    val total = shares.agg(max(col("__cum")).as("__tot"))
    val targets = shares.crossJoin(broadcast(total))
      .withColumn("target",
        floor(lit(budgetTokens.toDouble) * col("__s") / col("__tot"))
          .cast("long"))
      .select(col(domainCol), col("target"))
    // same distributed exclusive-offset selection as sampleToBudget
    val intra = keyed.withColumn("__run",
      sum(col("__tok")).over(Window.partitionBy(col(domainCol), col("__b"))
        .orderBy(col("__ord"), col(idCol))))
    val offsets = keyed.groupBy(col(domainCol), col("__b"))
      .agg(sum(col("__tok")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.partitionBy(col(domainCol)).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(domainCol), col("__b"), col("__boff"))
    val off = col("__boff") + col("__run") - col("__tok")
    intra.join(broadcast(offsets), Seq(domainCol, "__b"))
      .join(broadcast(targets), Seq(domainCol))
      .filter(off < col("target"))
      .select(col(idCol), col(domainCol), col("__tok").as("n_tokens"),
        off.as("offset"), col("target"))
  }
}
