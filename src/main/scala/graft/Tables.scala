package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table access (TESTDATA.md). One parquet dir per table at
  * `/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`.
  *
  * Mirrors the reference's catalog-backed table reads
  * (src/data_curation/glue_jobs/pyspark_functions.py:24 `spark.read.parquet`,
  * src/tpcds_generator/update_tpcds.py:51-55 `spark.table`), re-expressed as
  * temp-view registration so the whole TPC-DS-style SQL surface runs through
  * `spark.sql` with Catalyst doing pushdown/pruning into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spread an unsplittable fixture scan across the box (opt guide §2.5:
    * "input skew: one huge unsplittable file → repartition immediately
    * after the read"). The driver fixtures are single-row-group parquet
    * files, so a bare scan — and every narrow map FUSED into it:
    * tokenize/shingle/md5 kernels, join probes — runs as ONE task no
    * matter the split size, leaving 31 of 32 cores idle for the whole
    * first stage. When the file set plans fewer splits than the session's
    * parallelism, redistribute once right after the read; the round-robin
    * exchange moves only the table's few MB. On a real many-file layout
    * (any production scale) `splits >= cores`, the condition is false and
    * this is the identity — no shuffle is ever added at scale.
    *
    * OPT-IN ([[loadSpread]]), not the default: a full-bench A/B of the
    * blanket version measured two systematic losses. (1) Queries that
    * COMMIT a loaded (or lightly derived) frame into the table store
    * inherited 32-way fragmentation — 32 tiny files per commit, paid
    * again by every footer harvest, MoR overlay and rewrite downstream
    * (q88 1.2→13 s, q94 1.1→6.6 s, q101 2.1→6.5 s). (2) Allocation-heavy
    * JVM kernels (imageio decode, k-means over int8 codes, PQ) burned up
    * to 10× the PROCESS CPU when run 32-wide (q140 10.8→110 cpu-s, q98
    * 2→23 cpu-s — GC/alloc contention, not more work). Spread is applied
    * only where the A/B showed a win: cheap-per-row, compute-bound
    * projections and join probes that never feed a store commit. */
  private def spread(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val f = new java.io.File(path)
    val bytes =
      if (f.isDirectory)
        Option(f.listFiles).map(_.filter(_.isFile).map(_.length).sum)
          .getOrElse(0L)
      else f.length
    val cores = spark.sparkContext.defaultParallelism
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes",
        (128L * 1024 * 1024).toString))
    val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (bytes >= 256L * 1024 && splits < cores) df.repartition(cores) else df
  }

  /** [[load]] + [[spread]]: for compute-bound consumers of an otherwise
    * single-task fixture scan. Never use when the frame (or a near-
    * projection of it) is committed to a table store — the 32-way
    * layout fragments every downstream snapshot. */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    spread(spark, load(spark, dir, name), s"$dir/$name.parquet")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) in the driver fixtures, which
      // Spark 4 cannot map to TimestampType directly. Read it as a long and
      // convert with exact integer arithmetic (`DIV` — the values are
      // ~1.7e18, beyond double's 2^53 exact range, so float division would
      // corrupt timestamps). The fixture has no sub-microsecond residue, so
      // this is lossless. Files rewritten by other engines may instead carry
      // TIMESTAMP(MICROS) without isAdjustedToUTC (⇒ TIMESTAMP_NTZ) or a
      // plain TimestampType — normalize all three to TimestampType (session
      // tz is UTC, so the NTZ cast is value-preserving).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view for `spark.sql` queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
