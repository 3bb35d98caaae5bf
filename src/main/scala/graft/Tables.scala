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
