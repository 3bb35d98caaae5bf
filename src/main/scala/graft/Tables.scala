package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot map to
      // TimestampType directly. Read it as a long and convert with exact
      // integer arithmetic (`DIV` — the values are ~1.7e18, beyond double's
      // 2^53 exact range, so float division would corrupt timestamps). The
      // fixture has no sub-microsecond residue, so this is lossless.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view for `spark.sql` queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
