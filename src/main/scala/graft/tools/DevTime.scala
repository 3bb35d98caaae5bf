package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timing harness: runs one SparkEntry query N times
  * at a given sf dir and prints each wall time (bench-style session). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names share one JVM/session (scale sweeps)
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        println(f"[devtime] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
