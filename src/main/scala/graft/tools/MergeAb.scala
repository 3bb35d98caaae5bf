package graft.tools

import graft.core.{Merge, TableStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B grid: classic single-shuffle MERGE vs the opt-in low-shuffle
  * pre-split (`withSmallSourceMaxRows`), across the layouts that decide
  * when the opt-in pays:
  *  - clustered target × localized delta — `filesHitByKeys` prunes for
  *    BOTH plans, so the pre-split can only add overhead;
  *  - clustered target × scattered delta — pruning defeated, classic
  *    must shuffle the whole table where the pre-split scans it
  *    map-side twice;
  *  - unclustered target × scattered delta — the r8 losing layout,
  *    re-measured on the direct-merge shape.
  * Complements the r8 end-to-end scd2 A/B (low-shuffle LOST 41.7 vs
  * 23.4 s at sf10 p=0.001 on md5-scattered store_sales).
  *
  * Usage: runMain graft.tools.MergeAb [storeSalesDir] [copies] [iters]
  * Prints one JSON line with per-iteration seconds per cell.
  */
object MergeAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/tpcds-sf1/store_sales.parquet")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "90s")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = java.nio.file.Files.createTempDirectory("graft_mergeab").toString
    val store = new TableStore(spark, wh)

    // pk-clustered layout: range-partitioned and sorted on pk, so file
    // min/max ranges tile the md5 keyspace and a key-localized delta
    // touches a small file subset. unclustered: baseFrame's natural
    // (dsdgen) order — every file spans the full md5 range.
    def makeTarget(table: String, clustered: Boolean): Unit = {
      val b = CurationBench.baseFrame(spark, dir, copies)
      store.commit(table,
        if (clustered) b.repartitionByRange(64, col("pk")).sortWithinPartitions("pk")
        else b,
        "create")
    }

    // localized delta: every pk under "01" — ~1/256 of the keyspace,
    // confined to the first range files. scattered: uniform churn at
    // the same expected row count (p ≈ 1/256).
    def deltaLocalized() = CurationBench.baseFrame(spark, dir, copies)
      .filter(col("pk") < lit("01"))
      .withColumn("ss_quantity", lit(1).cast("integer"))
    def deltaScattered() = CurationBench.churnDelta(spark, dir, copies, 1.0 / 256)

    def cell(name: String, table: String,
        mk: () => org.apache.spark.sql.DataFrame): String = {
      var baseVersion = store.currentVersion(table)
      def timeMerge(delta: org.apache.spark.sql.DataFrame, thr: Long): Double = {
        val t0 = System.nanoTime()
        Merge.into(store, table)
          .using(delta)
          .on(Seq("pk"))
          .whenMatchedUpdate()
          .whenNotMatchedInsert()
          .withSmallSourceMaxRows(thr)
          .run()
        val t = (System.nanoTime() - t0) / 1e9
        baseVersion = store.rollbackTo(table, baseVersion)
        store.expireSnapshots(table, keepLast = 1)
        t
      }
      // materialize the delta once so generation cost is out of the clock
      val d = java.nio.file.Files.createTempDirectory("graft_ab_delta").toString
      mk().write.mode("overwrite").option("compression", "zstd").parquet(d)
      val delta = spark.read.parquet(d)
      val n = delta.count()
      // warmup both paths once, then n iterations ALTERNATED so slow
      // box drift lands on both plans evenly
      timeMerge(delta, 0L); timeMerge(delta, Long.MaxValue)
      val classic = scala.collection.mutable.ArrayBuffer.empty[Double]
      val low = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to iters).foreach { _ =>
        classic += timeMerge(delta, 0L)
        low += timeMerge(delta, Long.MaxValue)
      }
      System.err.println(f"[ab] $name rows=$n " +
        s"classic=${classic.map(t => f"$t%.1f").mkString(",")} " +
        s"low=${low.map(t => f"$t%.1f").mkString(",")}")
      TpcdsIngest.deleteRecursively(java.nio.file.Paths.get(d))
      f""""$name":{"rows":$n,"classic":[${classic.map(t => f"$t%.2f").mkString(",")}],""" +
        f""""low_shuffle":[${low.map(t => f"$t%.2f").mkString(",")}]}"""
    }

    makeTarget("ab_clustered", clustered = true)
    val loc = cell("localized_clustered", "ab_clustered", deltaLocalized _)
    val sca = cell("scattered_clustered", "ab_clustered", deltaScattered _)
    makeTarget("ab_plain", clustered = false)
    val scu = cell("scattered_unclustered", "ab_plain", deltaScattered _)
    println(s"""{"metric":"merge_ab","copies":$copies,"iters":$iters,$loc,$sca,$scu}""")
    TpcdsIngest.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
