package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Mirrors the reference's benchmark harness semantics
  * (reference/src/data_derivation/query_performance/benchmark_functions.py:
  * 12-106: N iterations per query, stats aggregated) adapted to a single
  * JVM: one warmup pass at sf0.001 absorbs session/codegen init, then each
  * query is timed twice at the target scale and the best time is reported
  * (the reference averaged warm Athena runs; min-of-2 is the single-node
  * analogue).
  */
object Bench {

  /** Representative subset across scan/join/agg/window/subquery/set-op,
    * curation lifecycle, and the training-data extension operators.
    * Excluded by design: q34 (exact O(N²) cosine baseline — its scale path
    * q35 is benchmarked instead) and the tiny metadata-only q22/q23. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_topk_orders",
    "q04_semijoin_priority", "q06_corr_scalar_subquery", "q08_window_rank",
    "q09_window_cumulative", "q11_rollup_grouping", "q12_count_distinct",
    "q15_case_buckets", "q16_full_outer_join", "q19_crossjoin_rank",
    "q20_scd2_history", "q21_merge_upsert", "q25_date_interval",
    "q26_selfjoin_lag", "q31_ngram_jaccard", "q32_minhash_lsh",
    "q35_embedding_neardup_lsh", "q36_similarity_topk", "q37_text_langid",
    "q39_token_stats", "q41_multimodal_features", "q45_batch_sessions",
    "q46_asof_join", "q48_sql_writes", "q50_multiway_cte_selfjoin",
    "q51_rollup_8col", "q52_intersect_channels")

  /** A20 metrics collector (replaces the reference's Athena `Statistics` /
    * Glue DPU collectors — SURVEY.md §2A A19/A20): scan size from the
    * executed plan's file-scan nodes (the analogue of Athena's
    * DataScannedInBytes; task-level inputMetrics report 0 on local fs) and
    * shuffle bytes from task metrics. */
  private final class BytesListener extends SparkListener
      with org.apache.spark.sql.util.QueryExecutionListener {
    val input = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        cpuNs.addAndGet(m.executorCpuTime)
        ()
      }
    }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
      // AQE wraps the final plan: recurse through adaptive/stage nodes.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scanned(p: SparkPlan): Long = {
        val self = if (p.metrics.contains("filesSize")) p.metrics("filesSize").value else 0L
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case o => o.children
        }
        self + kids.map(scanned).sum
      }
      input.addAndGet(scanned(qe.executedPlan))
      ()
    }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    def reset(): Unit = { input.set(0L); shuffleWrite.set(0L); cpuNs.set(0L) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = headline.filter(SparkEntry.queries.contains)

    // Warmup at the smallest scale: pays JIT/codegen/parquet-footer costs
    // once so timed runs measure the plan, not the JVM.
    queries.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
      finally spark.catalog.clearCache()
    }

    val listener = new BytesListener
    spark.sparkContext.addSparkListener(listener)
    spark.listenerManager.register(listener)

    // The reference averages 4-5 timed iterations and keeps a CSV for
    // ratio analysis (benchmark_functions.py:51-106); iteration count and
    // CSV path are env-tunable, defaults match the driver's budget.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val csvPath = sys.env.get("SPARK_GRAFT_BENCH_CSV")

    case class QStats(times: Seq[Double], input: Long, shuffle: Long,
        cpuSec: Double, failed: Boolean) {
      def min: Double = times.min
      def mean: Double = times.sum / times.size
    }
    val results = queries.map { name =>
      System.err.println(s"[bench] timing $name")
      listener.reset()
      var failed = false
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        // Persisted intermediates (dedup postings) are only reused WITHIN
        // one query DAG — a fresh invocation rebuilds them, so carrying
        // cached blocks across iterations/queries is pure storage-memory
        // pressure (the round-2 driver bench collapsed to 4-10× under it).
        spark.catalog.clearCache()
        t
      }
      Thread.sleep(150) // let straggler task-end events drain (metrics are advisory)
      name -> QStats(times, listener.input.get() / iters,
        listener.shuffleWrite.get() / iters,
        listener.cpuNs.get() / iters / 1e9, failed)
    }

    val ok = results.filterNot(_._2.failed)
    val failedNames = results.filter(_._2.failed).map(_._1)
    csvPath.foreach { path =>
      val rows = "query,iteration,seconds,input_bytes,shuffle_bytes,cpu_sec" +:
        results.flatMap { case (k, st) =>
          st.times.zipWithIndex.map { case (t, i) =>
            f"$k,${i + 1},$t%.4f,${st.input},${st.shuffle},${st.cpuSec}%.3f" }
        }
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        rows.mkString("\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $path")
    }
    // Per-query scan/shuffle byte detail and mean timings go on their own
    // EARLIER lines (detail once pushed the headline JSON past the
    // driver's captured-tail window and the whole bench went unscored).
    // The LAST stdout line is the compact contract the driver parses.
    // A20 cost model, mirroring what the reference's collectors priced:
    // an Athena-style scan charge ($5/TB, 10 MB minimum per query) and a
    // Glue-style compute charge (DPU-hour ≈ 4 vCPU ⇒ $0.44/(4 cpu-hours)).
    def estCost(st: QStats): Double = {
      val scanUsd = math.max(st.input, 10L * 1024 * 1024) / 1e12 * 5.0
      val cpuUsd = st.cpuSec / 3600.0 / 4.0 * 0.44
      scanUsd + cpuUsd
    }
    val bytes = ok.map { case (k, st) =>
      "\"" + k +
        f"""\":{"input":${st.input},"shuffle":${st.shuffle},"cpu_sec":${st.cpuSec}%.3f,"est_cost_usd":${estCost(st)}%.6f}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"bytes_detail","bytes":$bytes}""")
    val means = ok.map { case (k, st) => "\"" + k + f"\":${st.mean}%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"mean_detail","iters":$iters,"queries":$means}""")
    val qs = ok.map { case (k, st) => "\"" + k + f"\":${st.min}%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2.min).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson}""")
    spark.stop()
    if (failedNames.nonEmpty) sys.exit(1)
  }
}
