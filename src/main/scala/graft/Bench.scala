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

  /** Every registered query except q34 (the exact O(N²) cosine baseline,
    * kept out by design — its scale path q35 is benchmarked instead), so
    * the driver's perf gate sees the full surface: a regression in the SQL
    * write path, partition pruning, set-ops, or schema evolution is as
    * visible as one in the headline joins. */
  val headline: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q34"))

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

  /** Best-effort janitor for scratch warehouses orphaned by KILLED runs
    * (a SIGKILL skips every finally/shutdown hook): graft tools name all
    * their temp dirs `graft_*` / `tpcds-*` under java.io.tmpdir, so any
    * such dir untouched for 2+ hours is a leak from a dead JVM. Live
    * runs are safe — the age guard far exceeds any single section, and
    * concurrent fresh dirs are younger. (r7 lesson: ~40 GB of orphans
    * from killed sessions ENOSPC'd the sf100 curation cell.) */
  private def sweepStaleScratch(): Unit = try {
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"))
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    val it = java.nio.file.Files.list(tmp).iterator()
    var freed = 0
    while (it.hasNext) {
      val p = it.next()
      val nm = p.getFileName.toString
      if ((nm.startsWith("graft_") || nm.startsWith("tpcds-")) &&
          java.nio.file.Files.isDirectory(p) &&
          java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff) {
        try { graft.tools.TpcdsIngest.deleteRecursively(p); freed += 1 }
        catch { case _: Exception => }
      }
    }
    if (freed > 0) System.err.println(s"[bench] swept $freed stale scratch dirs")
  } catch { case _: Exception => }

  def main(args: Array[String]): Unit = {
    sweepStaleScratch()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE swap sort-merge for shuffled-hash when EVERY build-side
      // partition is measured under this threshold — the analytic joins
      // here are hash-friendly (DuckDB's default), and the conversion is
      // scale-safe by construction: at 100× data the partitions exceed
      // the bound and AQE leaves the sort-merge plan alone.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      // 64 MB broadcast threshold (default 10 MB predates boxes like this
      // one): a 2M-row projected dimension broadcasts and the fact side
      // joins map-side with NO shuffle. Scale-safe by the same mechanism
      // that makes the default safe — a dimension that outgrows the
      // threshold at a bigger SF simply stops broadcasting.
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // The fixtures are one parquet file per table; default 128 MB splits
      // leave a 1.3 GB lineitem scanning on 11 of 32 cores and a 112 MB
      // events table on ONE. 32 MB splits spread single-file scans wide;
      // on a real multi-file layout at scale the knob is simply neutral
      // (files already outnumber cores).
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "33554432"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Wall-clock guard: the final JSON line only exists if this process
    // reaches the end, so long optional sections (the curation scales)
    // check the remaining budget and skip rather than risk the whole
    // record to an external kill. Default is sized to the observed full
    // surface (~55 min) plus margin.
    // (7200 default: the r7 surface — 146 queries + three TPC-DS decades
    // + the sf1/sf10/sf100 curation grid — needs ~105 min; an external
    // kill before the deadline degrades gracefully, the shutdown hook
    // prints the provisional line with every completed section.)
    val benchT0 = System.nanoTime()
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "7200").toDouble
    def remainingS(): Double = deadlineS - (System.nanoTime() - benchT0) / 1e9

    // SPARK_GRAFT_BENCH_ONLY: comma-separated query-name substrings for
    // targeted diagnosis runs (e.g. "q31,q32"); unset = full headline.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queries = headline.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.exists(n.contains)))

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
    // Outlier re-timing budget: a single-JVM bench on a shared box can
    // catch an exogenous load spike (another JVM, the OS) mid-iteration —
    // r2/r3 showed 50×+ one-off outliers on queries that are 5 s on an
    // idle box. When the spread within a query exceeds 2×, spend up to
    // this many extra iterations so the reported mean/median reflect the
    // query, not the co-tenant. All iterations (outliers included) are
    // kept in the CSV and in max/n below — nothing is hidden.
    val extraIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA", "2").toInt
    val csvPath = sys.env.get("SPARK_GRAFT_BENCH_CSV")

    // Process-CPU share distinguishes "the query is slow" from "the box
    // was busy": a legitimate slow iteration burns our own CPU on 32
    // threads; an iteration stretched by a co-tenant shows near-zero
    // process-CPU fraction over a long wall-clock.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    case class Iter(sec: Double, procCpuSec: Double, sysLoad: Double)
    case class QStats(its: Seq[Iter], input: Long, shuffle: Long,
        cpuSec: Double, failed: Boolean) {
      def times: Seq[Double] = its.map(_.sec)
      def min: Double = times.min
      def max: Double = times.max
      def mean: Double = times.sum / times.size
      def median: Double = {
        val s = times.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
      def cpuFrac: Double =
        its.map(_.procCpuSec).sum / math.max(times.sum * cpus.toInt, 1e-9)
    }
    val results = queries.map { name =>
      System.err.println(s"[bench] timing $name")
      listener.reset()
      var failed = false
      def once(): Iter = {
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        // Cached blocks are never reused across fresh invocations — any
        // query-internal caching would be pure storage-memory pressure on
        // the next query (the r2 bench collapsed to 4-10× under exactly
        // that), so drop them between iterations defensively.
        spark.catalog.clearCache()
        Iter(t, (osBean.getProcessCpuTime - c0) / 1e9, osBean.getSystemLoadAverage)
      }
      var its = Vector.tabulate(iters)(_ => once())
      var extra = 0
      while (extra < extraIters && !failed &&
          its.map(_.sec).max > 2.0 * its.map(_.sec).min) {
        System.err.println(f"[bench] $name spread ${its.map(_.sec).max}%.1f/" +
          f"${its.map(_.sec).min}%.1f s — re-timing (exogenous-load suspect)")
        its :+= once()
        extra += 1
      }
      Thread.sleep(150) // let straggler task-end events drain (metrics are advisory)
      name -> QStats(its, listener.input.get() / its.size,
        listener.shuffleWrite.get() / its.size,
        listener.cpuNs.get() / its.size / 1e9, failed)
    }

    val ok = results.filterNot(_._2.failed)
    val failedNames = results.filter(_._2.failed).map(_._1)
    csvPath.foreach { path =>
      val rows = "query,iteration,seconds,proc_cpu_sec,sys_load,input_bytes,shuffle_bytes,cpu_sec" +:
        results.flatMap { case (k, st) =>
          st.its.zipWithIndex.map { case (it, i) =>
            f"$k,${i + 1},${it.sec}%.4f,${it.procCpuSec}%.3f,${it.sysLoad}%.2f,${st.input},${st.shuffle},${st.cpuSec}%.3f" }
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
    // Full per-query distribution + attribution: `cpu_frac` is this
    // process's share of (wall × cores) over all iterations — a slow
    // iteration with low cpu_frac means the box, not the plan, was busy.
    val stats = ok.map { case (k, st) =>
      "\"" + k + "\":{" +
        f""""min":${st.min}%.3f,"median":${st.median}%.3f,"mean":${st.mean}%.3f,""" +
        f""""max":${st.max}%.3f,"n":${st.its.size},"cpu_frac":${st.cpuFrac}%.3f,""" +
        f""""max_load":${st.its.map(_.sysLoad).max}%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stats_detail","queries":$stats}""")

    // FULL detail sidecar — every number the compact tail cannot carry
    // (full query names, min/median/mean/max/n/cpu_frac, bytes + cost,
    // per-iteration curation cells, tpcds failure names, overhead probe
    // times). Written next to the repo so a regression invisible in the
    // 2 kB tail is still one `cat` away (r5 verdict item #4).
    // Written via temp file + ATOMIC_MOVE and length-asserted (the r6
    // driver run left a 0-byte sidecar, silently erasing the round's only
    // full perf record) — and REWRITTEN after every completed section, so
    // even a killed bench leaves a valid sidecar carrying everything
    // finished up to that point.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "bench_detail.json")
    val sidecarStats = ok.map { case (k, st) =>
      "\"" + k + "\":{" +
        f""""min":${st.min}%.3f,"median":${st.median}%.3f,"mean":${st.mean}%.3f,""" +
        f""""max":${st.max}%.3f,"n":${st.its.size},"cpu_frac":${st.cpuFrac}%.3f,""" +
        f""""input":${st.input},"shuffle":${st.shuffle},"cpu_sec":${st.cpuSec}%.3f,""" +
        f""""est_cost_usd":${estCost(st)}%.6f}"""
    }.mkString("{", ",", "}")
    var tpcdsFailedDetail = Map.empty[String, Seq[String]]
    var curationDetail = ""
    var morTaxNow = "{}"
    var ovhNow = (0.0, 0.0)
    var ovhLateNow = (0.0, 0.0)
    // Section fragments for the final line, filled in as each section
    // completes. AtomicReference, not var: the early-termination shutdown
    // hook below reads them from its own thread, and a plain local var
    // captured in a closure has no cross-thread visibility guarantee.
    val tpcdsJsonRef = new java.util.concurrent.atomic.AtomicReference("")
    val curationJsonRef = new java.util.concurrent.atomic.AtomicReference("")
    val overheadJsonRef = new java.util.concurrent.atomic.AtomicReference("")
    val provisionalLine = new java.util.concurrent.atomic.AtomicReference("")
    val finalPrinted = new java.util.concurrent.atomic.AtomicBoolean(false)

    // ---- final-line construction (defined here, ahead of the long
    // sections, so the early-kill hook can emit a provisional line) ----
    // The driver records only the LAST ~2000 chars of stdout, so the
    // final line is built to FIT that window WHOLE (r5's tail cut 40 of
    // 130 per-query times): query keys are the unique qNN prefix, times
    // are trailing-zero-stripped with precision scaled to magnitude
    // (0.14 / 3.4 / 124), sections use short keys (legends in the section
    // builders + SURVEY §6), and everything else lives in the detail
    // sidecar (iteration counts included). Stability: mx=worst mean/min,
    // ov=queries over the 1.5x spread bound (empty = all stable).
    def fmt(t: Double): String = {
      val s = if (t >= 10) f"$t%.0f" else if (t >= 1) f"$t%.1f" else f"$t%.2f"
      if (s.contains('.'))
        s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else s
    }
    def short(k: String): String = k.takeWhile(_ != '_')
    val maxSpread = ok.map(st => st._2.mean / math.max(st._2.min, 1e-9))
      .foldLeft(0.0)(math.max)
    // capped at 2 names + a count so an unstable box can't push the line
    // past the driver's 2000-char tail window (full list in the CSV/detail)
    val violators = ok
      .filter(st => st._2.mean / math.max(st._2.min, 1e-9) > 1.5)
      .map(st => short(st._1))
    val spreadViolators = (violators.take(2) ++
      (if (violators.size > 2) Seq(s"+${violators.size - 2}") else Nil))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = failedNames.map("\"" + short(_) + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2.min).sum
    val sfShort = new java.io.File(sfDir).getName
    // If the full per-query map would push the line past the window, the
    // FASTEST queries are elided into "qf":{"n":count,"lt":threshold,
    // "tot":sum} with the threshold stepped up until the line fits — the
    // slow queries are the perf signal the tail must carry whole; every
    // elided time is still in the detail sidecar and the CSV.
    def buildLine(thresh: Double, partial: Boolean): String = {
      val (big, small) = ok.partition(_._2.min >= thresh)
      val qs = big.map { case (k, st) => "\"" + short(k) + "\":" + fmt(st.min) }
        .mkString("{", ",", "}")
      val qf = if (small.isEmpty) ""
        else f""","qf":{"n":${small.size},"lt":$thresh%.2f,"tot":${small.map(_._2.min).sum}%.1f}"""
      val part = if (partial) ""","partial":true""" else ""
      f"""{"metric":"total","value":$total%.1f,"unit":"sec","queries":$qs$qf,""" +
        f""""mx":$maxSpread%.2f,"ov":$spreadViolators""" +
        s"""${tpcdsJsonRef.get}${curationJsonRef.get}${overheadJsonRef.get}$part,""" +
        s""""sf":"$sfShort","failed":$failedJson}"""
    }
    def fitLine(partial: Boolean): String =
      Seq(0.0, 0.1, 0.25, 0.5, 1.0).view.map(buildLine(_, partial))
        .find(_.length <= 1950).getOrElse(buildLine(2.0, partial))
    def refreshProvisional(): Unit = provisionalLine.set(fitLine(partial = true))
    refreshProvisional()
    // Early-termination belt-and-braces: if the driver kills this process
    // (timeout / SIGTERM) mid-section, print the provisional line —
    // headline results plus every COMPLETED section, marked
    // "partial":true — as the process's last output. Registered below
    // SparkContext's stop priority (50) so it runs after Spark's own
    // teardown noise; logging is forced OFF first so nothing follows it.
    org.apache.spark.sql.graft.GraftShutdownHooks.add(priority = 1) {
      if (!finalPrinted.get() && provisionalLine.get.nonEmpty) {
        try org.apache.logging.log4j.core.config.Configurator.setAllLevels(
          org.apache.logging.log4j.LogManager.getRootLogger.getName,
          org.apache.logging.log4j.Level.OFF)
        catch { case _: Throwable => () }
        println(provisionalLine.get)
        System.out.flush()
      }
    }
    def writeDetailSidecar(): Unit = try {
      val tf = tpcdsFailedDetail.map { case (k, names) =>
        "\"" + k + "\":" + names.map("\"" + _ + "\"").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val cd = if (curationDetail.isEmpty) "{}" else curationDetail
      val payload = (s"""{"queries":$sidecarStats,"tpcds_failed":$tf,"curation":$cd,""" +
        s""""mor_tax":$morTaxNow,""" +
        f""""overhead":{"raw_s":${ovhNow._1}%.3f,"graft_s":${ovhNow._2}%.3f},""" +
        f""""overhead_late":{"raw_s":${ovhLateNow._1}%.3f,"graft_s":${ovhLateNow._2}%.3f},""" +
        s""""sf":"$sfDir","iters":$iters}""").getBytes("UTF-8")
      val target = java.nio.file.Paths.get(detailPath).toAbsolutePath
      val tmp = java.nio.file.Files.createTempFile(
        target.getParent, ".bench_detail", ".tmp")
      java.nio.file.Files.write(tmp, payload)
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val written = java.nio.file.Files.size(target)
      require(written == payload.length,
        s"detail sidecar $written bytes, expected ${payload.length}")
      System.err.println(s"[bench] wrote $target ($written bytes)")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    writeDetailSidecar()
    // Snapshot-layer overhead vs raw parquet (BASELINE.md "Our BENCH
    // target": the snapshot layer should cost ≤~20% over raw Parquet
    // scans). Apples-to-apples by construction: the graft table ADOPTS
    // the same parquet file in place (add_files, zero copy), so both
    // sides read identical bytes — the delta is manifest planning + the
    // DSv2 scan path. The probe aggregates a non-pushable SUM so the
    // metadata-aggregate shortcut cannot fake the graft side. Runs HERE,
    // right after the headline queries, so it measures the layer — the
    // same probe re-runs post-curation into the sidecar's overhead_late
    // (see below for why the two can diverge).
    def runOverheadProbe(): (Double, Double) = try {
      val li = s"$sfDir/lineitem.parquet"
      val wh = java.nio.file.Files.createTempDirectory("graft_ovh").toString
      val store = new graft.core.TableStore(spark, wh)
      store.addFiles("li", li)
      val cat = s"govh${System.nanoTime()}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      def probe(from: String): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(("SELECT l_returnflag, COUNT(*) AS n, " +
          "SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q FROM %s " +
          "GROUP BY l_returnflag").format(from)).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val raw = probe(s"parquet.`$li`")
      val viaStore = probe(s"$cat.ns.li")
      (raw, viaStore)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] overhead section failed: ${e.getMessage}")
      (0.0, 0.0)
    }
    ovhNow = runOverheadProbe()
    overheadJsonRef.set(if (ovhNow._1 <= 0) ""
      else f""","ovh":${ovhNow._2 / ovhNow._1}%.2f""")
    refreshProvisional()
    writeDetailSidecar()
    // TPC-DS corpus sections: the reference's literal 98 queries, timed in
    // THIS artifact (one timed pass each). "tpcds" = sf1; "tpcds10" = the
    // sf10 dsdgen decade (r5 verdict item #5 — exercises manifest planning
    // at thousands of files on the workload it was built for) when that
    // dir has been generated. Skipped when the dir is absent or the env
    // kill-switch is set; failures never fail the bench. Key legend:
    // n=queries ok, t=sum sec, m=median sec, w=wall incl ingest, f=failed
    // count (names on stderr + detail file).
    def tpcdsSection(key: String, dirEnv: String, defaultDir: String,
        skipEnv: String, minBudgetS: Double = 0.0): String = {
      val dir = java.nio.file.Paths.get(sys.env.getOrElse(dirEnv, defaultDir))
      if (sys.env.contains(skipEnv) || !java.nio.file.Files.isDirectory(dir) ||
          remainingS() < minBudgetS) ""
      else try {
        val t0 = System.nanoTime()
        val (times, tFailed) = graft.tools.TpcdsTime.runCorpus(
          spark, dir, iters = 1, warmup = false,
          log = m => System.err.println(s"[bench][$key] $m"))
        val tOk = times.filterNot { case (n, _) => tFailed.contains(n) }
        val secs = tOk.map(_._2).sorted
        val med = if (secs.isEmpty) 0.0
          else if (secs.size % 2 == 1) secs(secs.size / 2)
          else (secs(secs.size / 2 - 1) + secs(secs.size / 2)) / 2
        tpcdsFailedDetail += key -> tFailed
        f""","$key":{"n":${tOk.size},"t":${secs.sum}%.1f,"m":$med%.2f,""" +
          f""""w":${(System.nanoTime() - t0) / 1e9}%.0f,"f":${tFailed.size}}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $key section failed: ${e.getMessage}")
        ""
      }
    }
    tpcdsJsonRef.set(
      tpcdsSection("tpcds", "SPARK_GRAFT_TPCDS_DIR", "target/tpcds-sf1",
        "SPARK_GRAFT_SKIP_TPCDS") +
      tpcdsSection("tpcds10", "SPARK_GRAFT_TPCDS_DIR10", "target/tpcds-sf10",
        "SPARK_GRAFT_SKIP_TPCDS10"))
    // tpcds30 (the stretch decade, ~15 min sweep) runs LAST — after the
    // curation grid and mor_tax — so the reference's primary axis can
    // never be starved by it (r7 lesson: a pre-curation sf30 run left
    // the sf100 cell 1382 s of a ~1600 s need).
    refreshProvisional()
    writeDetailSidecar()
    // Curation-axis section (the reference's PRIMARY evaluation —
    // BASELINE.md curation tables): bulk insert + SCD2 merges at update
    // proportions 0.001-0.99 over store_sales-shaped sf1/sf10, plus the
    // skewed-CDC cell. Every cell is now timed n>=2 times with outlier
    // re-timing; the tail carries per-cell MEDIANS + the worst within-cell
    // spread, the detail file carries every iteration (r5 verdict item #1).
    curationJsonRef.set {
      val data = sys.env.getOrElse("SPARK_GRAFT_CURATION_DATA",
        "target/tpcds-sf1/store_sales.parquet")
      // sf100 runs MoR-focused (see CurationBench.runScale): the
      // reference's own smaller published scale, where its Athena failed
      // at p=0.99 — our MoR rows must stay flat there. CoW cells at
      // sf100 are excluded by the sandbox's disk ceiling, covered at
      // sf1/sf10.
      val scales = graft.tools.CurationBench.parseScales(
        sys.env.getOrElse("SPARK_GRAFT_CURATION_SCALES",
          "sf1:1,sf10:10,sf100:100:mor"))
      val cIters = sys.env.getOrElse("SPARK_GRAFT_CURATION_ITERS", "2").toInt
      if (sys.env.contains("SPARK_GRAFT_SKIP_CURATION") ||
          !java.nio.file.Files.exists(java.nio.file.Paths.get(data))) ""
      else try {
        val (compact, detail) = graft.tools.CurationBench.runAll(
          spark, data, scales, Seq(0.001, 0.01, 0.1, 0.99),
          m => System.err.println(s"[bench][curation] $m"), iters = cIters,
          remainingS = remainingS _,
          // after each completed scale, fold what's done into the
          // provisional tail line + sidecar so a mid-grid kill still
          // delivers the finished scales
          onPartial = (pc, pd) => {
            curationDetail = pd
            curationJsonRef.set("," + "\"cur\":" + pc)
            refreshProvisional()
            writeDetailSidecar()
          })
        curationDetail = detail
        "," + "\"cur\":" + compact
      } catch { case e: Throwable =>
        // keep whatever onPartial already folded (finished scales) — a
        // late-scale failure must not erase the section from the tail
        // line (r7 lesson: an sf100 ENOSPC blanked sf1+sf10 too)
        System.err.println(s"[bench] curation section failed: ${e.getMessage}")
        curationJsonRef.get()
      }
    }
    refreshProvisional()
    writeDetailSidecar()
    // A second probe run at the OLD position (post-curation, ~2 h of
    // session age): r8 observed the GRAFT side alone degrade 0.33 s →
    // 4.0 s here while raw parquet stayed flat — session-age entropy in
    // the DSv2 path, not scan-layer cost (the same probe in a fresh or
    // early session reads 0.76-0.85×; synthetic catalog-conf bloat does
    // NOT reproduce it). Kept in the sidecar as overhead_late to track;
    // the tail's "ovh" is the early, layer-only measurement.
    ovhLateNow = runOverheadProbe()
    refreshProvisional()

    // MoR read-tax curve (the number a CDC user asks first): SELECT cost
    // over one table as equality-delete keys accumulate 0 → 1k → 10k →
    // 100k, then after CALL compact — each probe is the same non-pushable
    // aggregate through the SQL catalog read (broadcast delete filter on
    // the MoR path), min of 3. Detail-sidecar only; delete tiers are
    // capped at half the table so small fixtures stay meaningful.
    val morTaxJson: String =
      if (sys.env.contains("SPARK_GRAFT_SKIP_MORTAX") || remainingS() < 240) "{}"
      else try {
        val wh = java.nio.file.Files.createTempDirectory("graft_mortax").toString
        val store = new graft.core.TableStore(spark, wh)
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(org.apache.spark.sql.functions.col("l_orderkey"),
            org.apache.spark.sql.functions.col("l_linenumber"),
            org.apache.spark.sql.functions.col("l_quantity"))
          .withColumn("rk", org.apache.spark.sql.functions.concat_ws(":",
            org.apache.spark.sql.functions.col("l_orderkey"),
            org.apache.spark.sql.functions.col("l_linenumber")))
        store.commit("mt", li, "create")
        val total = li.count()
        val cat = s"gmtx${System.nanoTime()}"
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.catalog.GraftCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
        def probe(): Double = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          spark.sql("SELECT COUNT(*) AS n, SUM(CAST(l_quantity AS " +
            s"DECIMAL(18,2))) AS q FROM $cat.ns.mt").collect()
          (System.nanoTime() - t0) / 1e9
        }.min
        val tiers = Seq(1000L, 10000L, 100000L).filter(_ <= total / 2)
        val maxN = tiers.lastOption.getOrElse(0L)
        val ranked = li.select(org.apache.spark.sql.functions.col("rk"))
          .orderBy("rk").limit(maxN.toInt)
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("rk")))
        probe() // unrecorded warmup: the first catalog read pays codegen
        var prev = 0L
        val points = (f""""d0":${probe()}%.3f""" +: tiers.map { n =>
          store.deleteKeysMoR("mt", ranked
            .filter(org.apache.spark.sql.functions.col("rn") > prev &&
              org.apache.spark.sql.functions.col("rn") <= n)
            .select("rk"), Seq("rk"))
          prev = n
          f""""d$n":${probe()}%.3f"""
        }) :+ {
          store.compact("mt")
          f""""compacted":${probe()}%.3f"""
        }
        val json = points.mkString("{", ",", "}")
        System.err.println(s"[bench] mor_tax $json")
        json
      } catch { case e: Throwable =>
        System.err.println(s"[bench] mor_tax section failed: ${e.getMessage}")
        "{}"
      }

    morTaxNow = morTaxJson
    writeDetailSidecar()

    // Deferred stretch decade: whatever budget the primary sections left
    // (the sweep itself is ~15 min; the gate keeps a kill margin).
    tpcdsJsonRef.set(tpcdsJsonRef.get +
      tpcdsSection("tpcds30", "SPARK_GRAFT_TPCDS_DIR30", "target/tpcds-sf30",
        "SPARK_GRAFT_SKIP_TPCDS30", minBudgetS = 1000))
    refreshProvisional()
    writeDetailSidecar()

    val line = fitLine(partial = false)
    System.err.println(s"[bench] final line ${line.length} chars" +
      (if (line.length > 1950) " — OVER the ~2000-char tail budget!" else ""))
    // The final JSON line must be the LAST output this process ever
    // emits: the r6 driver run lost the whole bench record when
    // spark.stop() raced in-flight task-status updates and log4j printed
    // >2000 chars of shutdown stack traces AFTER the line, flooding the
    // driver's captured tail. Order is therefore: silence ALL logging
    // (log4j2 root OFF — shutdown hooks log through it too), stop Spark,
    // THEN print the line and flush.
    try {
      spark.sparkContext.setLogLevel("OFF")
      org.apache.logging.log4j.core.config.Configurator.setAllLevels(
        org.apache.logging.log4j.LogManager.getRootLogger.getName,
        org.apache.logging.log4j.Level.OFF)
    } catch { case _: Throwable => () }
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    System.out.flush()
    finalPrinted.set(true)
    if (failedNames.nonEmpty) sys.exit(1)
  }
}
