package graft.tools

import java.nio.file.{Files, Paths}

import graft.catalog.GraftCatalog
import graft.core.TableStore
import org.apache.spark.sql.SparkSession

/** Dev tool: measure what ANALYZE-fed FIRST-STAGE selectivity
  * ([[graft.core.SelectivityEstimate]] — maxFreq-bounded equality, exact
  * min/max range interpolation, no CBO flag needed) buys over AQE alone.
  *
  * Two measurements:
  *  1. Corpus A/B: the TPC-DS queries carrying literal predicates on
  *     FACT columns (q15/q44/q49/q50/q62/q78/q99), timed with
  *     `spark.graft.stats.filterEstimation` off vs on after ANALYZE,
  *     AQE on in both arms (the honest baseline — AQE is the default).
  *     Reports wall-clock and whether the STATIC plan (pre-AQE
  *     `sparkPlan`) changed its broadcast count.
  *  2. Branch-join micro-bench: fact ⋈ (mid-size table filtered to
  *     ~0.5%) where the unfiltered mid-size side exceeds the broadcast
  *     threshold. Estimation-off plans a sort-merge join and pays BOTH
  *     shuffle maps before AQE converts; estimation-on broadcasts
  *     statically and never shuffles the fact. The wall-clock gap is
  *     the value of getting stage one right.
  *
  * Usage: runMain graft.tools.ProfileStatsBroadcast [dataDir] [queries] [iters]
  */
object ProfileStatsBroadcast {

  def main(args: Array[String]): Unit = {
    val dataDir = Paths.get(args.headOption.getOrElse("target/tpcds-sf10"))
    val queries = args.lift(1).getOrElse("q15,q44,q49,q50,q62,q78,q99")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outer = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    outer.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory("graft_statsbc").toString
    val store = new TableStore(outer, wh)
    TpcdsIngest.ingest(outer, store, dataDir, partitioned = true,
      m => System.err.println(s"[statsbc][ingest] $m"))
    store.tables.foreach { t =>
      val n = store.analyzeTable(t)
      System.err.println(s"[statsbc] analyzed $t (version=$n)")
    }

    val sqlDir =
      Paths.get("/root/reference/src/data_derivation/query_performance/sql")
    def textOf(q: String): String =
      new String(Files.readAllBytes(sqlDir.resolve(s"$q.sql")), "UTF-8")

    def session(est: Boolean): SparkSession = {
      val s = outer.newSession()
      val cat = s"gsbc${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"USE $cat")
      s.conf.set("spark.sql.ansi.enabled", "true")
      s.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
      s.conf.set("spark.graft.stats.filterEstimation", est.toString)
      s
    }

    /** Static (pre-AQE) broadcast-join count — what stage one runs.
      * AQE is flipped off just for the probe (with it on, `sparkPlan` is
      * an AdaptiveSparkPlanExec whose inner tree is not reachable via
      * children), and the count is of broadcast JOIN nodes, not
      * exchanges — exchanges are only inserted by EnsureRequirements
      * during executedPlan preparation, after `sparkPlan`. */
    def staticBroadcasts(s: SparkSession, text: String): Int = {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        var n = 0
        s.sql(text).queryExecution.sparkPlan.foreach {
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
            n += 1
          case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
            n += 1
          case _ =>
        }
        n
      } finally s.conf.set("spark.sql.adaptive.enabled", "true")
    }

    def time(s: SparkSession, text: String): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        s.sql(text).collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    def arm(est: Boolean): Map[String, (Double, Int)] = {
      val s = session(est)
      queries.map { q =>
        val t = textOf(q)
        val bc = staticBroadcasts(s, t)
        val sec = time(s, t)
        System.err.println(
          f"[statsbc] $q est=$est: $sec%.2f s, $bc static broadcasts")
        q -> (sec, bc)
      }.toMap
    }
    val off = arm(est = false)
    val on = arm(est = true)

    // ------------------------------------------------ branch-join micro
    // store_sales ⋈ customer ON customer_sk, customer filtered by a
    // pushed range to a sliver. The broadcast threshold is set BELOW
    // customer's manifest size (34 MB at sf10) so the unfiltered side
    // must not broadcast statically; estimation prices the filtered
    // branch well under it. Same SQL both arms; AQE ON in both — the
    // off arm's cost is the fact-side shuffle map that runs before
    // AQE's post-shuffle broadcast conversion can kick in. Scale note:
    // the absolute gap here is bounded by sf10's shuffle cost; at 100 TB
    // the same wrong first stage shuffles the whole fact table.
    val micro = try {
      val s = session(est = false)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "8m")
      val maxSk = s.sql("SELECT MAX(c_customer_sk) FROM customer")
        .head.getAs[Number](0).longValue()
      val loSk = maxSk - maxSk / 200 // top ~0.5% of the key range
      val q =
        s"""SELECT COUNT(*) AS n, SUM(ss_quantity) AS qty
           |FROM store_sales JOIN customer ON ss_customer_sk = c_customer_sk
           |WHERE c_customer_sk >= $loSk""".stripMargin
      val offSec = time(s, q)
      val offBc = staticBroadcasts(s, q)
      val s2 = session(est = true)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "8m")
      val onSec = time(s2, q)
      val onBc = staticBroadcasts(s2, q)
      System.err.println(f"[statsbc] micro off: $offSec%.2f s ($offBc bc) " +
        f"on: $onSec%.2f s ($onBc bc)")
      f""""micro":{"off":$offSec%.2f,"on":$onSec%.2f,""" +
        s""""off_static_bc":$offBc,"on_static_bc":$onBc},"""
    } catch { case e: Throwable =>
      System.err.println(s"[statsbc] micro failed: ${e.getMessage}")
      ""
    }

    val parts = queries.map { q =>
      val (o, ob) = off(q)
      val (n, nb) = on(q)
      f""""$q":{"off":$o%.2f,"on":$n%.2f,"off_bc":$ob,"on_bc":$nb}"""
    }
    println(s"""{"metric":"stats_broadcast",$micro"queries":{${parts.mkString(",")}}}""")
    outer.stop()
  }
}
