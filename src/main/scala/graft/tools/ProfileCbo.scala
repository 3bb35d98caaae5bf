package graft.tools

import java.nio.file.{Files, Paths}

import graft.catalog.GraftCatalog
import graft.core.TableStore
import org.apache.spark.sql.SparkSession

/** Dev tool: measure what ANALYZE-fed planner statistics buy on the
  * TPC-DS corpus (r5 verdict stretch item: "feed ANALYZE stats to the
  * planner ... measure on the corpus' worst join orders").
  *
  * Protocol: ingest dsdgen data once, time each candidate query
  * (best-of-N) with CBO off; ANALYZE every table's join/filter columns
  * ($stats NDV/null counts — served to Spark through
  * GraftStatsScan.estimateStatistics columnStats); re-time with
  * `spark.sql.cbo.enabled` + `joinReorder.enabled` on a fresh session
  * (the V2 relation stats are read at plan time). Prints per-query
  * off/on seconds and whether the optimized join order changed.
  *
  * Usage: runMain graft.tools.ProfileCbo [dataDir] [q17,q25,...] [iters]
  */
object ProfileCbo {

  def main(args: Array[String]): Unit = {
    val dataDir = Paths.get(args.headOption.getOrElse("target/tpcds-sf1"))
    val queries = args.lift(1).getOrElse("q17,q25,q29,q72,q91")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outer = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    outer.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory("graft_cbo").toString
    val store = new TableStore(outer, wh)
    TpcdsIngest.ingest(outer, store, dataDir, partitioned = true,
      m => System.err.println(s"[cbo][ingest] $m"))

    val sqlDir =
      Paths.get("/root/reference/src/data_derivation/query_performance/sql")
    def textOf(q: String): String =
      new String(Files.readAllBytes(sqlDir.resolve(s"$q.sql")), "UTF-8")

    def session(cbo: Boolean): SparkSession = {
      val s = outer.newSession()
      val cat = s"gcbo${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"USE $cat")
      s.conf.set("spark.sql.ansi.enabled", "true")
      s.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
      s.conf.set("spark.sql.cbo.enabled", cbo.toString)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      s
    }

    def joinShape(s: SparkSession, text: String): String = {
      val plan = s.sql(text).queryExecution.optimizedPlan
      val leaves = scala.collection.mutable.ArrayBuffer.empty[String]
      plan.foreach {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          leaves += r.relation.table.name()
        case _ =>
      }
      leaves.mkString(">")
    }

    def time(s: SparkSession, text: String): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        s.sql(text).collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    // CBO OFF first (no stats exist yet either way)
    val off = session(cbo = false)
    val offRes = queries.map { q =>
      val t = textOf(q)
      val shape = joinShape(off, t)
      val sec = time(off, t)
      System.err.println(f"[cbo] $q off: $sec%.2f s [$shape]")
      q -> (sec, shape)
    }.toMap

    // ANALYZE every ingested table (all columns: NDVs for any join key)
    store.tables.foreach { t =>
      val n = store.analyzeTable(t)
      System.err.println(s"[cbo] analyzed $t (rows=$n)")
    }

    val on = session(cbo = true)
    val onRes = queries.map { q =>
      val t = textOf(q)
      val shape = joinShape(on, t)
      val sec = time(on, t)
      System.err.println(f"[cbo] $q on:  $sec%.2f s [$shape]")
      q -> (sec, shape)
    }.toMap

    val parts = queries.map { q =>
      val (o, os) = offRes(q)
      val (n, ns) = onRes(q)
      f""""$q":{"off":$o%.2f,"on":$n%.2f,"reordered":${os != ns}}"""
    }
    println(s"""{"metric":"cbo","queries":{${parts.mkString(",")}}}""")
    outer.stop()
  }
}
