package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.catalog.GraftCatalog
import graft.core.TableStore
import org.apache.spark.sql.SparkSession

/** Dev tool: time the reference's literal 98-query TPC-DS corpus through
  * GraftCatalog over a dsdgen parquet dir (tools/gen_tpcds.py output).
  *
  * Mirrors the reference's benchmark protocol
  * (reference/src/data_derivation/query_performance/benchmark_functions.py:
  * 51-106 — N timed iterations per query file, per-query stats kept) on a
  * single JVM. Pair with tools/bench_tpcds_duckdb.py for the same-SQL
  * engine proxy at the same scale.
  *
  * Usage: runMain graft.tools.TpcdsTime <dataDir> [iters]
  * Prints one JSON line: {"queries":{q:sec,...},"total":sec,"failed":[...]}.
  */
object TpcdsTime {
  def main(args: Array[String]): Unit = {
    val dataDir = Paths.get(args.headOption.getOrElse("fixtures/tpcds-sf0.01"))
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val sqlDir =
      Paths.get("/root/reference/src/data_derivation/query_performance/sql")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory("tpcds-time").toString
    val store = new TableStore(spark, wh)
    Files.list(dataDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      .foreach { p =>
        val name = p.getFileName.toString.stripSuffix(".parquet")
        store.commit(name, spark.read.parquet(p.toString), "ctas")
        System.err.println(s"[tpcds-time] ingested $name")
      }

    spark.conf.set("spark.sql.catalog.graftds", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftds.warehouse", wh)
    spark.sql("USE graftds")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")

    val files = Files.list(sqlDir).iterator().asScala
      .filter(_.getFileName.toString.matches("q.*\\.sql")).toSeq
      .sortBy(_.getFileName.toString)

    def run(text: String): Unit =
      try { spark.sql(text).collect(); () }
      catch {
        // q90 divides by zero at tiny SFs (non-zero at the reference's
        // sf100+); Athena would error too — compare NULL semantics instead.
        case e: Throwable
            if Option(e.getMessage).exists(_.contains("DIVIDE_BY_ZERO")) =>
          spark.conf.set("spark.sql.ansi.enabled", "false")
          try { spark.sql(text).collect(); () }
          finally spark.conf.set("spark.sql.ansi.enabled", "true")
      }

    // one untimed pass over the whole corpus absorbs codegen/JIT
    files.foreach { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      try run(text) catch { case _: Throwable => }
    }

    var failed = List.empty[String]
    val times = files.map { p =>
      val name = p.getFileName.toString.stripSuffix(".sql")
      val text = new String(Files.readAllBytes(p), "UTF-8")
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try run(text)
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[tpcds-time] $name FAILED: ${e.getMessage.take(200)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[tpcds-time] $name min=${ts.min}%.3f mean=${ts.sum / ts.size}%.3f")
      name -> ts.min
    }
    val ok = times.filterNot { case (n, _) => failed.contains(n) }
    val qs = ok.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"queries":$qs,"total":${ok.map(_._2).sum}%.3f,"iters":$iters,"data":"$dataDir","failed":$fj}""")
    spark.stop()
  }
}
