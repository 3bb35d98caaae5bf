package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: inspect whether dynamic pruning fires on a GraftCatalog star
  * join (not part of the driver contract). */
object ProfileDpp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("dpp").toString
    val store = new graft.core.TableStore(spark, wh)
    spark.conf.set("spark.sql.catalog.dpp", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dpp.warehouse", wh)
    store.commit("fact",
      (1L to 10000L).map(i => (i % 100, i, s"p$i")).toDF("k", "seq", "payload")
        .repartitionByRange(8, col("k")), "create")
    store.commit("dim",
      (0L to 99L).map(i => (i, if (i < 3) "hot" else "cold")).toDF("k", "tag"), "create")
    val df = spark.sql(
      """SELECT count(*) AS n FROM dpp.ns.fact f
        |JOIN dpp.ns.dim d ON f.k = d.k WHERE d.tag = 'hot'""".stripMargin)
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString.take(4000))
    println("=== n = " + df.collect().head.getLong(0))
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
