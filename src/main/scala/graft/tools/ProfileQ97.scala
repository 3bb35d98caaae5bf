package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer for q97's setup/join/aggregate pipeline: the
  * ProfileQuery job log showed ~3-5 s of q97 wall OUTSIDE any Spark job;
  * this brackets each phase to find the driver-side cost. */
object ProfileQ97 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[q97] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup pass
    graft.SparkEntry.queries("q97_spj_join")(spark, "/root/testdata/sf0.001").count()
    (1 to 2).foreach { i =>
      println(s"[q97] ---- rep $i ----")
      val o = graft.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val l = graft.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val wh = java.nio.file.Files.createTempDirectory("graft_q97p").toString
      val store = new graft.core.TableStore(spark, wh)
      t("commitBucketed orders")(store.commitBucketed("ord", o, "o_orderkey", 32, "create"))
      t("commitBucketed lineitem")(store.commitBucketed("li", l, "l_orderkey", 32, "create"))
      val cat = s"gq97p${System.nanoTime()}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      val confs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = t("sql analyze")(spark.sql(
        s"SELECT o.o_orderstatus, l.l_extendedprice FROM $cat.ns.ord o " +
        s"JOIN $cat.ns.li l ON o.o_orderkey = l.l_orderkey"))
      t("executedPlan")(joined.queryExecution.executedPlan)
      val agg = joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      t("localCheckpoint")(agg.localCheckpoint(true))
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    }
    spark.stop()
  }
}
