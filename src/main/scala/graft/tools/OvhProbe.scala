package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone replica of Bench's snapshot-overhead probe (driver-side
  * diagnostic only), with optional session-aging reproductions:
  * arg2 = number of synthetic catalog confs to register, arg3 = number
  * of curation-style commit/merge/rollback churn rounds to run first.
  * Built to chase the r8 finding: the graft-side probe degrading ~12×
  * after a 2 h bench while raw parquet stayed flat. */
object OvhProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCats = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val churn = args.drop(2).headOption.map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    (1 to nCats).foreach { i =>
      spark.conf.set(s"spark.sql.catalog.fake$i",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.fake$i.warehouse", s"/tmp/fake$i")
    }
    if (churn > 0) {
      import org.apache.spark.sql.functions._
      val wh = java.nio.file.Files.createTempDirectory("graft_churn").toString
      val store = new graft.core.TableStore(spark, wh)
      val base = spark.range(0, 200000)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
      store.commit("t", base, "create")
      (1 to churn).foreach { i =>
        val delta = spark.range(i * 10, i * 10 + 5000)
          .select(col("id").as("k"), (col("id") % 89).as("v"))
        graft.core.Merge.into(store, "t").using(delta).on(Seq("k"))
          .whenMatchedUpdate().whenNotMatchedInsert().run()
        store.rollbackTo("t", store.currentVersion("t") - 1)
        ()
      }
      System.err.println(s"[ovh] churn done: ${store.manifests("t").size} manifests")
    }
    val streamReps = args.drop(3).headOption.map(_.toInt).getOrElse(0)
    (1 to streamReps).foreach { _ =>
      Seq("q84_stream_interval_join", "q77_stream_dedup",
        "q68_stream_windows").foreach { q =>
        try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").count()
        catch { case e: Throwable =>
          System.err.println(s"[ovh] $q failed: ${e.getMessage}") }
        ()
      }
    }
    if (streamReps > 0) System.err.println("[ovh] streaming reps done")
    // arg5: curation-scale repro — run the MoR-focused grid at `copies`×
    // store_sales (the r8 full run's sf100 section is the last suspect
    // for the late-session probe degradation), then probe.
    val curationCopies = args.drop(4).headOption.map(_.toInt).getOrElse(0)
    if (curationCopies > 0) {
      val (wall, _) = CurationBench.runScale(spark,
        "target/tpcds-sf1/store_sales.parquet", curationCopies,
        Seq(0.001, 0.99), m => System.err.println(s"[ovh][cur] $m"),
        iters = 1, extraIters = 0, morFocus = true)
      System.err.println(f"[ovh] curation repro done in $wall%.0f s")
    }
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
    val g1 = probe(s"$cat.ns.li")
    val raw = probe(s"parquet.`$li`")
    val g2 = probe(s"$cat.ns.li")
    println(f"OVH cats=$nCats churn=$churn graft_cold=$g1%.3f raw=$raw%.3f " +
      f"graft_warm=$g2%.3f ratio_warm=${g2 / raw}%.2f")
    spark.stop()
  }
}
