package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone replica of Bench's snapshot-overhead probe (driver-side
  * diagnostic only), with optional synthetic session aging. */
object OvhProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCats = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // synthetic aging: register many catalogs the way per-fixture
    // staging warehouses do over a long bench
    (1 to nCats).foreach { i =>
      spark.conf.set(s"spark.sql.catalog.fake$i",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.fake$i.warehouse", s"/tmp/fake$i")
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
    println(f"OVH cats=$nCats graft_cold=$g1%.3f raw=$raw%.3f graft_warm=$g2%.3f ratio_warm=${g2 / raw}%.2f")
    spark.stop()
  }
}
