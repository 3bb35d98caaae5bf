package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate the sf10 cdc_mor p=0.99 cell. */
object ProbeCdc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "target/tpcds-sf1/store_sales.parquet"
    val wh = java.nio.file.Files.createTempDirectory("graft_probe_cdc").toString
    val store = new graft.core.TableStore(spark, wh)
    val baseDir = java.nio.file.Files.createTempDirectory("graft_probe_base").toString
    CurationBench.baseFrame(spark, src, 10).write.mode("overwrite").parquet(baseDir)
    val base = spark.read.parquet(baseDir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    t("bulk")(graft.curation.Scd2.bulkInsert(store, "t", base))
    var baseV = store.currentVersion("t")
    val delta = CurationBench.updatesAt(base, 0.99)
      .withColumn("_deleted", abs(hash(col("pk"))) % 10 === 0)
    t("warmup cdc p=0.001")(store.applyCdcMoR("t",
      CurationBench.updatesAt(base, 0.001)
        .withColumn("_deleted", abs(hash(col("pk"))) % 10 === 0),
      Seq("pk"), "_deleted"))
    baseV = store.rollbackTo("t", baseV)
    store.expireSnapshots("t", keepLast = 1)
    // replicate the grid's p=0.99 cell order: big CoW rewrite + expire
    // first (evicts the materialized base from page cache), then MoR
    t("scd2_simple p=0.99")(graft.curation.Scd2.scd2Simple(store, "t",
      CurationBench.updatesAt(base, 0.99)))
    baseV = store.rollbackTo("t", baseV)
    store.expireSnapshots("t", keepLast = 1)
    (1 to 2).foreach { i =>
      t(s"upsert p=0.99 #$i")(store.upsertMoR("t",
        CurationBench.updatesAt(base, 0.99), Seq("pk")))
      baseV = store.rollbackTo("t", baseV)
      store.expireSnapshots("t", keepLast = 1)
    }
    (1 to 3).foreach { i =>
      t(s"cdc p=0.99 #$i")(store.applyCdcMoR("t", delta, Seq("pk"), "_deleted"))
      baseV = store.rollbackTo("t", baseV)
      store.expireSnapshots("t", keepLast = 1)
    }
    TpcdsIngest.deleteRecursively(java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
