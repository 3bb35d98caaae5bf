package graft.tools

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.core.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared TPC-DS corpus ingest: loads every dsdgen parquet table into a
  * TableStore, partitioning the 7 fact tables exactly as the reference's
  * benchmark metadata declares (reference/src/data_derivation/
  * query_performance/utils/metadata/&lt;table&gt;.json `"partitions"` — the
  * spec the sf3000 Athena/Hive runs used,
  * utils/create_partitioned_hive_tpcds.py:49-105: each fact table on its
  * date surrogate key).
  *
  * Fact rows are clustered on the partition column before the write
  * (`repartition(dateSk)`) so each date partition lands as ONE file
  * instead of one per upstream task — at sf3000 that is the difference
  * between ~1 file and ~#tasks files per day, and it is what makes the
  * per-file min=max partition stats maximally selective for runtime
  * pruning. */
object TpcdsIngest {

  private val metadataDir = Paths.get(
    "/root/reference/src/data_derivation/query_performance/utils/metadata")

  /** table → the reference's declared partition columns (empty = none). */
  def partitionsOf(table: String): Seq[String] = {
    val f = metadataDir.resolve(s"$table.json")
    if (!Files.isRegularFile(f)) Seq.empty
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(f))
      val p = node.get("partitions")
      if (p == null) Seq.empty
      else p.elements().asScala.map(_.asText()).toSeq
    }
  }

  /** Depth-first delete. `Files.list` streams are CLOSED per directory —
    * the stream holds the directory fd, and an unclosed recursive walk
    * over a partitioned warehouse (thousands of partition dirs) exhausts
    * the process fd limit, poisoning every open() that follows. */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  /** Ingest every `*.parquet` table under `dataDir`. With `partitioned`
    * (the reference's benchmark layout) the 7 fact tables go through
    * `commitPartitioned` on their declared date sk. */
  def ingest(spark: SparkSession, store: TableStore, dataDir: Path,
      partitioned: Boolean = true, log: String => Unit = _ => ()): Unit =
    Files.list(dataDir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      .foreach { p =>
        val name = p.getFileName.toString.stripSuffix(".parquet")
        val df = spark.read.parquet(p.toString)
        val pcols = if (partitioned) partitionsOf(name) else Seq.empty
        val t0 = System.nanoTime()
        // Explicit partition count: a plain repartition(cols) lets AQE
        // coalesce the tiny shuffle to ONE task, which then writes every
        // partition directory sequentially (measured 21 s vs 6 s for
        // catalog_sales at sf0.01).
        val par = spark.sparkContext.defaultParallelism
        if (pcols.isEmpty) store.commit(name, df, "ctas")
        else store.commitPartitioned(name,
          df.repartition(par, pcols.map(col): _*), pcols, "ctas")
        log(f"ingested $name in ${(System.nanoTime() - t0) / 1e9}%.1f s" +
          (if (pcols.nonEmpty) s" (partitioned by ${pcols.mkString(",")})" else ""))
      }
}
