package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized aggregates: a grouped COUNT/SUM table that
  * refreshes from the SOURCE table's snapshot delta instead of a full
  * rescan — the materialized-view-maintenance face of
  * [[TableStore.readIncremental]]. At 100 TB the difference is the whole
  * point: a full refresh rescans the table, an incremental refresh
  * scans only the files appended since the last refresh (metadata-
  * planned), then folds the delta into the (group-count-sized) view
  * with one rewrite of the small view table.
  *
  * Correctness: the running SUM is kept as an exact DECIMAL inside the
  * view table, so incremental folding re-associates exactly and the
  * refreshed view is bit-identical to a from-scratch aggregate at any
  * refresh cadence. The source watermark (last folded snapshot version)
  * rides in the view's own commit operation tag (`matv:<version>`), so
  * the view is self-describing and refresh is idempotent — a re-run at
  * the same source version folds an empty delta. Non-append source
  * snapshots (CoW merges, compaction) make a delta unreadable; refresh
  * then falls back to a FULL recompute (still correct, and the fallback
  * is explicit in the returned mode). */
object MatView {

  /** Create the view table: a full aggregate of the source's current
    * snapshot, watermarked at that version. */
  def create(store: TableStore, source: String, view: String,
      groupCols: Seq[String], sumCol: String): Long = {
    val v = store.currentVersion(source)
    val agg = aggregate(store.read(source), groupCols, sumCol)
    store.commit(view, agg, s"matv:$v")
  }

  /** Refresh the view from the source delta. Returns
    * (source version folded, delta rows scanned, "incremental"|"full").
    * Delta size comes from manifest metadata, not a count job. */
  def refresh(store: TableStore, source: String, view: String,
      groupCols: Seq[String], sumCol: String): (Long, Long, String) = {
    val last = lastFolded(store, view)
    val cur = store.currentVersion(source)
    if (cur == last) return (cur, 0L, "incremental")
    val incremental =
      try {
        val added = store.addedFilesBetween(source, last, cur)
        Some(added.map(_.rowCount).sum)
      } catch { case _: IllegalArgumentException => None }
    incremental match {
      case Some(deltaRows) =>
        val delta = aggregate(
          store.readIncremental(source, last, cur), groupCols, sumCol)
        val folded = store.read(view).unionByName(delta)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"),
            sum(col("sum_val")).cast(org.apache.spark.sql.types
              .DecimalType(38, 2)).as("sum_val"))
        store.commit(view, folded, s"matv:$cur")
        (cur, deltaRows, "incremental")
      case None => // non-append source history: full recompute
        val agg = aggregate(store.read(source), groupCols, sumCol)
        store.commit(view, agg, s"matv:$cur")
        (cur, store.manifests(source).maxBy(_.version).rowCount, "full")
    }
  }

  /** The view as (groupCols..., cnt, sum_val DOUBLE) for consumption. */
  def read(store: TableStore, view: String): DataFrame = {
    val df = store.read(view)
    df.withColumn("sum_val", col("sum_val").cast("double"))
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String],
      sumCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(sumCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2)).as("sum_val"))

  private def lastFolded(store: TableStore, view: String): Long =
    store.manifests(view).sortBy(-_.version)
      .flatMap(m => Option(m.operation).filter(_.startsWith("matv:"))
        .map(_.stripPrefix("matv:").toLong))
      .headOption.getOrElse(
        throw new IllegalStateException(s"$view is not a materialized view"))
}
