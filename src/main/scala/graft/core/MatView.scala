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

  /** Join materialized view: the grouped aggregate of `left ⋈ right`
    * (equi-keys), watermarked at BOTH source versions
    * (`matvj:<lv>:<rv>`). */
  def createJoin(store: TableStore, left: String, right: String,
      view: String, joinKeys: Seq[String], groupCols: Seq[String],
      sumCol: String): Long = {
    val lv = store.currentVersion(left)
    val rv = store.currentVersion(right)
    val agg = aggregate(
      store.read(left).join(store.read(right), joinKeys),
      groupCols, sumCol)
    store.commit(view, agg, s"matvj:$lv:$rv")
  }

  /** Incremental refresh of a join view via the classic delta
    * decomposition `Δ(L⋈R) = ΔL⋈R_new ∪ L_old⋈ΔR` (the `ΔL⋈ΔR` corner
    * rides inside the first term because `R_new ⊇ ΔR`) — at scale the
    * two join legs each pair ONE delta side against one full side, so
    * refresh cost is O(Δ·matches), never a full L⋈R recompute. Sources
    * must be append-only since the last fold; a CoW rewrite on either
    * side falls back to a full recompute (explicit in the returned
    * mode). Returns (left version, right version, delta rows,
    * "incremental"|"full"). */
  def refreshJoin(store: TableStore, left: String, right: String,
      view: String, joinKeys: Seq[String], groupCols: Seq[String],
      sumCol: String): (Long, Long, Long, String) = {
    val (ll, lr) = lastFoldedJoin(store, view)
    val cl = store.currentVersion(left)
    val cr = store.currentVersion(right)
    if (cl == ll && cr == lr) return (cl, cr, 0L, "incremental")
    val planned =
      try {
        val dlRows = if (cl == ll) 0L
          else store.addedFilesBetween(left, ll, cl).map(_.rowCount).sum
        val drRows = if (cr == lr) 0L
          else store.addedFilesBetween(right, lr, cr).map(_.rowCount).sum
        Some((dlRows, drRows))
      } catch { case _: IllegalArgumentException => None }
    planned match {
      case Some((dlRows, drRows)) =>
        val legs = Seq.newBuilder[DataFrame]
        if (dlRows > 0)
          legs += store.readIncremental(left, ll, cl)
            .join(store.read(right), joinKeys)          // ΔL ⋈ R_new
        if (drRows > 0)
          legs += store.readVersion(left, ll)
            .join(store.readIncremental(right, lr, cr), joinKeys) // L_old ⋈ ΔR
        val parts = legs.result()
        if (parts.isEmpty) return (cl, cr, 0L, "incremental")
        val delta = aggregate(parts.reduce(_.unionByName(_)),
          groupCols, sumCol)
        val folded = store.read(view).unionByName(delta)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"),
            sum(col("sum_val")).cast(org.apache.spark.sql.types
              .DecimalType(38, 2)).as("sum_val"))
        store.commit(view, folded, s"matvj:$cl:$cr")
        (cl, cr, dlRows + drRows, "incremental")
      case None =>
        val agg = aggregate(
          store.read(left).join(store.read(right), joinKeys),
          groupCols, sumCol)
        store.commit(view, agg, s"matvj:$cl:$cr")
        (cl, cr,
          store.manifests(left).maxBy(_.version).rowCount +
            store.manifests(right).maxBy(_.version).rowCount, "full")
    }
  }

  private def lastFoldedJoin(store: TableStore, view: String): (Long, Long) =
    store.manifests(view).sortBy(-_.version)
      .flatMap(m => Option(m.operation).filter(_.startsWith("matvj:"))
        .map { op =>
          val Array(lv, rv) = op.stripPrefix("matvj:").split(":")
          (lv.toLong, rv.toLong)
        })
      .headOption.getOrElse(
        throw new IllegalStateException(s"$view is not a join view"))

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
