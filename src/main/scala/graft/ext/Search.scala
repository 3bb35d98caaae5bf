package graft.ext

import graft.core.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus search primitives: a relational inverted index and conjunctive
  * top-k retrieval over it — the "find the documents about X" face of a
  * curation pipeline (inspecting what a filter kept, pulling exemplars
  * for eval, spot-checking dedup clusters).
  *
  * Scale shape: the index build is one explode + one hash aggregate
  * (linear in corpus tokens, the same cost class as token stats); a
  * query is a scan of the index FILTERED BY TERM — and because the
  * index is a table, storing it sorted/write-ordered by token turns
  * that filter into manifest-level file skipping: a 3-term query over a
  * 100 TB corpus's index touches only the files holding those terms'
  * postings. Scoring is integer term frequency (deterministic across
  * engines); ties break by document id, so top-k is a total order. */
object Search {

  /** Inverted index rows: (token, idCol, tf). */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Materialize the index as a TABLE, range-clustered by token (per-file
    * token ranges are disjoint, so a term lookup is a manifest-level file
    * skip) with a standing write order on `token` — every future
    * incremental append stays clustered. The source watermark rides as an
    * immutable tag `idxwm-<sourceVersion>` on the index table. */
  def createIndexTable(store: TableStore, source: String, index: String,
      idCol: String, textCol: String, buckets: Int = 8): Long = {
    val v = store.currentVersion(source)
    val postings = buildIndex(store.read(source), idCol, textCol)
      .repartitionByRange(buckets, col("token"))
      .sortWithinPartitions("token")
    val iv = store.commit(index, postings, s"create_index wm=$v")
    store.setWriteOrder(index, Seq("token"))
    store.createTag(index, s"idxwm-$v", iv)
    v
  }

  /** The source watermark the index has folded up to. The DURABLE record
    * is the `wm=<v>` token inside each index commit's operation string —
    * written in the SAME manifest CAS as the postings themselves, so a
    * fold is never applied without its watermark advancing. The
    * `idxwm-<v>` tags are a convenience cache (SQL-visible via `$refs`)
    * that may lag after a crash between commit and tag; taking the max
    * over both sources makes a lagging tag harmless. */
  private def foldedWatermark(store: TableStore, index: String): Long = {
    val opWm = store.manifests(index).flatMap(m =>
      m.operation.split("\\s+").collectFirst {
        case s if s.startsWith("wm=") => s.stripPrefix("wm=").toLong
      })
    val tagWm = store.tags(index).map(_._1)
      .filter(_.startsWith("idxwm-")).map(_.stripPrefix("idxwm-").toLong)
    (opWm ++ tagWm).maxOption.getOrElse(
      throw new IllegalStateException(s"$index is not an index table"))
  }

  /** Incremental index maintenance — the NON-aggregate derived-table
    * counterpart of [[graft.core.MatView]]: postings of documents
    * appended since the last watermark are built from the metadata-
    * planned delta scan and APPENDED (new documents' postings are
    * disjoint rows from old ones, so no fold is needed; the standing
    * write order keeps them token-clustered). Cost is O(delta) at any
    * index size. A non-append source history (CoW merge, compaction)
    * makes the delta unreadable — refresh then falls back to a full
    * rebuild, explicit in the returned mode. Returns (source version
    * folded, delta rows scanned, "incremental"|"full"). */
  def refreshIndex(store: TableStore, source: String, index: String,
      idCol: String, textCol: String): (Long, Long, String) = {
    val last = foldedWatermark(store, index)
    val cur = store.currentVersion(source)
    // >= — not == — so a refresh replayed after a crash (or racing a
    // faster concurrent refresh) sees the commit-recorded watermark and
    // becomes a no-op instead of re-appending the same delta's postings.
    if (cur <= last) return (cur, 0L, "incremental")
    val delta =
      try {
        val added = store.addedFilesBetween(source, last, cur)
        Some((store.readIncremental(source, last, cur),
          added.map(_.rowCount).sum))
      } catch { case _: IllegalArgumentException => None }
    val (mode, rows, iv) = delta match {
      case Some((df, n)) =>
        ("incremental", n, store.append(index,
          buildIndex(df, idCol, textCol), s"refresh_index wm=$cur"))
      case None =>
        val full = buildIndex(store.read(source), idCol, textCol)
          .repartitionByRange(8, col("token")).sortWithinPartitions("token")
        ("full", store.manifests(source).maxBy(_.version).rowCount,
          store.commit(index, full, s"rebuild_index wm=$cur"))
    }
    // Tag is cache only: losing the race (another refresh already folded
    // cur and tagged it) or crashing before this line never loses the
    // watermark — it is inside the iv commit above.
    try store.createTag(index, s"idxwm-$cur", iv)
    catch { case _: TableStore.CommitConflictException => () }
    (cur, rows, mode)
  }

  /** Conjunctive (AND) top-k: documents containing EVERY query term,
    * scored by summed term frequency, ties broken by ascending id. */
  def searchAll(index: DataFrame, idCol: String, terms: Seq[String],
      k: Int): DataFrame = {
    val distinct = terms.distinct
    require(distinct.nonEmpty, "need at least one term")
    index.filter(col("token").isin(distinct.map(t => t: Any): _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("token")).as("__nt"),
        sum(col("tf")).as("score"))
      .filter(col("__nt") === distinct.size)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
