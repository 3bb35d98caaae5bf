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
    val iv = store.commit(index, postings, "create_index")
    store.setWriteOrder(index, Seq("token"))
    store.createTag(index, s"idxwm-$v", iv)
    v
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
    val last = store.tags(index).map(_._1)
      .filter(_.startsWith("idxwm-")).map(_.stripPrefix("idxwm-").toLong)
      .maxOption.getOrElse(
        throw new IllegalStateException(s"$index is not an index table"))
    val cur = store.currentVersion(source)
    if (cur == last) return (cur, 0L, "incremental")
    val delta =
      try {
        val added = store.addedFilesBetween(source, last, cur)
        Some((store.readIncremental(source, last, cur),
          added.map(_.rowCount).sum))
      } catch { case _: IllegalArgumentException => None }
    val (mode, rows, iv) = delta match {
      case Some((df, n)) =>
        ("incremental", n, store.append(index, buildIndex(df, idCol, textCol)))
      case None =>
        val full = buildIndex(store.read(source), idCol, textCol)
          .repartitionByRange(8, col("token")).sortWithinPartitions("token")
        ("full", store.manifests(source).maxBy(_.version).rowCount,
          store.commit(index, full, "rebuild_index"))
    }
    store.createTag(index, s"idxwm-$cur", iv)
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
