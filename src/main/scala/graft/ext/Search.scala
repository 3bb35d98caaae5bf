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
  private def foldedWatermark(store: TableStore, index: String): Long =
    watermarkOf(store.manifests(index), store, index)

  private def watermarkOf(ms: Seq[TableStore.Manifest], store: TableStore,
      index: String): Long = {
    val opWm = ms.flatMap(m =>
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
    // Every attempt's commit is pinned (via appendOnce/commit requireBase)
    // to the INDEX snapshot version its watermark was read from, so ANY
    // rival index commit between the watermark read and this fold's CAS
    // trips a conflict — including a rival refresh that committed before
    // our manifest read would otherwise have been re-read (the r6
    // advisory's double-append window). On conflict the watermark AND the
    // delta are recomputed from scratch against the new snapshot (a rival
    // may have folded a DIFFERENT source version; reusing precomputed
    // postings could overlap its range). Bounded: unrelated commit storms
    // surface as an error instead of looping forever.
    val maxAttempts = 5
    var attempt = 0
    while (true) {
      val ms = store.manifests(index)
      val idxBase = ms.map(_.version).max
      val last = watermarkOf(ms, store, index)
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
      try {
        val (mode, rows, iv) = delta match {
          case Some((df, n)) =>
            val postings = buildIndex(df, idCol, textCol)
            ("incremental", n, store.appendOnce(index, postings,
              s"refresh_index wm=$cur", requireBase = idxBase))
          case None =>
            // The full rebuild pins too: an unpinned replace racing a
            // rival fold of a NEWER source version would drop that fold's
            // postings while the op-watermark history still claims them.
            val full = buildIndex(store.read(source), idCol, textCol)
              .repartitionByRange(8, col("token")).sortWithinPartitions("token")
            ("full", store.manifests(source).maxBy(_.version).rowCount,
              store.commit(index, full, s"rebuild_index wm=$cur",
                baseVersion = idxBase))
        }
        // Tag is cache only: losing the race (another refresh already
        // folded cur and tagged it) or crashing before this line never
        // loses the watermark — it is inside the iv commit above.
        try store.createTag(index, s"idxwm-$cur", iv)
        catch { case _: TableStore.CommitConflictException => () }
        return (cur, rows, mode)
      } catch {
        case _: TableStore.CommitConflictException =>
          attempt += 1
          if (attempt >= maxAttempts)
            throw new IllegalStateException(
              s"refreshIndex($index): $maxAttempts consecutive commit " +
                "conflicts — a writer storm on the index table; re-run")
      }
    }
    throw new IllegalStateException("unreachable")
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

  /** Disjunctive (OR) BM25-style top-k over the index — the standard
    * relevance ranking a curation pipeline uses to pull exemplars.
    *
    * Engine-portable determinism (the same trick as the fixed-point
    * k-means centroids): the classic BM25 idf `ln((N-df+0.5)/(df+0.5)+1)`
    * is replaced by its exact RATIONAL argument `(N-df+0.5)/(df+0.5)` —
    * `ln` is monotone, so for a single-term query the ranking is
    * identical, and libm's `ln` is not correctly rounded across engines
    * while IEEE +,*,/ are. Every double op here is written in one fixed
    * association order, and the per-document score sums its per-term
    * partials in EXPLICIT term order (one conditional aggregate per
    * term, then a fixed-order chain of additions) — so any engine
    * replays scores bit-for-bit. k1/b are the standard 1.2/0.75.
    *
    * Scale shape: postings for the query terms only (a manifest-level
    * file skip on the token-clustered index), document lengths from one
    * reusable aggregate of the index, term df broadcast. */
  def bm25TopK(index: DataFrame, idCol: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val distinct = terms.distinct
    require(distinct.nonEmpty, "need at least one term")
    val dl = index.groupBy(col(idCol))
      .agg(sum(col("tf")).as("__dl"))
    val corpus = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__tot"))
    // one pass over the term postings feeds BOTH df and scoring (df is a
    // tiny reaggregation of the already-filtered, term-count-bounded set)
    val postings = index.filter(col("token").isin(distinct.map(t => t: Any): _*))
    val dft = postings.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("__df"))
    val scored = postings
      .join(broadcast(dft), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .withColumn("__avgdl",
        col("__tot").cast("double") / col("__n").cast("double"))
      .withColumn("__idf",
        (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5)))
      .withColumn("__s",
        col("__idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) *
              (col("__dl").cast("double") / col("__avgdl")))))
    // fixed-order per-term partials: each conditional sum aggregates at
    // most ONE value (a doc holds a term once in the index), and the
    // final addition chain follows the literal term order — float
    // addition stays deterministic at any parallelism
    val partials = distinct.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("__s"))).as(s"__p$i")
    } :+ max(col("__dl")).as("__dl") // constant per doc — rides the agg
    val perDoc = scored.groupBy(col(idCol))
      .agg(partials.head, partials.tail: _*)
    val score = distinct.indices
      .map(i => coalesce(col(s"__p$i"), lit(0.0)))
      .reduce(_ + _)
    perDoc.select(col(idCol), score.as("score"), col("__dl").as("doc_len"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion of N independently-ranked candidate lists —
    * the standard way a retrieval pipeline combines lexical (BM25) and
    * vector (ANN) arms without comparable score scales: each arm
    * contributes `1/(rrfK + rank)` and the fused score is their sum
    * (Cormack & Clarke's RRF, rrfK=60 by convention).
    *
    * Every input must carry (`idCol`, `rankCol`) with ranks that are a
    * dense 1-based total order (row_number over the arm's own score with
    * an id tie-break). Determinism: ranks are integers, each contribution
    * is a single IEEE division, and contributions are summed in the
    * literal arm order — so any engine replays fused scores bit-for-bit.
    * Cross-arm ties (e.g. rank i in arm 0 only vs rank i in arm 1 only
    * fuse to the same score) break by ascending id.
    *
    * Scale shape: the arms are already top-k' lists (a few hundred rows),
    * so the fusion is a driver-scale full-outer-join chain — the heavy
    * lifting stays in the arms, which keep their own scale paths (BM25's
    * manifest file-skip, ANN's IVF probe). */
  def rrfFuse(arms: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    require(arms.nonEmpty, "need at least one ranked arm")
    require(rrfK >= 0, "rrfK must be non-negative")
    val named = arms.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$i"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = named.indices
      .map(i => coalesce(
        lit(1.0) / (lit(rrfK.toDouble) + col(s"rank_$i").cast("double")),
        lit(0.0)))
      .reduce(_ + _)
    joined.select(
        col(idCol) +: named.indices.map(i => col(s"rank_$i")) :+
          score.as("rrf") : _*)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
