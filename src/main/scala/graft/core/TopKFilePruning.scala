package graft.core

import graft.core.TableStore.{ColStats, FileEntry}

/** Manifest-level file pruning for pushed LIMIT and ORDER BY ... LIMIT
  * (top-k) — the scan-planning answer to "LIMIT 100 over a million files
  * should read one file".
  *
  * LIMIT: with no row-level reduction inside the scan (no pushed filters,
  * no merge-on-read deletes — the caller guarantees both), any subset of
  * files covering ≥ k rows yields a valid LIMIT k; the greedy
  * fewest-files cover is chosen.
  *
  * Top-k: a file can be skipped when ≥ k WITNESS rows exist in kept files,
  * each sorting strictly before every row of the skipped file on the
  * LEADING sort key (strictness makes the rule safe under additional
  * tie-breaking sort columns). Witnesses are established against a single
  * threshold T over the per-file footer min/max — every witness file's
  * directional upper edge is ≤ T, so witness files always prune-survive
  * themselves and the skip decisions are JOINTLY sound (no two files can
  * mutually justify skipping each other, the failure mode of pairwise
  * rules on identical files).
  *
  * Nulls are the subtlety: under NULLS FIRST every null row outranks every
  * value the min/max describe, so (a) a file is threshold-skippable only
  * when its footer proves ZERO nulls in the sort column, (b) known null
  * counts in other files count as witnesses unconditionally, and (c) when
  * known nulls alone cover k — top-k is all nulls — a minimal null-cover
  * subset suffices, but ONLY for single-key orderings (a second sort
  * column makes specific null rows non-interchangeable). Under NULLS LAST
  * nulls trail everything, so only provably-non-null rows witness, and
  * all-null files are always skippable once any threshold works.
  *
  * Bails (returns None = keep every file) whenever exactness is not
  * provable: a file with rows but no recorded count, no stats at all
  * (unknown provenance), mixed stat kinds, a sort column that ever went
  * through DROP COLUMN (stale pre-drop stats), or floating-point columns
  * with absent stats (parquet drops float stats when a NaN was seen, so
  * absence does NOT mean all-null there). */
object TopKFilePruning {

  /** Greedy fewest-files cover of `k` rows, or None when pruning is
    * impossible (unknown row counts) or useless (total ≤ k). */
  def forLimit(files: Seq[FileEntry], k: Long): Option[Seq[FileEntry]] = {
    if (k <= 0L) return None
    if (files.exists(f => f.rowCount <= 0L && f.sizeBytes > 0L)) return None
    if (files.map(_.rowCount).sum <= k) return None
    val ordered = files.sortBy(f => (-f.rowCount, f.path))
    val out = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    var cum = 0L
    val it = ordered.iterator
    while (cum < k && it.hasNext) { val f = it.next(); out += f; cum += f.rowCount }
    if (out.size < files.size) Some(out.toSeq) else None
  }

  /** Files that must be read for ORDER BY col [ASC|DESC] [NULLS
    * FIRST|LAST] LIMIT k, or None to keep all. `singleKey` = the ordering
    * has no tie-breaking columns after `col` (enables the null-cover
    * shortcut). */
  def forTopK(files: Seq[FileEntry], col: String, asc: Boolean,
      nullsFirst: Boolean, k: Long, droppedColumns: Set[String],
      singleKey: Boolean): Option[Seq[FileEntry]] = {
    if (k <= 0L || droppedColumns.contains(col)) return None
    if (files.exists(f => f.rowCount <= 0L && f.sizeBytes > 0L)) return None
    if (files.exists(f => f.rowCount > 0L && f.stats.isEmpty)) return None
    val entries: Seq[(FileEntry, Option[ColStats])] =
      files.map(f => (f, f.stats.get(col)))
    val kinds = entries.flatMap(_._2).map(_.kind).distinct
    if (kinds.size != 1) return None // absent everywhere, or incomparable
    val kind = kinds.head
    val floating = kind == "double"
    // float column with any stats-less file: absence may hide NaNs → the
    // conservative story below ("missing entry = all nulls") is unsound
    if (floating && entries.exists { case (f, e) => e.isEmpty && f.rowCount > 0L })
      return None
    // a NaN bound means total-order footer stats from an old writer —
    // NaN placement breaks every comparison below
    if (floating && entries.exists(_._2.exists(s =>
        s.min.toDouble.isNaN || s.max.toDouble.isNaN)))
      return None

    def cmp(a: String, b: String): Int =
      if (kind == "long") java.lang.Long.compare(a.toLong, b.toLong)
      // + 0.0 collapses -0.0 to +0.0: Spark's ordering deems them EQUAL,
      // so a strict separation claimed across the ±0.0 boundary would be
      // a tie Spark may break the other way
      else if (kind == "double")
        java.lang.Double.compare(a.toDouble + 0.0, b.toDouble + 0.0)
      else if (kind.startsWith("dec"))
        new java.math.BigInteger(a).compareTo(new java.math.BigInteger(b))
      else TableStore.utf8Cmp(a, b)
    // directional compare: "a sorts at or before b" in the query's order
    def cmpDir(a: String, b: String): Int = if (asc) cmp(a, b) else -cmp(a, b)
    // directional edges: every non-null row of f sorts at or after lo(f)
    // and at or before hi(f)
    def lo(s: ColStats): String = if (asc) s.min else s.max
    def hi(s: ColStats): String = if (asc) s.max else s.min
    // known null count; a missing entry on a non-float column means every
    // row is null (parquet omits footer min/max exactly then)
    def nulls(f: FileEntry, e: Option[ColStats]): Long = e match {
      case Some(s) => s.nulls
      case None => f.rowCount
    }

    // ---- null-cover shortcut (NULLS FIRST, single-key): top-k is all
    // nulls once known nulls cover k — keep a minimal null cover.
    if (nullsFirst && singleKey) {
      val known = entries.map { case (f, e) => (f, math.max(nulls(f, e), 0L)) }
      if (known.map(_._2).sum >= k) {
        val ordered = known.sortBy { case (f, n) => (-n, f.path) }
        val keep = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
        var cum = 0L
        val it = ordered.iterator
        while (cum < k && it.hasNext) {
          val (f, n) = it.next(); keep += f; cum += n
        }
        return if (keep.size < files.size) Some(keep.toSeq) else None
      }
    }

    // ---- threshold rule: find the smallest T (over witness-file upper
    // edges) with ≥ k witnesses, then skip files whose lower edge sorts
    // strictly after T.
    val candidates = entries.flatMap(_._2).map(hi).distinct
      .sortWith(cmpDir(_, _) < 0)
    def witnessesAt(t: String): Long = entries.iterator.map { case (f, e) =>
      e match {
        case Some(s) if cmpDir(hi(s), t) <= 0 =>
          if (nullsFirst) f.rowCount // nulls sort first: every row counts
          else { val n = s.nulls; if (n < 0L) 0L else f.rowCount - n }
        case _ =>
          // non-qualifying (or all-null) file: only its nulls can witness,
          // and only when nulls sort first; unknown counts as zero
          if (nullsFirst) math.max(nulls(f, e), 0L) else 0L
      }
    }.sum
    val threshold = candidates.find(witnessesAt(_) >= k).getOrElse(return None)
    val keep = entries.collect {
      case (f, None) if nullsFirst => f // all-null file IS the top under NULLS FIRST
      case (f, Some(s)) if cmpDir(lo(s), threshold) <= 0 => f
      // NULLS FIRST: a file whose null count is unknown or nonzero may
      // hold top-ranked null rows — never skip it on value bounds alone
      case (f, Some(s)) if nullsFirst && s.nulls != 0L => f
    }
    if (keep.size < files.size) Some(keep) else None
  }
}
