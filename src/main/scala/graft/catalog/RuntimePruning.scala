package graft.catalog

import graft.core.TableStore
import graft.core.TableStore.{ColStats, FileEntry}
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types.StructType

/** Shared runtime file-pruning machinery for scans implementing
  * `SupportsRuntimeV2Filtering` — used by both the row-level-operation
  * scan (SQL MERGE/UPDATE/DELETE group filtering) and the plain read scan
  * (dynamic fact-file pruning in star joins, the reference's headline
  * partitioned-fact scenario — docs/README.md:326-329). */
object RuntimePruning {

  /** The single column a snapshot's files are best separated on.
    *
    * Exactly ONE attribute is ever advertised: Spark packs multiple
    * filter attributes into a struct-IN that cannot translate to a V2
    * predicate (the runtime filter silently disappears), so we pick the
    * column with the highest fraction of non-overlapping file-range pairs
    * — the clustered/partition column is the only one pruning can win on
    * anyway. None when no column separates files (callers then skip the
    * runtime-filter subquery entirely). */
  def bestPruningColumn(allFiles: Seq[FileEntry], schema: StructType)
      : Option[String] = {
    val files = if (allFiles.size <= 512) allFiles else allFiles.take(512)
    if (files.size < 2) None
    else {
      val cols = files.flatMap(_.stats.keys).distinct
        .filter(c => schema.fieldNames.contains(c))
      val scored = cols.flatMap { c =>
        val ranges = files.flatMap(_.stats.get(c))
        if (ranges.size < files.size) None // only useful with full stats
        else {
          val pairs = for {
            i <- ranges.indices; j <- (i + 1) until ranges.size
          } yield {
            val (a, b) = (ranges(i), ranges(j))
            val overlap =
              TableStore.cmpStat(a.max, a.kind, b.min).forall(_ >= 0) &&
                TableStore.cmpStat(b.max, b.kind, a.min).forall(_ >= 0)
            if (overlap) 0 else 1
          }
          Some(c -> pairs.sum.toDouble / pairs.size)
        }
      }
      // deterministic: best separation, schema order breaks ties
      scored.filter(_._2 >= 0.5)
        .sortBy { case (c, s) => (-s, schema.fieldIndex(c)) }
        .headOption.map(_._1)
    }
  }

  /** Extract single-column `IN (values…)` lists from runtime predicates. */
  def inListsOf(predicates: Array[Predicate]): Seq[(String, Seq[Any])] =
    predicates.toSeq.collect {
      case p if p.name() == "IN" && p.children().nonEmpty =>
        p.children().head match {
          case f: NamedReference if f.fieldNames().length == 1 =>
            val vals = p.children().tail.collect {
              case l: Literal[_] => l.value match {
                case u: org.apache.spark.unsafe.types.UTF8String => u.toString
                case other => other
              }
            }.toSeq
            Some(f.fieldNames().head -> vals)
          case _ => None
        }
    }.flatten

  /** Partition `files` into (hit, dropped) for the runtime IN-lists: a
    * file survives only if every list has a value inside the file's
    * min/max range for that column AND (for small lists) its parquet
    * bloom filter does not rule all values out. Conservative on missing
    * stats/blooms — dropping is always exact, never lossy. */
  def pruneByInLists(store: TableStore, table: String, files: Seq[FileEntry],
      inLists: Seq[(String, Seq[Any])]): (Seq[FileEntry], Seq[FileEntry]) =
    files.partition { fe =>
      inLists.forall { case (c, vals) =>
        val rangeHit = fe.stats.get(c) match {
          case None => true
          case Some(s: ColStats) => vals.exists(v =>
            TableStore.cmpStat(s.min, s.kind, v).forall(_ <= 0) &&
              TableStore.cmpStat(s.max, s.kind, v).forall(_ >= 0))
        }
        rangeHit && (vals.size > store.bloomMaxKeys ||
          store.bloomMayContain(table, fe, c, vals))
      }
    }
}
