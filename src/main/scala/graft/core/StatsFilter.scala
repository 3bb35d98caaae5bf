package graft.core

import graft.core.TableStore.ColStats
import org.apache.spark.sql.sources._

/** Manifest-stat evaluation of data-source filters — the shared
  * file-pruning brain of catalog reads and row-level operations. */
object StatsFilter {

  /** Could a file with these stats contain a row matching the filter?
    * Conservative: anything not provably disjoint is a match. */
  def fileMayMatch(stats: Map[String, ColStats], f: Filter): Boolean = {
    def ge(c: String, v: Any, strict: Boolean): Boolean = // max {>,>=} v ?
      stats.get(c).flatMap(s => TableStore.cmpStat(s.max, s.kind, v))
        .forall(cc => if (strict) cc > 0 else cc >= 0)
    def le(c: String, v: Any, strict: Boolean): Boolean = // min {<,<=} v ?
      stats.get(c).flatMap(s => TableStore.cmpStat(s.min, s.kind, v))
        .forall(cc => if (strict) cc < 0 else cc <= 0)
    def eq(c: String, v: Any): Boolean = ge(c, v, strict = false) && le(c, v, strict = false)
    f match {
      case EqualTo(c, v) => eq(c, v)
      case In(c, vs) => vs.exists(v => eq(c, v))
      case GreaterThan(c, v) => ge(c, v, strict = true)
      case GreaterThanOrEqual(c, v) => ge(c, v, strict = false)
      case LessThan(c, v) => le(c, v, strict = true)
      case LessThanOrEqual(c, v) => le(c, v, strict = false)
      case And(l, r) => fileMayMatch(stats, l) && fileMayMatch(stats, r)
      case Or(l, r) => fileMayMatch(stats, l) || fileMayMatch(stats, r)
      case _ => true // IsNull, StringContains, Not, ... — no stats story
    }
  }
}
