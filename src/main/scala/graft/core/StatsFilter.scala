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
      // LIKE 'p%': matching rows live in [p, succ(p)) — the file overlaps
      // iff max >= p and min < succ(p). succ is only derivable for ASCII
      // prefixes (incrementing arbitrary UTF-16 units can cross surrogate
      // ranges and break the UTF-8 byte order the stats compare in); a
      // non-ASCII prefix keeps the max-side bound only — conservative.
      case StringStartsWith(c, prefix) =>
        prefix.isEmpty || (ge(c, prefix, strict = false) &&
          asciiSuccessor(prefix).forall(s => le(c, s, strict = true)))
      case _ => true // IsNull, StringContains, Not, ... — no stats story
    }
  }

  /** Smallest ASCII string strictly greater than every string with prefix
    * `p`: the rightmost incrementable char bumped, the tail dropped. None
    * when `p` has a non-ASCII char (or is all 0x7F). */
  private[graft] def asciiSuccessor(p: String): Option[String] = {
    if (!p.forall(_ < 0x80)) None
    else {
      val i = p.lastIndexWhere(_ < 0x7f)
      if (i < 0) None
      else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
    }
  }
}
