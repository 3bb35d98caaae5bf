package graft.core

import org.apache.spark.sql.sources._

/** Pushed-filter selectivity for the planner's FIRST-stage decisions —
  * before any runtime (AQE) statistics exist. A DSv2 scan reports its
  * size through `estimateStatistics`; without this, a branch filtered to
  * 0.1% still reports full size, plans as a sort-merge join, and only
  * converts to broadcast AFTER both sides' shuffle maps have already run.
  * Here the scan scales its reported size by an estimate built from
  * SAFE-DIRECTION evidence only (the analogue of what Iceberg's
  * SparkScan does with Puffin NDVs, but skew-proof):
  *
  *  - equality / IN: bounded by ANALYZE's `maxFreq` — `sel(c = v) <=
  *    maxFreq/rows` is a THEOREM for every literal, so a skewed hot key
  *    can never be under-estimated into a catastrophic broadcast (the
  *    classic 1/NDV failure). Stats staleness is compensated by adding
  *    rows appended since the analyzed snapshot to the bound.
  *  - IS NULL: bounded by ANALYZE's null count, same staleness pad.
  *  - ranges: linear interpolation against the CURRENT manifest's exact
  *    global min/max (no staleness), floored at 5% per conjunct because
  *    interpolation assumes uniformity — an estimate, not a bound.
  *  - anything else (LIKE, NOT, unknown): contributes 1.0 — no guessing.
  *
  * Conjuncts multiply (independence — the same assumption Spark's CBO
  * makes); OR takes the bound-sum. The result only ever shrinks the
  * estimate, and AQE remains the runtime corrector in the other
  * direction. Requires no CBO flag: plain `sizeInBytes` is what
  * `JoinSelection` consults with CBO off. */
object SelectivityEstimate {

  /** Per-column evidence, already staleness-adjusted to upper bounds
    * valid for the CURRENT snapshot (see [[GraftStatsScan]] wiring). */
  case class Evidence(maxFreqBound: Long, nullBound: Long)

  /** Estimated fraction of `keptRows` surviving all `filters`.
    * `evidence` = ANALYZE bounds per column; `range` = exact global
    * (min, max) per column from the manifest, in a numeric domain shared
    * with [[literalToDouble]]. Returns 1.0 when nothing is known. */
  def estimate(filters: Seq[Filter], keptRows: Long,
      evidence: String => Option[Evidence],
      range: String => Option[(Double, Double)]): Double = {
    if (keptRows <= 0L) return 1.0
    // Two buckets, multiplied separately: `bound` conjuncts (equality /
    // IN / IS NULL backed by maxFreq / null counts) are theorems and may
    // compound arbitrarily low; `est` conjuncts (range interpolation,
    // ORs) assume uniformity, so their PRODUCT is clamped at the 5%
    // floor — two stacked range filters on clustered data must not
    // compound a terabyte branch into a broadcast.
    def isBound(f: Filter): Boolean = f match {
      case EqualTo(_, _) | EqualNullSafe(_, _) | In(_, _) | IsNull(_) => true
      case _ => false
    }
    def one(f: Filter): Double = f match {
      case EqualTo(c, _) => eqBound(c, 1)
      case EqualNullSafe(c, v) =>
        if (v == null) nullBound(c) else eqBound(c, 1)
      case In(c, vs) => eqBound(c, math.max(vs.length, 1))
      case IsNull(c) => nullBound(c)
      case GreaterThan(c, v) => rangeFrac(c, v, lower = false)
      case GreaterThanOrEqual(c, v) => rangeFrac(c, v, lower = false)
      case LessThan(c, v) => rangeFrac(c, v, lower = true)
      case LessThanOrEqual(c, v) => rangeFrac(c, v, lower = true)
      case And(l, r) => one(l) * one(r)
      case Or(l, r) => math.min(1.0, one(l) + one(r))
      case _ => 1.0 // IsNotNull ~1; LIKE/Not/unknown: no evidence
    }
    def eqBound(c: String, k: Int): Double = evidence(c) match {
      case Some(e) if e.maxFreqBound > 0 =>
        math.min(1.0, k.toDouble * e.maxFreqBound / keptRows)
      case _ => 1.0
    }
    def nullBound(c: String): Double = evidence(c) match {
      case Some(e) => math.min(1.0, e.nullBound.toDouble / keptRows)
      case _ => 1.0
    }
    def rangeFrac(c: String, v: Any, lower: Boolean): Double =
      (range(c), literalToDouble(v)) match {
        case (Some((mn, mx)), Some(d)) if mx > mn =>
          val frac = if (lower) (d - mn) / (mx - mn) else (mx - d) / (mx - mn)
          math.max(0.0, math.min(1.0, frac))
        case _ => 1.0
      }
    val (bounds, ests) = filters.partition(isBound)
    val boundSel = bounds.map(one).product
    val estSel =
      if (ests.isEmpty) 1.0 else math.max(0.05, ests.map(one).product)
    math.max(boundSel * estSel, 1.0 / keptRows)
  }

  /** Filter-literal → shared numeric domain (None = not interpolable). */
  def literalToDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case d: scala.math.BigDecimal => Some(d.toDouble)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
    case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
    case s: String => isoDateToDouble(s)
    case _ => None
  }

  /** Manifest stat value → the same numeric domain, by stat kind
    * ("long" / "double" / "decN" / utf8-string — see
    * [[TableStore.ColStats]]). Date columns fold into string stats as
    * ISO text, which maps to epoch days. */
  def statToDouble(value: String, kind: String): Option[Double] =
    try {
      if (kind == "long" || kind == "double") Some(value.toDouble)
      else if (kind.startsWith("dec"))
        Some(new java.math.BigDecimal(new java.math.BigInteger(value),
          kind.stripPrefix("dec").toInt).doubleValue())
      else isoDateToDouble(value)
    } catch { case _: Exception => None }

  private def isoDateToDouble(s: String): Option[Double] =
    if (s.length == 10 && s.charAt(4) == '-' && s.charAt(7) == '-')
      scala.util.Try(
        java.time.LocalDate.parse(s).toEpochDay.toDouble).toOption
    else None
}
