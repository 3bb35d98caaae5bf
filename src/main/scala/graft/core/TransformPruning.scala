package graft.core


import org.apache.spark.sql.sources._

/** Hidden-partitioning prune derivation (Iceberg's headline UX: filter on
  * the SOURCE column, skip by the TRANSFORM partition): a pushed range/
  * equality filter on a column that feeds a temporal or truncate partition
  * transform implies a range filter on the transform's recorded partition
  * value (an exact min=max string stat in the manifest), because every
  * transform rendering is monotone under lexicographic order — zero-padded
  * fixed-width date parts for days/months/hours, byte-prefix for truncate.
  * Strict source bounds weaken to non-strict transform bounds (all rows of
  * the boundary day may still match); conservative by construction.
  *
  * Time-zone contract: temporal partition values are written via
  * `date_format` under the session time zone, and literals here are
  * rendered through the same session zone — write and prune always agree
  * within a session (and across sessions pinned to one zone, the
  * deployment norm this store documents). */
object TransformPruning {

  private def transformsBySource(partitionBy: Seq[String])
      : Map[String, Seq[String]] =
    partitionBy.filter { pc => pc match {
      case TableStore.DaysRe(_) | TableStore.MonthsRe(_) |
           TableStore.HoursRe(_) | TableStore.YearsRe(_) |
           TableStore.TruncRe(_, _) => true
      case _ => false
    }}.groupBy(pc => TableStore.transformSource(pc).get)

  /** Filters on transform partition columns implied by `filters` on their
    * source columns. Callers AND these with the originals — each derived
    * filter is a consequence, never a replacement. */
  def derive(filters: Seq[Filter], partitionBy: Seq[String],
      zoneId: String): Seq[Filter] = {
    val bySource = transformsBySource(partitionBy)
    if (bySource.isEmpty) Seq.empty
    else filters.flatMap(f => deriveOne(f, bySource, zoneId))
  }

  private def deriveOne(f: Filter, bySource: Map[String, Seq[String]],
      zone: String): Seq[Filter] = f match {
    case EqualTo(c, v) => renderAll(c, v, bySource, zone).map {
      case (pc, s) => EqualTo(pc, s) }
    case GreaterThan(c, v) => renderAll(c, v, bySource, zone).map {
      case (pc, s) => GreaterThanOrEqual(pc, s) }
    case GreaterThanOrEqual(c, v) => renderAll(c, v, bySource, zone).map {
      case (pc, s) => GreaterThanOrEqual(pc, s) }
    case LessThan(c, v) => renderAll(c, v, bySource, zone).map {
      case (pc, s) => LessThanOrEqual(pc, s) }
    case LessThanOrEqual(c, v) => renderAll(c, v, bySource, zone).map {
      case (pc, s) => LessThanOrEqual(pc, s) }
    case In(c, vs) =>
      bySource.getOrElse(c, Seq.empty).flatMap { pc =>
        val rendered = vs.toSeq.map(v => render(pc, v, zone))
        if (rendered.exists(_.isEmpty)) None
        else Some(In(pc, rendered.map(_.get.asInstanceOf[Any]).toArray))
      }
    case And(l, r) =>
      deriveOne(l, bySource, zone) ++ deriveOne(r, bySource, zone)
    case Or(l, r) =>
      // sound only pairwise: (dl OR dr) holds whenever (l OR r) does
      for {
        dl <- deriveOne(l, bySource, zone)
        dr <- deriveOne(r, bySource, zone)
      } yield Or(dl, dr)
    case _ => Seq.empty
  }

  private def renderAll(c: String, v: Any,
      bySource: Map[String, Seq[String]], zone: String)
      : Seq[(String, String)] =
    bySource.getOrElse(c, Seq.empty)
      .flatMap(pc => render(pc, v, zone).map(pc -> _))

  /** The transform's partition-value rendering of a source literal, None
    * when the literal's runtime type has no defined rendering (prune is
    * then simply skipped for it). */
  private def render(pc: String, v: Any, zone: String): Option[String] = {
    def temporal(pattern: String): Option[String] = {
      val zid = java.time.ZoneId.of(zone)
      val fmt = java.time.format.DateTimeFormatter.ofPattern(pattern)
      v match {
        case t: java.sql.Timestamp =>
          Some(fmt.withZone(zid).format(t.toInstant))
        case i: java.time.Instant => Some(fmt.withZone(zid).format(i))
        // dates are zone-less: their partition rendering is the calendar
        // date itself (cast date→timestamp→date_format round-trips it)
        case d: java.sql.Date => Some(fmt.format(d.toLocalDate))
        case d: java.time.LocalDate => Some(fmt.format(d))
        case _ => None
      }
    }
    pc match {
      case TableStore.DaysRe(_) => temporal("yyyy-MM-dd")
      case TableStore.MonthsRe(_) => temporal("yyyy-MM")
      case TableStore.YearsRe(_) => temporal("yyyy")
      case TableStore.HoursRe(_) => v match {
        // a zone-less date has no hour; render its midnight
        case d: java.sql.Date => Some(s"${d.toLocalDate}-00")
        case d: java.time.LocalDate => Some(s"$d-00")
        case _ => temporal("yyyy-MM-dd-HH")
      }
      case TableStore.TruncRe(w, _) => v match {
        case s: String => Some(s.take(w.toInt))
        case u: org.apache.spark.unsafe.types.UTF8String =>
          Some(u.toString.take(w.toInt))
        case _ => None
      }
      case _ => None
    }
  }
}
