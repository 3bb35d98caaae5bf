package graft.catalog

import graft.core.TableStore
import graft.core.TableStore.{ColStats, FileEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.graft.StoreWrite
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (file-level copy-on-write) row-level operation for SQL
  * `MERGE INTO` / `UPDATE` / `DELETE` against a [[TableStore]] table.
  *
  * Spark's ReplaceData contract: the operation's scan defines the affected
  * GROUPS; every row the scan returns is replaced by the write's output.
  * Filters Spark pushes into this scan (the UPDATE/DELETE condition) are
  * therefore group-selection hints, NOT row filters — applying them at row
  * (or parquet row-group) granularity would silently drop the carryover
  * rows of partially-affected files. So:
  *
  *  - [[newScanBuilder]] evaluates pushed filters against the manifest's
  *    per-file min/max stats to split the snapshot into (hit, kept) files,
  *    then scans the HIT files in full (no filters reach parquet);
  *  - [[newWriteBuilder]]'s commit replaces exactly the hit files: new
  *    snapshot = kept ∪ written. Untouched files cost zero I/O, same as
  *    the Scala `graft.core.Merge` path.
  *
  * A condition no file stats can bound (or a MERGE, whose ON condition is
  * only known at runtime) degrades safely to hit = all files.
  */
class GraftRowLevelOperation(spark: SparkSession, catalogName: String,
    warehouse: String, tableName: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  private val store = new TableStore(spark, warehouse)
  private val manifest = store.manifests(tableName).maxBy(_.version)
  private val tableSchema =
    DataType.fromJson(manifest.schemaJson).asInstanceOf[StructType]

  // group selection, shared between the scan (set) and the write (read)
  @volatile private var hitFiles: Seq[FileEntry] = manifest.files
  @volatile private var keptFiles: Seq[FileEntry] = Seq.empty

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private var accepted = Array.empty[Filter]

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (hit, kept) = manifest.files.partition(fe =>
          filters.forall(f => fileMayMatch(fe.stats, f)))
        hitFiles = hit
        keptFiles = kept
        accepted = filters
        // group-granular application: every filter is also a residual
        // (we did not row-filter), but ReplaceData re-evaluates the
        // condition in its projection, so none are re-applied on rows.
        filters
      }

      override def pushedFilters(): Array[Filter] = accepted

      override def build(): Scan = {
        val paths = hitFiles.map(fe =>
          new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(warehouse, tableName), fe.path).toString)
        ParquetTable(s"$catalogName.$tableName@v${manifest.version}(cow)",
          spark, CaseInsensitiveStringMap.empty(), paths, Some(tableSchema),
          classOf[ParquetFileFormat])
          .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    StoreWrite.cowBuilder(warehouse, tableName, info,
      cmd.toString.toLowerCase, () => keptFiles)

  /** Could a file with these stats contain a row matching the filter?
    * Conservative: anything not provably disjoint is a match. */
  private def fileMayMatch(stats: Map[String, ColStats], f: Filter): Boolean = {
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
