package org.apache.spark.sql.graft

import graft.catalog.StatsFilter
import graft.core.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-path scan builder for catalog tables: prunes the snapshot's FILE
  * LIST against manifest min/max stats (and partition tuples, which are
  * folded into the stats) BEFORE delegating to Spark's ParquetScanBuilder
  * over the surviving files — the manifest-level skip Iceberg's metadata
  * gives a query, on top of (not instead of) parquet row-group pruning
  * and column pruning, which are delegated wholesale to the inner builder.
  * Lives in org.apache.spark.sql.graft for the private[sql] catalyst
  * pushdown interface, like VectorExpressions. */
class StoreReadScanBuilder(spark: SparkSession, name: String,
    warehouse: String, tableName: String, m: TableStore.Manifest,
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns {

  private var inner: ScanBuilder = _
  private var required: Option[StructType] = None
  private var lastFilters: Seq[Expression] = Seq.empty
  private var keptFiles: Seq[TableStore.FileEntry] = m.files

  private def innerBuilder: ScanBuilder = {
    if (inner == null) inner = parquetBuilderOver(m.files)
    inner
  }

  private def parquetBuilderOver(files: Seq[TableStore.FileEntry]): ScanBuilder = {
    // Manifest-backed index: scan planning from snapshot metadata alone,
    // no filesystem listing (see [[ManifestFileIndex]]).
    val root = new org.apache.hadoop.fs.Path(warehouse, tableName)
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
      spark, new ManifestFileIndex(spark, root, files),
      tableSchema, tableSchema, options)
  }

  /** Fresh parquet scan over `files` with the builder's pushdown state
    * (filters + column pruning) replayed — runtime filtering rebuilds the
    * inner scan through this after shrinking the file set. */
  private def scanOver(files: Seq[TableStore.FileEntry]): Scan = {
    val b = parquetBuilderOver(files)
    b match {
      case p: SupportsPushDownCatalystFilters if lastFilters.nonEmpty =>
        p.pushFilters(lastFilters)
      case _ =>
    }
    b match {
      case p: SupportsPushDownRequiredColumns => required.foreach(p.pruneColumns)
      case _ =>
    }
    b.build()
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // each conjunct translatable to a source filter prunes the file list
    val v1 = filters.flatMap(e => DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = true))
    val kept =
      if (v1.isEmpty) m.files
      else m.files.filter(fe => v1.forall(f => StatsFilter.fileMayMatch(fe.stats, f)))
    keptFiles = kept
    lastFilters = filters
    inner = parquetBuilderOver(kept)
    required.foreach(r => inner match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(r)
      case _ =>
    })
    inner match {
      case p: SupportsPushDownCatalystFilters => p.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters(): Array[Predicate] = innerBuilder match {
    case p: SupportsPushDownCatalystFilters => p.pushedFilters
    case _ => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    innerBuilder match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(requiredSchema)
      case _ =>
    }
  }

  override def build(): Scan = new GraftStatsScan(spark, warehouse, tableName,
    innerBuilder.build(), keptFiles, tableSchema, scanOver,
    options.getBoolean("skipRewrites", false), m.partitionBy)
}

/** Wraps the parquet scan of one pruned snapshot to (a) report EXACT
  * statistics from the manifest (row counts + bytes of the surviving
  * files) — the planner's broadcast/AQE decisions come from truth instead
  * of file-size heuristics — and (b) accept RUNTIME filters: in a star
  * join whose fact-side filter arrives via a dimension, Spark plans a
  * dynamic-pruning subquery over [[filterAttributes]] and calls
  * [[filter]] with the dimension's join-key IN-list before input
  * partitions are planned; the manifest ranges + parquet blooms then drop
  * fact files no surviving key can touch (the reference's headline
  * partitioned-fact scenario — docs/README.md:326-329). */
class GraftStatsScan(spark: SparkSession, warehouse: String, tableName: String,
    initialInner: Scan, initialFiles: Seq[TableStore.FileEntry],
    tableSchema: StructType,
    rebuild: Seq[TableStore.FileEntry] => Scan,
    skipRewrites: Boolean = false,
    partitionBy: Seq[String] = Seq.empty)
    extends Scan with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  private var files = initialFiles
  private var innerScan: Scan = initialInner

  /** Files surviving static + runtime pruning (spec/diagnostics hook). */
  def currentFileCount: Int = files.size
  def table: String = tableName
  def inner: Scan = innerScan

  override def readSchema(): StructType = innerScan.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch = innerScan.toBatch

  /** Streaming face: micro-batches of newly committed snapshots, planned
    * through the same pruned-parquet `rebuild` as batch reads. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(spark, warehouse, tableName, skipRewrites, rebuild)
  override def description(): String =
    s"${innerScan.description()} [graft ${files.size}/${initialFiles.size} files]"

  // Cached: planning rules may ask for filter attributes repeatedly, and
  // the fallback scoring pass is quadratic in (sampled) file count.
  private lazy val pruningColumn: Option[String] =
    graft.catalog.RuntimePruning.bestPruningColumn(
      initialFiles, readSchema(), partitionBy)

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // Advertise only columns that survived column pruning: Spark resolves
    // these refs against the scan's OUTPUT (V2ExpressionUtils.resolveRef),
    // so naming a pruned-away column fails the whole query at planning.
    // A best-separation column outside the projection cannot receive a
    // runtime IN-list anyway (runtime filters come from join keys, which
    // are always read).
    pruningColumn
      .map(c => org.apache.spark.sql.connector.expressions.Expressions.column(c))
      .toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val inLists = graft.catalog.RuntimePruning.inListsOf(predicates)
    if (inLists.nonEmpty) {
      val (hit, _) = graft.catalog.RuntimePruning.pruneByInLists(
        new TableStore(spark, warehouse), tableName, files, inLists)
      if (hit.size < files.size) {
        files = hit
        innerScan = rebuild(files)
      }
    }
  }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, files.map(_.sizeBytes).sum))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(files.map(_.rowCount).sum)
    }
}
