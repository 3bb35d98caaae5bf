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
  private var keptFiles: Seq[TableStore.FileEntry] = m.files

  private def innerBuilder: ScanBuilder = {
    if (inner == null) inner = parquetBuilderOver(m.files)
    inner
  }

  private def parquetBuilderOver(files: Seq[TableStore.FileEntry]): ScanBuilder = {
    val paths = files.map(fe =>
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse, tableName), fe.path).toString)
    ParquetTable(name, spark, CaseInsensitiveStringMap.empty(), paths,
      Some(tableSchema), classOf[ParquetFileFormat]).newScanBuilder(options)
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // each conjunct translatable to a source filter prunes the file list
    val v1 = filters.flatMap(e => DataSourceStrategy.translateFilter(e,
      supportNestedPredicatePushdown = true))
    val kept =
      if (v1.isEmpty) m.files
      else m.files.filter(fe => v1.forall(f => StatsFilter.fileMayMatch(fe.stats, f)))
    keptFiles = kept
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

  override def build(): Scan = new GraftStatsScan(innerBuilder.build(), keptFiles)
}

/** Wraps the parquet scan of one pruned snapshot to report EXACT
  * statistics from the manifest (row counts + bytes of the surviving
  * files) — the planner's broadcast/AQE decisions come from truth
  * instead of file-size heuristics. */
class GraftStatsScan(val inner: Scan, files: Seq[TableStore.FileEntry])
    extends Scan with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch = inner.toBatch
  override def description(): String = inner.description()
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, files.map(_.sizeBytes).sum))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(files.map(_.rowCount).sum)
    }
}
