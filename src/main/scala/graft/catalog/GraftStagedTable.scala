package graft.catalog

import java.util

import graft.core.TableStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.graft.StoreWrite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The in-flight table of an atomic `CREATE / REPLACE TABLE [AS SELECT]`
  * (StagingTableCatalog): Spark writes the query's rows through
  * [[StoreWrite.stagedBuilder]] — which stages parquet files but commits
  * NOTHING — then calls [[commitStagedChanges]], the single atomic point
  * where [[TableStore.commitStagedFresh]] turns the staged files into a
  * fresh snapshot (new schema, new partition spec, no carried identity)
  * and swaps the pointer. Until then every reader still sees the old
  * snapshot; [[abortStagedChanges]] just deletes the staging files. A
  * plain `REPLACE TABLE` without AS SELECT arrives here too, with no
  * write — the commit then lands an empty fresh snapshot. */
private[catalog] class GraftStagedTable(spark: SparkSession,
    catalogName: String, warehouse: String, tableName: String,
    tableSchema: StructType, partCols: Seq[String], operation: String,
    ddlConstraints: Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
      Array.empty,
    clusterBy: Seq[String] = Seq.empty)
    extends StagedTable with SupportsWrite {

  /** (absolute staged path, version-relative path) pairs handed over by
    * the write's driver-side commit; a CTAS runs exactly one write job,
    * but `synchronized` keeps the handoff safe regardless. */
  private var staged: Seq[(String, String)] = Seq.empty

  override def name(): String = s"$catalogName.$tableName"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] = {
    val Bucketed = """__bucket(\d+)_(.+)""".r
    partCols.map {
      case Bucketed(n, c) =>
        org.apache.spark.sql.connector.expressions.Expressions.bucket(n.toInt, c)
      case c => org.apache.spark.sql.connector.expressions.Expressions.identity(c)
    }.toArray
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    StoreWrite.stagedBuilder(warehouse, tableName, info, partCols, clusterBy,
      files => synchronized { staged = staged ++ files })

  override def commitStagedChanges(): Unit = {
    val store = new TableStore(spark, warehouse)
    val checks = ddlConstraints.toSeq.map {
      case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
        chk.name() -> chk.predicateSql()
      case other => throw new UnsupportedOperationException(
        s"only CHECK constraints are enforced; got ${other.toDDL}")
    }
    store.commitStagedFresh(tableName,
      synchronized(staged).map { case (abs, rel) => (new Path(abs), rel) },
      operation, tableSchema.json, partCols, checks, clusterBy)
    cleanupStaging()
  }

  override def abortStagedChanges(): Unit = cleanupStaging()

  /** Drop exactly the per-job `_staging/<uuid>` dirs this write's files
    * came from (commit renamed the files out; abort leaves them) — never
    * the sibling dirs a concurrent INSERT may be staging into. A write
    * that failed before handing any file over cleans its own dir in
    * GraftWrite.abort; anything left beyond that is orphan-collectable. */
  private def cleanupStaging(): Unit = {
    val dirs = synchronized(staged).map { case (abs, rel) =>
      abs.stripSuffix("/" + rel)
    }.distinct
    dirs.foreach { d =>
      val p = new Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
  }
}
