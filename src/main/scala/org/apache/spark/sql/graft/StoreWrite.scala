package org.apache.spark.sql.graft

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.core.TableStore

/** DSv2 batch write into a [[graft.core.TableStore]] table — the engine
  * behind SQL `CREATE TABLE AS SELECT` / `INSERT INTO` / `INSERT OVERWRITE`
  * / `MERGE INTO` against a GraftCatalog (the reference's headline write
  * surface: CTAS at athena_functions.py:60-97, MERGE at
  * updating_db_with_deltas_iceberg.ipynb cell 26).
  *
  * Each task writes a parquet file into a per-job staging directory using
  * Spark's own ParquetFileFormat OutputWriter (identical file format to the
  * read path, TIMESTAMP_MICROS timestamps so footer stats stay orderable);
  * the driver-side commit MOVES staged files into the next version
  * directory (same-FS rename, zero data copy) and swaps the snapshot
  * pointer. Append keeps existing file entries metadata-only.
  *
  * Lives in org.apache.spark.sql.graft for access to the internal writer
  * factory and SerializableConfiguration, like VectorExpressions.
  */
object StoreWrite {

  /** WriteBuilder for plain INSERT INTO (append, metadata-only for
    * existing files) / INSERT OVERWRITE (truncate → full replace). */
  def builder(warehouse: String, table: String, info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(warehouse, table, info.schema(), "append",
      () => {
        val store = new TableStore(SparkSession.active, warehouse)
        if (store.exists(table)) store.manifests(table).maxBy(_.version).files
        else Seq.empty
      })

  /** WriteBuilder for a group-based row-level operation (MERGE / UPDATE /
    * DELETE): the rewritten rows replace the files the operation's scan
    * covered; `kept` supplies the untouched files (file-level
    * copy-on-write, resolved at commit time). */
  def cowBuilder(warehouse: String, table: String, info: LogicalWriteInfo,
      operation: String, kept: () => Seq[TableStore.FileEntry]): WriteBuilder =
    new GraftWriteBuilder(warehouse, table, info.schema(), operation, kept)
}

private class GraftWriteBuilder(warehouse: String, table: String,
    schema: StructType, operation: String, kept: () => Seq[TableStore.FileEntry])
    extends WriteBuilder with SupportsTruncate {
  private var op = operation
  private var keptFiles = kept
  override def truncate(): WriteBuilder = {
    op = "overwrite"; keptFiles = () => Seq.empty; this
  }
  override def build(): Write =
    new GraftWrite(warehouse, table, schema, op, keptFiles)
}

private class GraftWrite(warehouse: String, table: String, schema: StructType,
    operation: String, kept: () => Seq[TableStore.FileEntry])
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  private def spark = SparkSession.active
  private val stagingDir = s"$warehouse/$table/_staging/${UUID.randomUUID()}"

  override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    // after prepareWrite: it stamps the session's timestamp type; store
    // files must be TIMESTAMP_MICROS for orderable footer stats
    job.getConfiguration.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    new GraftWriterFactory(factory, schema,
      new SerializableConfiguration(job.getConfiguration), stagingDir)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case GraftCommitMessage(p) => new Path(p) }.toSeq
    val store = new TableStore(spark, warehouse)
    // The table's declared schema stays authoritative across writes: the
    // query's schema may carry tighter nullability (e.g. literal VALUES),
    // which would make added-then-null columns unreadable in old files.
    val schemaJson = store.manifests(table).lastOption
      .map(_.schemaJson)
      .filter { sj =>
        org.apache.spark.sql.types.DataType.fromJson(sj)
          .asInstanceOf[StructType].fieldNames.toSet == schema.fieldNames.toSet
      }
      .getOrElse(schema.json)
    store.commitStaged(table, kept(), staged, operation, schemaJson)
    cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    val p = new Path(stagingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}

private case class GraftCommitMessage(path: String) extends WriterCommitMessage

private class GraftWriterFactory(factory: OutputWriterFactory,
    schema: StructType, conf: SerializableConfiguration, stagingDir: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // lazily opened so empty partitions produce no file at all
      private var writer: OutputWriter = _
      private var path: String = _
      // Row-level-operation plans (MERGE/UPDATE/DELETE) in Spark 4.1 emit
      // rows as (operation_marker_int, table columns...) — see
      // RowDeltaUtils.OPERATION_COLUMN and ReplaceDataExec: the stripping
      // ProjectingInternalRow is only applied when the operation requires
      // metadata attributes. Strip the marker here by projecting the
      // table columns at ordinals 1..n.
      private var proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _
      private var checked = false

      private def open(firstRow: InternalRow): Unit = {
        if (firstRow.numFields == schema.length + 1) {
          import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
          proj = UnsafeProjection.create(schema.fields.toIndexedSeq.zipWithIndex.map {
            case (f, i) => BoundReference(i + 1, f.dataType, f.nullable)
          })
        } else require(firstRow.numFields == schema.length,
          s"row has ${firstRow.numFields} fields, write schema has ${schema.length}")
        val attempt = new TaskAttemptID(
          new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), 0)
        val ctx = new TaskAttemptContextImpl(conf.value, attempt)
        path = f"$stagingDir/part-$partitionId%05d-$taskId${factory.getFileExtension(ctx)}"
        writer = factory.newInstance(path, schema, ctx)
      }

      override def write(row: InternalRow): Unit = {
        if (!checked) { open(row); checked = true }
        writer.write(if (proj == null) row else proj(row))
      }
      override def commit(): WriterCommitMessage =
        if (writer == null) GraftNoDataMessage
        else { writer.close(); writer = null; GraftCommitMessage(path) }
      override def abort(): Unit = close()
      override def close(): Unit =
        if (writer != null) { writer.close(); writer = null }
    }
}

private case object GraftNoDataMessage extends WriterCommitMessage
