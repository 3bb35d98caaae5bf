package org.apache.spark.sql.graft

import graft.core.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}

/** Stream offset = table version: everything at or below it has been
  * emitted. */
case class GraftOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** Structured Streaming source over a [[TableStore]] table: each
  * micro-batch is the file-level delta between two committed versions
  * (the streaming face of `TableStore.readIncremental` — Iceberg/Delta's
  * "table as a stream of appends"). Offsets are table versions, so the
  * checkpoint protocol gives exactly-once delivery of every appended row:
  * a restarted query resumes from the last committed version.
  *
  * Batches are planned by the SAME pruned-parquet machinery as batch
  * reads (`rebuild` replays the scan builder's pushed filters and column
  * pruning over the delta's files), so a filtered streaming query reads
  * only surviving files and columns. Non-append snapshots (copy-on-write
  * MERGE/UPDATE/DELETE, compaction, rollback) fail the stream by default
  * — their new files re-carry already-emitted rows; with reader option
  * `skipRewrites=true` they are skipped instead (the stream keeps its
  * append-only view; rewritten rows are not re-emitted).
  *
  * Reader option `maxVersionsPerTrigger=N` (0 = unlimited) bounds each
  * micro-batch to N snapshots via admission control — the backfill
  * throttle (Delta's maxFilesPerTrigger / Iceberg's streaming read
  * limits): a stream started against a year-old table drains it in
  * bounded batches instead of one giant first batch, and steady-state
  * latency is unaffected once caught up.
  *
  * `Trigger.AvailableNow` is supported: the version current at query
  * start is pinned as the drain target, the backlog up to it is emitted
  * (still in `maxVersionsPerTrigger`-bounded batches), and the query
  * STOPS — the batch-drain mode of a scheduled ingest pipeline
  * (process everything that exists, exactly once, then exit). Versions
  * committed after the pin are left for the next run's checkpoint.
  */
class GraftMicroBatchStream(spark: SparkSession, warehouse: String,
    tableName: String, skipRewrites: Boolean,
    rebuild: Seq[TableStore.FileEntry] => Scan,
    maxVersionsPerTrigger: Long = 0L)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def store = new TableStore(spark, warehouse)

  // Trigger.AvailableNow drain target: pinned once at query start so the
  // stream has a stable finish line even while writers keep committing.
  @volatile private var availableNowCap: Long = Long.MaxValue

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = store.currentVersion(tableName)

  // planInputPartitions/createReaderFactory are driver-side and called in
  // order per micro-batch (MicroBatchScanExec); the factory must match the
  // batch's scan, so keep the one planned last.
  private var lastBatch: Batch = _

  override def initialOffset(): Offset = GraftOffset(0L)

  override def latestOffset(): Offset =
    GraftOffset(store.currentVersion(tableName))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = math.min(store.currentVersion(tableName), availableNowCap)
    val from = start.asInstanceOf[GraftOffset].version
    if (maxVersionsPerTrigger <= 0L) GraftOffset(cur)
    else GraftOffset(math.min(cur, from + maxVersionsPerTrigger))
  }

  override def reportLatestOffset(): Offset =
    GraftOffset(store.currentVersion(tableName))

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].version
    val to = end.asInstanceOf[GraftOffset].version
    if (to <= from) return Array.empty
    val added = store.addedFilesBetween(tableName, from, to, skipRewrites)
    if (added.isEmpty) return Array.empty
    lastBatch = rebuild(added).toBatch
    lastBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // An all-empty batch plans zero partitions; the factory is still
    // requested, so fall back to a scan over no files (never invoked).
    if (lastBatch == null) lastBatch = rebuild(Seq.empty).toBatch
    lastBatch.createReaderFactory()
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
