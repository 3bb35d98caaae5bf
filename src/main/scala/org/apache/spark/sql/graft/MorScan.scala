package org.apache.spark.sql.graft

import graft.core.TableStore
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL reads over merge-on-read tables: the scan applies equality deletes
  * itself, Iceberg-style, instead of refusing. The snapshot's data files
  * group by their commit sequence (`v=N/` path prefix, ≤ #commits groups);
  * each group plans Spark's own pruned parquet scan, and every emitted row
  * is checked against a broadcast (key → max delete sequence) map — a row
  * survives iff no delete with a LARGER sequence than its file's covers
  * its key (same-version new images survive, Iceberg v2 semantics). Key
  * columns are forced into the read schema (Spark projects them back out),
  * so column pruning still reaches the parquet scan.
  *
  * Scale shape: the lookup is churn-sized and shipped ONCE per executor
  * via a real broadcast; the delete load is one tiny column-pruned job at
  * plan time. Honest cap: beyond `morMaxDeleteKeys` (default 4M) the scan
  * refuses and points at `CALL compact` — the library read path
  * ([[TableStore.read]]) joins instead of broadcasting and has no cap.
  * Readers are row-based (the per-row filter forfeits parquet
  * vectorization); compacting materializes deletes away and restores
  * columnar scans.
  */
object MorScan {

  /** Normalize an internal value into a hashable/equatable key component
    * (UTF8String instances from parquet buffers don't survive reuse). */
  private def norm(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
    case other => other
  }

  /** (key tuple → max delete sequence) from the snapshot's delete files —
    * one column-pruned driver-collected job, capped at `maxKeys`. */
  def deleteLookup(spark: SparkSession, tableDir: String,
      m: TableStore.Manifest, keySchema: StructType,
      maxKeys: Long): Map[Seq[Any], Long] = {
    val declared = m.deleteFiles.map(_.rowCount).sum
    val total =
      if (declared > 0 || m.deleteFiles.isEmpty) declared
      else spark.read.parquet(
        m.deleteFiles.map(d => s"$tableDir/${d.path}"): _*).count()
    require(total <= maxKeys,
      s"merge-on-read table carries $total delete keys (cap $maxKeys for " +
        "broadcast SQL reads); run CALL compact to materialize the deletes, " +
        "or read through the library API (TableStore.read) which joins " +
        "instead of broadcasting")
    val acc = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    m.deleteFiles.groupBy(_.seq).foreach { case (seq, dels) =>
      val rows = spark.read.schema(keySchema)
        .parquet(dels.map(d => s"$tableDir/${d.path}"): _*)
        .queryExecution.executedPlan.executeCollect()
      rows.foreach { r =>
        val key = keySchema.fields.indices.map(i =>
          norm(r.get(i, keySchema.fields(i).dataType)))
        val prev = acc.getOrElse(key, Long.MinValue)
        if (seq > prev) acc(key) = seq
      }
    }
    acc.toMap
  }

  def keep(row: InternalRow, fileSeq: Long, keyOrdinals: Array[Int],
      keyTypes: Array[DataType], lookup: Map[Seq[Any], Long]): Boolean = {
    val key = keyOrdinals.indices.map(i =>
      norm(row.get(keyOrdinals(i), keyTypes(i))))
    lookup.get(key).forall(_ <= fileSeq)
  }
}

/** The MoR read scan: per-sequence-group parquet scans unioned behind one
  * Batch, rows filtered through the broadcast delete lookup. */
final class GraftMorScan(spark: SparkSession, name: String,
    readSchemaWithKeys: StructType, groups: Seq[(Long, Scan)],
    lookup: Map[Seq[Any], Long], keyOrdinals: Array[Int],
    keyTypes: Array[DataType], files: Seq[TableStore.FileEntry])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = readSchemaWithKeys
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMorScan $name [${groups.size} seq groups, ${lookup.size} delete keys]"

  override def planInputPartitions(): Array[InputPartition] =
    groups.zipWithIndex.flatMap { case ((seq, scan), gi) =>
      scan.toBatch.planInputPartitions().map(p =>
        MorInputPartition(gi, seq, p): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = groups.map(_._2.toBatch.createReaderFactory()).toArray
    new MorReaderFactory(inner,
      spark.sparkContext.broadcast(lookup), keyOrdinals, keyTypes)
  }

  // upper bound (deleted rows included) — still far better than planner
  // defaults for broadcast decisions
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, files.map(_.sizeBytes).sum))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.rowCount).sum)
  }
}

private case class MorInputPartition(group: Int, seq: Long,
    inner: InputPartition) extends InputPartition

private class MorReaderFactory(inner: Array[PartitionReaderFactory],
    lookup: Broadcast[Map[Seq[Any], Long]], keyOrdinals: Array[Int],
    keyTypes: Array[DataType]) extends PartitionReaderFactory {

  // per-row filtering needs rows; parquet's columnar path would hand back
  // whole vectors
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[MorInputPartition]
    val r = inner(mp.group).createReader(mp.inner)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (MorScan.keep(row, mp.seq, keyOrdinals, keyTypes, lookup.value)) {
            current = row
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = r.close()
    }
  }
}
