package org.apache.spark.sql.graft

import graft.core.TableStore
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** SQL reads over merge-on-read tables: the scan applies equality AND
  * positional deletes itself, Iceberg-style, instead of refusing.
  *
  * Equality deletes: the snapshot's data files group by their commit
  * sequence (`v=N/` path prefix, ≤ #commits groups); each group plans
  * Spark's own pruned parquet scan, and every emitted row is checked
  * against a broadcast (key → max delete sequence) map — a row survives
  * iff no delete with a LARGER sequence than its file's covers its key
  * (same-version new images survive, Iceberg v2 semantics). Key columns
  * are forced into the read schema (Spark projects them back out), so
  * column pruning still reaches the parquet scan.
  *
  * Positional deletes mask (relative file path, row index) pairs of
  * immutable files. Row indexes come from the parquet readers themselves:
  * the inner scan's read schema carries Spark's temporary row-index
  * column (`ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME`), which
  * both the vectorized and parquet-mr readers populate with the TRUE
  * within-file row index — computed from row-group offsets, so it
  * survives predicate pushdown, row-group/page skipping, AND byte-range
  * splits. The positional path therefore keeps pushed filters and
  * per-split parallelism (the r6 path planned one sequential unfiltered
  * task per file and reconstructed positions by counting — the "read
  * tax until compaction" is gone). The index column is appended LAST to
  * the pruned schema and stripped before rows/batches are emitted, so
  * the scan's declared output schema is unchanged.
  *
  * Scale shape: both lookup sides are churn-sized and shipped ONCE per
  * executor via real broadcasts; the delete load is one tiny
  * column-pruned job at plan time. Honest cap: beyond `morMaxDeleteKeys`
  * (default 4M) the scan refuses and points at `CALL compact` — the
  * library read path ([[TableStore.read]]) joins instead of broadcasting
  * and has no cap.
  *
  * Vectorized reads survive: when the inner parquet scan supports
  * columnar batches, the delete filter is applied per BATCH — surviving
  * ordinals are computed once and the batch's vectors are wrapped in a
  * zero-copy row-id mapping ([[MappedVector]], the Iceberg
  * ColumnarBatchReader approach), so downstream whole-stage codegen still
  * consumes columnar input. A batch with no deleted rows passes through
  * untouched.
  */
object MorScan {

  /** Normalize an internal value into a hashable/equatable key component
    * (UTF8String instances from parquet buffers don't survive reuse). */
  private def norm(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
    case other => other
  }

  private def requireUnderCap(spark: SparkSession, tableDir: String,
      dels: Seq[TableStore.DeleteEntry], maxKeys: Long): Unit = {
    val declared = dels.map(_.rowCount).sum
    val total =
      if (declared > 0 || dels.isEmpty) declared
      else spark.read.parquet(
        dels.map(d => s"$tableDir/${d.path}"): _*).count()
    require(total <= maxKeys,
      s"merge-on-read table carries $total delete keys (cap $maxKeys for " +
        "broadcast SQL reads); run CALL compact to materialize the deletes, " +
        "or read through the library API (TableStore.read) which joins " +
        "instead of broadcasting")
  }

  /** (key tuple → max delete sequence) from the snapshot's EQUALITY
    * delete files — one column-pruned driver-collected job, capped at
    * `maxKeys`. */
  def deleteLookup(spark: SparkSession, tableDir: String,
      eqDels: Seq[TableStore.DeleteEntry], keySchema: StructType,
      maxKeys: Long): Map[Seq[Any], Long] = {
    requireUnderCap(spark, tableDir, eqDels, maxKeys)
    val acc = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    eqDels.groupBy(_.seq).foreach { case (seq, dels) =>
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

  /** The positional mask from the snapshot's POSITIONAL delete files, as
    * per-data-file DELETE VECTORS — one roaring bitmap of row indexes per
    * masked file (Iceberg v3's representation). vs the old
    * `Set[(path, pos)]` of boxed tuples this is ~50× smaller in memory
    * and on the broadcast wire (run-length-compressed bitmap vs ~150 B
    * per entry), and membership is an O(1) bitmap probe resolved ONCE
    * per partition, not a hash of a freshly allocated tuple per row.
    * Positions are row indexes within one parquet file, so they fit int
    * (enforced); paths are immutable, no sequence logic. */
  def posDeleteVectors(spark: SparkSession, tableDir: String,
      posDels: Seq[TableStore.DeleteEntry],
      maxKeys: Long): Map[String, org.roaringbitmap.RoaringBitmap] = {
    requireUnderCap(spark, tableDir, posDels, maxKeys)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__pos",
        org.apache.spark.sql.types.LongType)))
    val acc = scala.collection.mutable.HashMap
      .empty[String, org.roaringbitmap.RoaringBitmap]
    spark.read.schema(schema)
      .parquet(posDels.map(d => s"$tableDir/${d.path}"): _*)
      .queryExecution.executedPlan.executeCollect()
      .foreach { r =>
        val p = r.getLong(1)
        require(p >= 0 && p <= Int.MaxValue,
          s"positional delete row index out of int range: $p")
        acc.getOrElseUpdate(r.getUTF8String(0).toString,
          new org.roaringbitmap.RoaringBitmap()).add(p.toInt)
      }
    acc.foreach(_._2.runOptimize())
    acc.toMap
  }

  def keep(row: InternalRow, fileSeq: Long, keyOrdinals: Array[Int],
      keyTypes: Array[DataType], lookup: Map[Seq[Any], Long]): Boolean = {
    if (keyOrdinals.isEmpty) return true
    val key = keyOrdinals.indices.map(i =>
      norm(row.get(keyOrdinals(i), keyTypes(i))))
    lookup.get(key).forall(_ <= fileSeq)
  }

  /** Build the right MoR scan for the snapshot's delete mix. `readSchema`
    * must already contain the equality key columns (callers force them
    * in); `scanOver` plans a pruned parquet scan over a file subset with
    * the caller's pushdown state replayed; `scanOverRowIdx` plans the
    * same filtered scan with the parquet row-index temporary column
    * appended to the pruned schema — the readers fill it with the true
    * within-file row index, so positional masks apply under pushdown and
    * row-group skipping. Manifest-level FILE pruning stays safe on both
    * paths — an entirely-skipped file emits no rows and its mask entries
    * are never consulted. */
  def buildScan(spark: SparkSession, root: String, name: String,
      m: TableStore.Manifest, readSchema: StructType,
      tableSchema: StructType, files: Seq[TableStore.FileEntry],
      scanOver: Seq[TableStore.FileEntry] => Scan,
      scanOverRowIdx: Seq[TableStore.FileEntry] => Scan,
      maxKeys: Long): Scan = {
    val (posDels, eqDels) = m.deleteFiles.partition(TableStore.isPositional)
    val keyCols = eqDels.headOption.map(_.keyCols).getOrElse(Seq.empty)
    // delete files store PHYSICAL key names (column mapping pins them);
    // ordinals below stay LOGICAL — positions match, names differ
    val cmap = m.columnMap.toMap
    val keySchema = StructType(keyCols.map(k =>
      tableSchema.fields(tableSchema.fieldIndex(k))
        .copy(name = cmap.getOrElse(k, k))))
    val lookup =
      if (eqDels.isEmpty) Map.empty[Seq[Any], Long]
      else deleteLookup(spark, root, eqDels, keySchema, maxKeys)
    val keyOrdinals = keyCols.map(readSchema.fieldIndex).toArray
    val keyTypes = keyOrdinals.map(i => readSchema.fields(i).dataType)
    if (posDels.isEmpty) {
      val groups = files.groupBy(fe => TableStore.fileSeqOf(fe.path))
        .toSeq.sortBy(_._1)
        .map { case (seq, fes) => (seq, scanOver(fes)) }
      new GraftMorScan(spark, name, readSchema, groups, lookup,
        keyOrdinals, keyTypes, files)
    } else {
      val pos = posDeleteVectors(spark, root, posDels, maxKeys)
      val fileScans = files.sortBy(_.path).map(fe =>
        (TableStore.fileSeqOf(fe.path), fe.path, scanOverRowIdx(Seq(fe))))
      new GraftPosMorScan(spark, name, readSchema, fileScans, lookup, pos,
        keyOrdinals, keyTypes, files)
    }
  }

  /** Surviving row ordinals of one columnar batch under the equality
    * lookup (and, when `relPath` is non-null, the positional mask with
    * each row's true file position read from `posVec` — the parquet
    * row-index column's vector). Returns null when EVERY row survives —
    * the caller passes the batch through untouched. */
  private[graft] def survivors(batch: ColumnarBatch, fileSeq: Long,
      keyOrdinals: Array[Int], keyTypes: Array[DataType],
      lookup: Map[Seq[Any], Long],
      posVec: ColumnVector, dv: org.roaringbitmap.RoaringBitmap): Array[Int] = {
    val n = batch.numRows()
    val out = new Array[Int](n)
    var kept = 0
    val it = batch.rowIterator()
    var i = 0
    while (it.hasNext) {
      val row = it.next()
      val ok = keep(row, fileSeq, keyOrdinals, keyTypes, lookup) &&
        (dv == null || !dv.contains(posVec.getLong(i).toInt))
      if (ok) { out(kept) = i; kept += 1 }
      i += 1
    }
    if (kept == n) null else java.util.Arrays.copyOf(out, kept)
  }

  /** Wrap a batch's vectors behind a surviving-ordinal mapping. */
  private[graft] def mapBatch(batch: ColumnarBatch,
      ids: Array[Int]): ColumnarBatch = {
    val cols = Array.tabulate(batch.numCols())(c =>
      new MappedVector(batch.column(c), ids): ColumnVector)
    new ColumnarBatch(cols, ids.length)
  }
}

/** Zero-copy row-id indirection over an inner ColumnVector: row r of this
  * vector is row map(r) of the inner one. The MoR columnar delete filter
  * wraps surviving ordinals in these instead of materializing rows, so
  * vectorized parquet batches flow through to downstream codegen with
  * deleted rows skipped. The inner vector stays owned by the inner
  * reader's batch — close() is a no-op here. */
private final class MappedVector(inner: ColumnVector, map: Array[Int])
    extends ColumnVector(inner.dataType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = {
    var i = 0
    while (i < map.length) { if (inner.isNullAt(map(i))) return true; i += 1 }
    false
  }
  override def numNulls: Int = {
    var n = 0
    var i = 0
    while (i < map.length) { if (inner.isNullAt(map(i))) n += 1; i += 1 }
    n
  }
  override def isNullAt(r: Int): Boolean = inner.isNullAt(map(r))
  override def getBoolean(r: Int): Boolean = inner.getBoolean(map(r))
  override def getByte(r: Int): Byte = inner.getByte(map(r))
  override def getShort(r: Int): Short = inner.getShort(map(r))
  override def getInt(r: Int): Int = inner.getInt(map(r))
  override def getLong(r: Int): Long = inner.getLong(map(r))
  override def getFloat(r: Int): Float = inner.getFloat(map(r))
  override def getDouble(r: Int): Double = inner.getDouble(map(r))
  override def getArray(r: Int): ColumnarArray = inner.getArray(map(r))
  override def getMap(r: Int): ColumnarMap = inner.getMap(map(r))
  override def getDecimal(r: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    inner.getDecimal(map(r), p, s)
  override def getUTF8String(r: Int): UTF8String = inner.getUTF8String(map(r))
  override def getBinary(r: Int): Array[Byte] = inner.getBinary(map(r))
  override def getChild(ordinal: Int): ColumnVector =
    new MappedVector(inner.getChild(ordinal), map)
}

/** The equality-delete MoR read scan: per-sequence-group parquet scans
  * unioned behind one Batch, rows (or columnar batches) filtered through
  * the broadcast delete lookup. */
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

/** The positional(-and-equality) MoR read scan: per-file filtered parquet
  * scans whose read schema carries the parquet row-index temporary column
  * (populated by the readers with true within-file positions), flattened
  * to ONE input partition per byte-range split — full split parallelism
  * and pushdown, positions immune to row-group skipping. The declared
  * output schema excludes the index column; readers strip it. */
final class GraftPosMorScan(spark: SparkSession, name: String,
    readSchemaWithKeys: StructType, fileScans: Seq[(Long, String, Scan)],
    lookup: Map[Seq[Any], Long], pos: Map[String, org.roaringbitmap.RoaringBitmap],
    keyOrdinals: Array[Int], keyTypes: Array[DataType],
    files: Seq[TableStore.FileEntry])
    extends Scan with Batch with SupportsReportStatistics {

  // Resolved by NAME against the inner scan's actual read schema — a
  // Spark change to pruned-schema ordering would surface here at plan
  // time instead of desynchronizing positions silently.
  private[graft] val rowIdxOrdinal: Int = {
    val inner = fileScans.head._3.readSchema()
    inner.fieldIndex(org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
  }

  override def readSchema(): StructType = readSchemaWithKeys
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftPosMorScan $name [${fileScans.size} files, " +
      s"${pos.valuesIterator.map(_.getLongCardinality).sum} positional " +
      s"(${pos.size} delete vectors) + ${lookup.size} equality delete keys]"

  override def planInputPartitions(): Array[InputPartition] =
    fileScans.zipWithIndex.flatMap { case ((seq, relPath, scan), fi) =>
      scan.toBatch.planInputPartitions().map(p =>
        PosMorInputPartition(fi, seq, relPath, p): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = fileScans.map(_._3.toBatch.createReaderFactory()).toArray
    new PosMorReaderFactory(inner, spark.sparkContext.broadcast(lookup),
      spark.sparkContext.broadcast(pos), keyOrdinals, keyTypes,
      readSchemaWithKeys, rowIdxOrdinal)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, files.map(_.sizeBytes).sum))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.rowCount).sum)
  }
}

private case class MorInputPartition(group: Int, seq: Long,
    inner: InputPartition) extends InputPartition

private case class PosMorInputPartition(file: Int, seq: Long,
    relPath: String, inner: InputPartition) extends InputPartition

private class MorReaderFactory(inner: Array[PartitionReaderFactory],
    lookup: Broadcast[Map[Seq[Any], Long]], keyOrdinals: Array[Int],
    keyTypes: Array[DataType]) extends PartitionReaderFactory {

  // vectorized reads survive the delete filter via the per-batch row-id
  // mapping — delegate the columnar decision to the parquet factory
  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val mp = partition.asInstanceOf[MorInputPartition]
    inner(mp.group).supportColumnarReads(mp.inner)
  }

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

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val mp = partition.asInstanceOf[MorInputPartition]
    val r = inner(mp.group).createColumnarReader(mp.inner)
    new PartitionReader[ColumnarBatch] {
      private var current: ColumnarBatch = _
      override def next(): Boolean = {
        while (r.next()) {
          val b = r.get()
          val ids = MorScan.survivors(b, mp.seq, keyOrdinals, keyTypes,
            lookup.value, null, null)
          if (ids == null) { current = b; return true }
          if (ids.nonEmpty) { current = MorScan.mapBatch(b, ids); return true }
        }
        false
      }
      override def get(): ColumnarBatch = current
      override def close(): Unit = r.close()
    }
  }
}

private class PosMorReaderFactory(inner: Array[PartitionReaderFactory],
    lookup: Broadcast[Map[Seq[Any], Long]],
    pos: Broadcast[Map[String, org.roaringbitmap.RoaringBitmap]],
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType], outSchema: StructType,
    rowIdxOrdinal: Int) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val mp = partition.asInstanceOf[PosMorInputPartition]
    inner(mp.file).supportColumnarReads(mp.inner)
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val mp = partition.asInstanceOf[PosMorInputPartition]
    val r = inner(mp.file).createReader(mp.inner)
    val dv = pos.value.getOrElse(mp.relPath, null)
    new PartitionReader[InternalRow] {
      // strips the trailing row-index column: one reusable projecting
      // view over the declared output ordinals (no per-row allocation)
      private val out = new org.apache.spark.sql.catalyst.ProjectingInternalRow(
        outSchema, outSchema.indices.toIndexedSeq)
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (r.next()) {
          val row = r.get()
          if (MorScan.keep(row, mp.seq, keyOrdinals, keyTypes, lookup.value) &&
              (dv == null || !dv.contains(row.getLong(rowIdxOrdinal).toInt))) {
            out.project(row)
            current = out
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val mp = partition.asInstanceOf[PosMorInputPartition]
    val r = inner(mp.file).createColumnarReader(mp.inner)
    val dv = pos.value.getOrElse(mp.relPath, null)
    new PartitionReader[ColumnarBatch] {
      private var current: ColumnarBatch = _
      // the output batch drops the row-index vector (ordinals < outSchema
      // size are the declared columns — the index column is appended last)
      private def strip(b: ColumnarBatch, ids: Array[Int]): ColumnarBatch = {
        val cols = Array.tabulate(outSchema.length) { c =>
          if (ids == null) b.column(c)
          else new MappedVector(b.column(c), ids): ColumnVector
        }
        new ColumnarBatch(cols, if (ids == null) b.numRows() else ids.length)
      }
      override def next(): Boolean = {
        while (r.next()) {
          val b = r.get()
          val ids = MorScan.survivors(b, mp.seq, keyOrdinals, keyTypes,
            lookup.value, b.column(rowIdxOrdinal), dv)
          if (ids == null || ids.nonEmpty) {
            current = strip(b, ids)
            return true
          }
        }
        false
      }
      override def get(): ColumnarBatch = current
      override def close(): Unit = r.close()
    }
  }
}
