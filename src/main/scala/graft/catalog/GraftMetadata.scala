package graft.catalog

import java.util

import graft.core.TableStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style `t$history` / `t$files` metadata tables, SQL face of
  * TableStore.history (A15 — the reference reads
  * `SELECT * FROM "db"."t$history"`, iceberg_test.Rmd:383-386).
  * Metadata is manifest-resident (O(versions) / O(files)), so it is served
  * driver-side as a [[LocalScan]] — no Spark job, same as Iceberg's
  * metadata tables at this cardinality. */
object GraftMetadata {

  val historySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("made_current_at", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  val filesSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false)))

  def historyRows(ms: Seq[TableStore.Manifest]): Array[InternalRow] =
    ms.sortBy(-_.version).map { m =>
      new GenericInternalRow(Array[Any](m.version, m.timestampMs * 1000L,
        UTF8String.fromString(m.operation), m.rowCount,
        m.files.size.toLong, m.files.map(_.sizeBytes).sum))
    }.toArray

  def filesRows(ms: Seq[TableStore.Manifest]): Array[InternalRow] = {
    val m = ms.maxBy(_.version)
    m.files.sortBy(_.path).map { fe =>
      new GenericInternalRow(Array[Any](m.version,
        UTF8String.fromString(fe.path), fe.sizeBytes, fe.rowCount))
    }.toArray
  }

  val partitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  /** Per-partition rollup of the CURRENT snapshot (Iceberg's `$partitions`):
    * partition rendered as `col=value/...` in spec order; unpartitioned
    * tables roll up into a single `<unpartitioned>` row. Manifest-resident
    * like the others — O(files) driver work, no Spark job. */
  def partitionsRows(ms: Seq[TableStore.Manifest]): Array[InternalRow] = {
    val m = ms.maxBy(_.version)
    m.files.groupBy { fe =>
      if (m.partitionBy.isEmpty || fe.partitionValues.isEmpty) "<unpartitioned>"
      else m.partitionBy.map(c =>
        s"$c=${fe.partitionValues.getOrElse(c, "null")}").mkString("/")
    }.toSeq.sortBy(_._1).map { case (p, fes) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(p),
        fes.size.toLong, fes.map(_.rowCount).sum, fes.map(_.sizeBytes).sum))
    }.toArray
  }

  val refsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** Iceberg's `$refs`: every named ref — tags (immutable, `version` =
    * tagged main snapshot) and branches (writable, `version` = commits
    * ahead of the fork). Driver-resident like the others. */
  def refsRows(store: TableStore, base: String): Array[InternalRow] = {
    val tagRows = store.tags(base).map { case (n, v) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(n),
        UTF8String.fromString("tag"), v)): InternalRow
    }
    val branchRows = store.branches(base).map { case (n, k) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(n),
        UTF8String.fromString("branch"), k)): InternalRow
    }
    (tagRows ++ branchRows).toArray
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("analyzed_version", LongType, nullable = false),
    StructField("current_version", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("ndv", LongType, nullable = false),
    StructField("max_freq", LongType, nullable = false)))

  /** `$stats`: the newest ANALYZE result at or below the current version
    * (empty until `CALL analyze_table`). `analyzed_version` vs
    * `current_version` makes staleness explicit — stats are snapshot-
    * scoped and never silently carried (see TableStore.analyzeTable). */
  def statsRows(store: TableStore, base: String): Array[InternalRow] =
    store.columnStats(base) match {
      case None => Array.empty
      case Some((v, rc, cols)) =>
        val cur = store.currentVersion(base)
        cols.sortBy(_._1).map { case (c, nulls, ndv, maxFreq) =>
          new GenericInternalRow(Array[Any](UTF8String.fromString(c),
            v, cur, rc, nulls, ndv, maxFreq)): InternalRow
        }.toArray
    }

  /** `<table>$<meta>` resolution, or None if `name` has no '$' suffix. */
  def resolve(name: String, store: TableStore): Option[Table] = {
    val i = name.indexOf('$')
    if (i <= 0) None
    else {
      val (base, meta) = (name.substring(0, i), name.substring(i + 1))
      val ms = store.manifests(base)
      if (ms.isEmpty) None
      else meta match {
        case "history" => Some(new LocalTable(s"$base$$history", historySchema, historyRows(ms)))
        case "files" => Some(new LocalTable(s"$base$$files", filesSchema, filesRows(ms)))
        case "partitions" => Some(new LocalTable(s"$base$$partitions", partitionsSchema, partitionsRows(ms)))
        case "refs" => Some(new LocalTable(s"$base$$refs", refsSchema, refsRows(store, base)))
        case "stats" => Some(new LocalTable(s"$base$$stats", statsSchema, statsRows(store, base)))
        case _ => None
      }
    }
  }
}

/** A read-only DSv2 table serving a small driver-resident row set. */
class LocalTable(tableName: String, tableSchema: StructType,
    tableRows: Array[InternalRow]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = tableSchema
      override def rows(): Array[InternalRow] = tableRows
    }
}
