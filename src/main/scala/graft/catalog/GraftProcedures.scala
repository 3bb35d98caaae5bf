package graft.catalog

import graft.core.TableStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL `CALL`-able maintenance procedures (A16 parity with the reference's
  * `OPTIMIZE t REWRITE DATA USING BIN_PACK`, iceberg_test.Rmd:406):
  * {{{
  *   CALL graft.system.compact(table => 'events', target_file_bytes => 134217728L)
  *   CALL graft.system.expire_snapshots(table => 'events', keep_last => 1)
  * }}} */
object GraftProcedures {

  def load(name: String, store: => TableStore): Option[UnboundProcedure] =
    name match {
      case "compact" => Some(compact(store))
      case "rewrite_delete_files" => Some(rewriteDeleteFiles(store))
      case "rewrite_position_deletes" => Some(rewritePositionDeletes(store))
      case "expire_snapshots" => Some(expireSnapshots(store))
      case "rollback_to_version" => Some(rollbackToVersion(store))
      case "analyze_table" => Some(analyzeTable(store))
      case "analyze_incremental" => Some(analyzeIncremental(store))
      case "consistent_cut" => Some(consistentCut(store))
      case "refresh_index" => Some(refreshIndex(store))
      case "remove_orphan_files" => Some(removeOrphanFiles(store))
      case "rewrite_sorted" => Some(rewriteSorted(store))
      case "rewrite_zorder" => Some(rewriteZOrder(store))
      case "publish_staged" => Some(publishStaged(store))
      case "set_partition_spec" => Some(setPartitionSpec(store))
      case "add_files" => Some(addFiles(store))
      case "add_check_constraint" => Some(addCheckConstraint(store))
      case "drop_check_constraint" => Some(dropCheckConstraint(store))
      case "set_write_order" => Some(setWriteOrder(store))
      case "create_branch" => Some(createBranch(store))
      case "fast_forward" => Some(fastForward(store))
      case "drop_branch" => Some(dropBranch(store))
      case "create_view" => Some(createView(store))
      case "drop_view" => Some(dropView(store))
      case "sync_views" => Some(syncViews(store))
      case "clone_table" => Some(cloneTable(store))
      case _ => None
    }

  val names: Seq[String] =
    Seq("compact", "rewrite_delete_files", "rewrite_position_deletes",
      "expire_snapshots",
      "rollback_to_version", "remove_orphan_files", "rewrite_sorted",
      "rewrite_zorder", "publish_staged", "set_partition_spec",
      "add_files", "add_check_constraint", "drop_check_constraint",
      "set_write_order", "create_branch", "fast_forward", "drop_branch",
      "create_view", "drop_view", "sync_views", "clone_table",
      "analyze_table", "analyze_incremental", "consistent_cut")

  private def result(schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }).iterator()

  private def results(schema: StructType, rs: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = rs.toArray
    }).iterator()

  private def compact(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String = "bin-pack the current snapshot into ~target_file_bytes files"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "compact"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("target_file_bytes", LongType)
          .defaultValue("134217728").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val target = input.getLong(1)
        val s = store
        val before = s.manifests(table).maxBy(_.version).files.size.toLong
        val v = s.compact(table, target)
        val after = s.manifests(table).maxBy(_.version).files.size.toLong
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("files_before", LongType), StructField("files_after", LongType))),
          new GenericInternalRow(Array[Any](v, before, after)))
      }
    }
  }

  /** `CALL g.system.rewrite_delete_files(table => 't')` — merge-on-read
    * minor compaction: consolidate the equality-delete overlay (dedup
    * keys to their max sequence, merge equivalent sequence classes, drop
    * dangling ones) without touching any data file. */
  private def rewriteDeleteFiles(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rewrite_delete_files"
    override def description(): String =
      "consolidate merge-on-read delete files (no data file is rewritten)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rewrite_delete_files"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val s = store
        val before = s.manifests(table).maxBy(_.version).deleteFiles.size.toLong
        val v = s.compactDeletes(table)
        val after = s.manifests(table).maxBy(_.version).deleteFiles.size.toLong
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("delete_files_before", LongType),
            StructField("delete_files_after", LongType))),
          new GenericInternalRow(Array[Any](v, before, after)))
      }
    }
  }

  /** `CALL g.system.rewrite_position_deletes(table => 't')` — rewrite
    * the POSITIONAL overlay into one deduplicated (file, pos)-sorted
    * delete set (the delete-vector consolidation; equality deletes and
    * data files untouched). */
  private def rewritePositionDeletes(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rewrite_position_deletes"
    override def description(): String =
      "consolidate positional delete files into one sorted delete set"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rewrite_position_deletes"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val s = store
        def posCount = s.manifests(table).maxBy(_.version)
          .deleteFiles.count(TableStore.isPositional).toLong
        val before = posCount
        val v = s.rewritePositionDeletes(table)
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("pos_delete_files_before", LongType),
            StructField("pos_delete_files_after", LongType))),
          new GenericInternalRow(Array[Any](v, before, posCount)))
      }
    }
  }

  /** `CALL g.system.set_partition_spec(table => 't', columns => 'a,b')` —
    * partition evolution, metadata-only (see TableStore.setPartitionSpec);
    * empty `columns` returns the table to unpartitioned writes. */
  private def setPartitionSpec(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "set_partition_spec"
    override def description(): String =
      "change the partition spec for future writes (metadata-only, Iceberg partition evolution)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "set_partition_spec"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("columns", StringType).defaultValue("''").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val v = store.setPartitionSpec(table, cols)
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("partition_spec", StringType))),
          new GenericInternalRow(Array[Any](v,
            org.apache.spark.unsafe.types.UTF8String.fromString(cols.mkString(",")))))
      }
    }
  }

  private def rollbackToVersion(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rollback_to_version"
    override def description(): String =
      "make an earlier snapshot current again (metadata-only; history kept)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rollback_to_version"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("version", LongType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val target = input.getLong(1)
        val s = store
        val v = s.rollbackTo(table, target)
        result(
          StructType(Seq(StructField("previous_version", LongType),
            StructField("restored_version", LongType),
            StructField("new_version", LongType))),
          new GenericInternalRow(Array[Any](v - 1, target, v)))
      }
    }
  }

  /** `CALL g.system.analyze_table(table => 't')` — compute snapshot-scoped
    * per-column statistics (null counts + deterministic KMV NDV), served
    * by the `t$stats` metadata table with explicit staleness (Iceberg's
    * ANALYZE/Puffin shape). */
  private def analyzeTable(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "analyze_table"
    override def description(): String =
      "compute per-column null counts + NDV for the current snapshot (see t$stats)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "analyze_table"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val s = store
        val v = s.analyzeTable(table)
        val n = s.columnStats(table).map(_._3.size).getOrElse(0)
        result(
          StructType(Seq(StructField("analyzed_version", LongType),
            StructField("n_columns", LongType))),
          new GenericInternalRow(Array[Any](v, n.toLong)))
      }
    }
  }

  /** `CALL g.system.analyze_incremental(table => 't')` — O(delta) stats
    * refresh: merges the appended files' null counts, KMV registers and
    * maxFreq bound into the stored statistics instead of rescanning the
    * table; falls back to a full ANALYZE when the history was rewritten
    * (see [[TableStore.analyzeIncremental]]). */
  private def analyzeIncremental(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "analyze_incremental"
    override def description(): String =
      "merge appended files' statistics into t$stats without a full rescan"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "analyze_incremental"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val s = store
        val v = s.analyzeIncremental(table)
        val n = s.columnStats(table).map(_._3.size).getOrElse(0)
        result(
          StructType(Seq(StructField("analyzed_version", LongType),
            StructField("n_columns", LongType))),
          new GenericInternalRow(Array[Any](v, n.toLong)))
      }
    }
  }

  /** `CALL g.system.consistent_cut(tables => 'fact,dim')` — the SQL face
    * of [[TableStore.consistentVersions]]: one row per table with the
    * pinned version of a snapshot-isolated cut (all-or-none of every
    * transaction's ops); read the cut with `VERSION AS OF`. */
  private def consistentCut(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "consistent_cut"
    override def description(): String =
      "pin a snapshot-isolated multi-table read cut (read via VERSION AS OF)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "consistent_cut"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tables", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tables = input.getUTF8String(0).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val cut = store.consistentVersions(tables)
        val schema = StructType(Seq(StructField("table_name", StringType),
          StructField("version", LongType)))
        val rows = cut.toSeq.sortBy(_._1).map { case (t, v) =>
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(t), v))
            : InternalRow
        }
        results(schema, rows)
      }
    }
  }

  /** `CALL g.system.refresh_index(source => 'docs', index => 'docs_idx',
    * id_col => 'doc_id', text_col => 'text')` — incremental inverted-index
    * maintenance: postings of the source's snapshot delta are appended to
    * the token-clustered index table (O(delta); falls back to an explicit
    * full rebuild over a rewritten history). See
    * [[graft.ext.Search.refreshIndex]]. */
  private def refreshIndex(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "refresh_index"
    override def description(): String =
      "append the source snapshot delta's postings to an inverted-index table"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "refresh_index"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("index", StringType).build(),
        ProcedureParameter.in("id_col", StringType).build(),
        ProcedureParameter.in("text_col", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (v, rows, mode) = graft.ext.Search.refreshIndex(store,
          input.getUTF8String(0).toString, input.getUTF8String(1).toString,
          input.getUTF8String(2).toString, input.getUTF8String(3).toString)
        result(
          StructType(Seq(StructField("source_version", LongType),
            StructField("delta_rows", LongType),
            StructField("mode", StringType))),
          new GenericInternalRow(Array[Any](v, rows,
            org.apache.spark.unsafe.types.UTF8String.fromString(mode))))
      }
    }
  }

  /** `CALL g.system.add_files(table => 't', source => '/path/to/parquet')`
    * — adopt existing parquet files as a snapshot without copying them
    * (Iceberg's `add_files`/`migrate`): one manifest write brings an
    * already-parquet corpus under table management, stats-harvested and
    * prunable, regardless of its size. */
  private def addFiles(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "add_files"
    override def description(): String =
      "adopt existing parquet files as a snapshot without copying (metadata-only migrate)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "add_files"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("source", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val source = input.getUTF8String(1).toString
        val s = store
        val before = s.manifests(table).lastOption.map(_.files.size).getOrElse(0)
        val v = s.addFiles(table, source)
        val m = s.manifests(table).maxBy(_.version)
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("files_added", LongType),
            StructField("row_count", LongType))),
          new GenericInternalRow(Array[Any](v,
            (m.files.size - before).toLong, m.rowCount)))
      }
    }
  }

  /** `CALL g.system.add_check_constraint(table => 't', name => 'c',
    * predicate => 'x > 0')` — Delta-style CHECK constraint: existing rows
    * are validated first, then every write path enforces the predicate
    * per row inside the write job. */
  private def addCheckConstraint(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "add_check_constraint"
    override def description(): String =
      "add a named CHECK predicate enforced on every row written"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "add_check_constraint"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("predicate", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val cname = input.getUTF8String(1).toString
        val pred = input.getUTF8String(2).toString
        val s = store
        val v = s.addCheckConstraint(table, cname, pred)
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("n_constraints", LongType))),
          new GenericInternalRow(Array[Any](v,
            s.checkConstraints(table).size.toLong)))
      }
    }
  }

  /** `CALL g.system.set_write_order(table => 't', columns => 'a,b')` —
    * Iceberg's `WRITE ORDERED BY`: every subsequent data-writing commit
    * range-clusters and sorts on the columns (empty string clears). */
  private def setWriteOrder(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "set_write_order"
    override def description(): String =
      "declare a standing write sort order applied by every subsequent write"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "set_write_order"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("columns", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val s = store
        val v = s.setWriteOrder(table, cols)
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("write_order", StringType))),
          new GenericInternalRow(Array[Any](v,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              s.writeOrderOf(table).mkString(",")))))
      }
    }
  }

  /** Branch refs: `CALL create_branch(table => 't', name => 'b')` /
    * `fast_forward` / `drop_branch` — the multi-commit write-audit-
    * publish: commits accumulate on the branch, main is untouched until
    * fast_forward publishes the chain (metadata-only; refuses if main
    * diverged from the fork base). */
  private def createBranch(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "create_branch"
    override def description(): String = "fork a writable branch from the current (or given) snapshot"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "create_branch"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("from_version", LongType)
          .defaultValue("-1").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val bname = input.getUTF8String(1).toString
        val from = input.getLong(2)
        val s = store
        s.createBranch(table, bname, from)
        result(
          StructType(Seq(StructField("branch", StringType),
            StructField("fork_version", LongType))),
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(bname),
            if (from < 0) s.currentVersion(table) else from)))
      }
    }
  }

  private def fastForward(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "fast_forward"
    override def description(): String =
      "publish a branch's commits as main versions (refuses if main diverged)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "fast_forward"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val bname = input.getUTF8String(1).toString
        val s = store
        val before = s.currentVersion(table)
        val v = s.fastForward(table, bname)
        result(
          StructType(Seq(StructField("previous_version", LongType),
            StructField("current_version", LongType),
            StructField("commits_published", LongType))),
          new GenericInternalRow(Array[Any](before, v, v - before)))
      }
    }
  }

  private def dropBranch(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "drop_branch"
    override def description(): String = "drop a branch ref and its own data files"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "drop_branch"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val bname = input.getUTF8String(1).toString
        store.dropBranch(table, bname)
        result(
          StructType(Seq(StructField("dropped", StringType))),
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(bname))))
      }
    }
  }

  /** Persisted SQL views: `CALL create_view(name => 'v', sql => '...')`
    * stores the SQL in the warehouse AND registers a session temp view
    * (so `SELECT * FROM v` works immediately); `sync_views()` hydrates
    * every persisted view into a fresh session; `drop_view` removes
    * both. See [[GraftViews]] for why DDL goes through procedures. */
  private def createView(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "create_view"
    override def description(): String =
      "persist a SQL view and register it in this session"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "create_view"
      override def description(): String = "graft view procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("sql", StringType).build(),
        ProcedureParameter.in("replace", BooleanType)
          .defaultValue("false").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val vname = input.getUTF8String(0).toString
        val sql = input.getUTF8String(1).toString
        val replace = input.getBoolean(2)
        val spark = org.apache.spark.sql.SparkSession.active
        val wh = store.warehouse
        GraftViews.create(spark, wh, vname, sql, replace)
        GraftViews.register(spark, wh, vname)
        result(
          StructType(Seq(StructField("view", StringType))),
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(vname))))
      }
    }
  }

  /** `CALL clone_table(source => 's', target => 't')` — zero-copy clone
    * (Delta SHALLOW CLONE): one manifest write referencing the source's
    * files by absolute URI; the clone evolves independently and its
    * maintenance never deletes borrowed source files. */
  private def cloneTable(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "clone_table"
    override def description(): String =
      "zero-copy shallow clone of a table's current snapshot"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "clone_table"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("target", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val src = input.getUTF8String(0).toString
        val tgt = input.getUTF8String(1).toString
        val s = store
        s.cloneTable(src, tgt)
        val m = s.manifests(tgt).maxBy(_.version)
        result(
          StructType(Seq(StructField("target", StringType),
            StructField("files_referenced", LongType),
            StructField("row_count", LongType))),
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(tgt),
            m.files.size.toLong, m.rowCount)))
      }
    }
  }

  private def dropView(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "drop_view"
    override def description(): String = "drop a persisted view (and its session registration)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "drop_view"
      override def description(): String = "graft view procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("name", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val vname = input.getUTF8String(0).toString
        val spark = org.apache.spark.sql.SparkSession.active
        val dropped = GraftViews.drop(spark, store.warehouse, vname)
        result(
          StructType(Seq(StructField("dropped", BooleanType))),
          new GenericInternalRow(Array[Any](dropped)))
      }
    }
  }

  private def syncViews(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "sync_views"
    override def description(): String =
      "register every persisted view into this session"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "sync_views"
      override def description(): String = "graft view procedure"
      override def parameters(): Array[ProcedureParameter] = Array.empty
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val spark = org.apache.spark.sql.SparkSession.active
        val names = GraftViews.registerAll(spark, store.warehouse)
        result(
          StructType(Seq(StructField("n_views", LongType),
            StructField("views", StringType))),
          new GenericInternalRow(Array[Any](names.size.toLong,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              names.mkString(",")))))
      }
    }
  }

  private def dropCheckConstraint(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "drop_check_constraint"
    override def description(): String = "drop a named CHECK constraint (metadata-only)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "drop_check_constraint"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val cname = input.getUTF8String(1).toString
        val s = store
        val v = s.dropCheckConstraint(table, cname)
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("n_constraints", LongType))),
          new GenericInternalRow(Array[Any](v,
            s.checkConstraints(table).size.toLong)))
      }
    }
  }

  private def removeOrphanFiles(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "remove_orphan_files"
    override def description(): String =
      "delete data files referenced by no manifest (failed-commit orphans) older than a threshold"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "remove_orphan_files"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue((3L * 24 * 3600 * 1000).toString).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val olderThan = input.getLong(1)
        val removed = store.removeOrphanFiles(table, olderThan)
        result(
          StructType(Seq(StructField("orphans_removed", LongType))),
          new GenericInternalRow(Array[Any](removed.size.toLong)))
      }
    }
  }

  private def rewriteSorted(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rewrite_sorted"
    override def description(): String =
      "rewrite the current snapshot range-clustered + sorted on columns so stat pruning skips files"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rewrite_sorted"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("sort_columns", StringType).build(), // comma-separated
        ProcedureParameter.in("target_file_bytes", LongType)
          .defaultValue("134217728").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val target = input.getLong(2)
        val s = store
        val before = s.manifests(table).maxBy(_.version).files.size.toLong
        val v = s.rewriteSorted(table, cols, target)
        val after = s.manifests(table).maxBy(_.version).files.size.toLong
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("files_before", LongType), StructField("files_after", LongType))),
          new GenericInternalRow(Array[Any](v, before, after)))
      }
    }
  }

  private def rewriteZOrder(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rewrite_zorder"
    override def description(): String =
      "rewrite the current snapshot clustered on the z-curve of several columns (multi-dim pruning)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rewrite_zorder"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("zorder_columns", StringType).build(), // comma-separated
        ProcedureParameter.in("target_file_bytes", LongType)
          .defaultValue("134217728").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val target = input.getLong(2)
        val s = store
        val before = s.manifests(table).maxBy(_.version).files.size.toLong
        val v = s.rewriteZOrder(table, cols, targetFileBytes = target)
        val after = s.manifests(table).maxBy(_.version).files.size.toLong
        result(
          StructType(Seq(StructField("version", LongType),
            StructField("files_before", LongType), StructField("files_after", LongType))),
          new GenericInternalRow(Array[Any](v, before, after)))
      }
    }
  }

  private def publishStaged(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "publish_staged"
    override def description(): String =
      "publish a write-audit-publish staged snapshot (metadata-only fast-append cherry-pick)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "publish_staged"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("stage_id", StringType).build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val stageId = input.getUTF8String(1).toString
        val v = store.publishStaged(table, stageId)
        result(
          StructType(Seq(StructField("published_version", LongType))),
          new GenericInternalRow(Array[Any](v)))
      }
    }
  }

  private def expireSnapshots(store: => TableStore): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "expire_snapshots"
    override def description(): String = "delete manifests and unreferenced files of old snapshots"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "expire_snapshots"
      override def description(): String = "graft maintenance procedure"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("keep_last", IntegerType).defaultValue("1").build(),
        // epoch millis; snapshots at/after this instant are retained
        // (Iceberg's older_than axis — composes with keep_last)
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue(Long.MaxValue.toString + "L").build())
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val table = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        val s = store
        s.expireSnapshots(table, keep, input.getLong(2))
        result(
          StructType(Seq(StructField("current_version", LongType),
            StructField("snapshots_remaining", LongType))),
          new GenericInternalRow(Array[Any](s.currentVersion(table),
            s.manifests(table).size.toLong)))
      }
    }
  }
}
