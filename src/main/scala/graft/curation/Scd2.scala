package graft.curation

import graft.core.{Merge, TableStore}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 SCD curation over [[TableStore]] tables (SURVEY.md §2A A7-A13).
  *
  * Reproduces the reference's three curation use cases
  * (reference/docs/README.md:90-104):
  *  - [[bulkInsert]] — full load + SCD2 columns
  *    (reference/src/data_curation/glue_jobs/pyspark_functions.py:21-31);
  *  - [[scd2Simple]] — one update per key per batch, MERGE with the
  *    merge-key staging trick (pyspark_functions.py:40-137);
  *  - [[scd2Complex]] — multiple and late-arriving updates per key
  *    (pyspark_functions.py:142-251): the version chain of affected keys is
  *    recomputed with a LEAD window and swapped in atomically.
  *
  * Plus the delta-report operators: [[latestPerKey]] dedup and the 3-branch
  * update/delete/insert CDC merge (reference/src/data_derivation/
  * athena_iceberg/python/updating_db_with_deltas_iceberg.ipynb cell 26).
  *
  * Scale: scd2Simple touches only current rows via MERGE (one shuffle);
  * scd2Complex shuffles only the *affected keys'* history (semi-join
  * pushdown), never the full table, before the commit rewrite.
  */
object Scd2 {

  /** Open-interval sentinel (pyspark_functions.py:314). */
  val SentinelTs = "2250-01-01 00:00:00"
  private def sentinel: Column = to_timestamp(lit(SentinelTs))

  /** A7: derive `start_datetime`, `end_datetime`, `is_current` for a fresh
    * (all-current) batch. */
  def withScd2Columns(df: DataFrame, tsCol: String = "extraction_timestamp"): DataFrame =
    df.withColumn("start_datetime", col(tsCol))
      .withColumn("end_datetime", sentinel)
      .withColumn("is_current", lit(true))

  /** A10: bulk insert — full load + SCD2 columns committed as a snapshot. */
  def bulkInsert(store: TableStore, table: String, fullLoad: DataFrame,
      tsCol: String = "extraction_timestamp"): Long =
    store.commit(table, withScd2Columns(fullLoad, tsCol), "bulk_insert")

  /** A11/A12: SCD2 upsert assuming ≤1 delta row per key and no late
    * arrivals (the reference's `scd2_simple`). Two-leg staged source:
    * leg A (merge_key = pk) closes the matched current row or inserts a
    * brand-new key; leg B (merge_key = NULL, only keys already tracked)
    * always lands in the NOT MATCHED branch and inserts the new version.
    */
  def scd2Simple(store: TableStore, table: String, delta: DataFrame,
      pkCol: String = "pk", tsCol: String = "extraction_timestamp"): Long = {
    val staged = stageScd2(store, table, delta, pkCol, tsCol)
    Merge.into(store, table)
      .using(staged)
      .onKeys(Seq(pkCol -> "__merge_key"), extraCondition = Some(col("is_current")))
      .withCardinalityCheck(false) // staged source is unique per merge key by construction
      .whenMatchedUpdate(
        condition = Some(Merge.source(tsCol) > col(tsCol)),
        set = Some(Map(
          "end_datetime" -> Merge.source(tsCol),
          "is_current" -> lit(false))))
      .whenNotMatchedInsert()
      .run()
  }

  private def stageScd2(store: TableStore, table: String, delta: DataFrame,
      pkCol: String, tsCol: String): DataFrame = {
    val current = store.read(table).filter(col("is_current"))
      .select(col(pkCol).as("__existing_pk")).distinct()
    val withCols = withScd2Columns(delta, tsCol)
    val legClose = withCols.withColumn("__merge_key", col(pkCol))
    val legInsert = withCols
      .join(current, col(pkCol) === col("__existing_pk"), "left_semi")
      .withColumn("__merge_key", lit(null).cast("string"))
    // Target columns are updated/inserted by name; __merge_key only joins.
    legClose.unionByName(legInsert)
  }

  /** A12/A13: SCD2 with multiple + late-arriving updates per key
    * (`scd2_complex`). The full history of *affected* keys is unioned with
    * the delta, de-duplicated on (pk, ts), re-chained with
    * `LEAD(ts) OVER (PARTITION BY pk ORDER BY ts)`
    * (pyspark_functions.py:219-220), and swapped in for those keys.
    * Idempotent on replayed batches and independent of delta arrival order.
    */
  def scd2Complex(store: TableStore, table: String, delta: DataFrame,
      pkCol: String = "pk", tsCol: String = "extraction_timestamp"): Long = {
    // File-level copy-on-write: files whose pk range the delta cannot touch
    // carry into the new snapshot without being read or rewritten.
    val (hitFiles, untouchedFiles) =
      store.filesHitByKeys(table, pkCol, delta.select(col(pkCol)))
    val target = store.readFiles(table, hitFiles)
    val scd2Cols = Seq("start_datetime", "end_datetime", "is_current")
    val payloadCols = target.columns.filterNot(scd2Cols.contains)

    val deltaKeys = delta.select(col(pkCol)).distinct()
    val affectedHistory = target
      .join(deltaKeys, Seq(pkCol), "left_semi")
      .select(payloadCols.map(col).toSeq: _*)
    val untouched = target.join(deltaKeys, Seq(pkCol), "left_anti")

    val versions = affectedHistory
      .unionByName(delta.select(payloadCols.map(col).toSeq: _*))
    // Replay idempotence: keep one row per (pk, ts).
    val dedupW = Window.partitionBy(col(pkCol), col(tsCol))
      .orderBy(payloadCols.map(col).toSeq: _*)
    val deduped = versions
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")

    val chainW = Window.partitionBy(col(pkCol)).orderBy(col(tsCol))
    val rechained = deduped
      .withColumn("start_datetime", col(tsCol))
      .withColumn("end_datetime",
        coalesce(lead(col(tsCol), 1).over(chainW), sentinel))
      .withColumn("is_current", col("end_datetime") === sentinel)

    store.commitFiles(table, untouchedFiles,
      Some(untouched.unionByName(rechained.select(target.columns.map(col).toSeq: _*))),
      "scd2_complex")
  }

  /** A13 dedup: latest row per key (`ROW_NUMBER() ... rn = 1` —
    * updating_db_with_deltas_iceberg.ipynb cell 26). `tieBreak` columns make
    * the pick deterministic when `orderCol` ties. */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreak.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The employees-style 3-branch CDC merge (A13): dedup to latest per key,
    * then MATCHED+deleted → DELETE, MATCHED → UPDATE, NOT MATCHED and not
    * deleted → INSERT. */
  def applyCdcDeltas(store: TableStore, table: String, delta: DataFrame,
      keyCols: Seq[String], orderCol: String,
      deletedCol: String = "record_deleted"): Long = {
    val latest = latestPerKey(delta, keyCols, orderCol)
    Merge.into(store, table)
      .using(latest)
      .on(keyCols)
      .whenMatchedDelete(Some(Merge.source(deletedCol)))
      .whenMatchedUpdate()
      .whenNotMatchedInsert(Some(!Merge.source(deletedCol)))
      .run()
  }
}
