package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify each key's event stream onto a
  * fixed bucket grid and carry the last observation forward (LOCF) into
  * the gaps — the feature-engineering step that turns irregular event
  * logs into a model-ready regular series (Flink's `FILL`, QuestDB's
  * `SAMPLE BY ... FILL(PREV)`).
  *
  * Scale shape: the grid is generated PER KEY from that key's own
  * [min, max] bucket span (`sequence` + `explode` — a narrow,
  * partition-local expansion; no global calendar frame is ever
  * materialized or cross-joined). One (key, bucket) left join against
  * the observed aggregates, then a running `last(ignoreNulls)` window
  * per key — Spark's window evaluates it in one pass over each key's
  * grid, state = one value. Keys are independent: partitions by key,
  * no global sort.
  */
object GapFill {

  /** Per-(`keyCol`, bucket) aggregate of `valueCol` (long sum + count)
    * on a `bucketExpr` grid (e.g. `date_trunc("hour", ts)`), gaps
    * filled: `n_events = 0`, `v_locf` = previous bucket's value sum.
    * Leading gaps (before a key's first observation) cannot exist since
    * the grid starts at the key's first bucket. */
  def locf(df: DataFrame, keyCol: String, tsCol: String,
      bucketUnit: String, value: org.apache.spark.sql.Column): DataFrame = {
    val bucket = date_trunc(bucketUnit, col(tsCol))
    val step = expr(s"INTERVAL 1 $bucketUnit")
    val observed = df
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__sum"))
    val grid = df
      .groupBy(col(keyCol))
      .agg(min(bucket).as("__lo"), max(bucket).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), step)).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__sum"), ignoreNulls = true).over(w).as("v_locf"))
  }
}
