package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators Spark lacks as built-ins, composed from existing primitives
  * (preference (a) of the custom-operator ladder — no Catalyst surgery
  * needed because the semantics ARE expressible).
  */
object AsOfJoin {

  /** AS-OF JOIN: for every left row, attach the latest right row with
    * `rightTs <= leftTs` for the same key (backward as-of; the standard
    * point-in-time lookup for CDC/market data).
    *
    * Implementation: union the two sides with a side tag, then one window
    * `last_value(right payload, ignoreNulls) OVER (PARTITION BY key
    * ORDER BY ts, side)` — right rows at equal ts sort before left rows,
    * so exact-timestamp matches are included. ONE shuffle on the key, no
    * range cross-join, no per-key driver loop: at 100 TB this is a single
    * sort-within-partition pass, and skewed keys split via AQE.
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String): DataFrame = {
    val lCols = left.columns
    val rPayload = right.columns.filterNot(c => c == keyCol || c == rightTsCol)

    // Right payload rides as ONE struct so `last(ignoreNulls)` can never
    // mix columns from different right rows when payload fields are null.
    val lTagged = left.select(
      (col(keyCol).as("__k") +: col(leftTsCol).as("__ts") +: lit(1).as("__side") +:
        lCols.map(c => col(c).as(s"__l_$c")).toSeq :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(rPayload.map(col).toSeq: _*).schema.fields)).as("__r")): _*)
    val rTagged = right.select(
      (col(keyCol).as("__k") +: col(rightTsCol).as("__ts") +: lit(0).as("__side") +:
        lCols.map(c => lit(null).as(s"__l_$c")).toSeq :+
        struct(rPayload.map(col).toSeq: _*).as("__r")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lTagged.unionByName(rTagged)
      .select((col("__side") +:
        lCols.map(c => col(s"__l_$c")).toSeq :+
        last(col("__r"), ignoreNulls = true).over(w).as("__r")): _*)
    joined.filter(col("__side") === 1)
      .select((lCols.map(c => col(s"__l_$c").as(c)).toSeq ++
        rPayload.map(c => col(s"__r.$c").as(c)).toSeq): _*)
  }

  /** Gap-based batch sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSeconds`; session ids
    * are the running count of session starts (two windows, one shuffle).
    * The streaming equivalent is
    * [[graft.streaming.CdcStream.sessionize]]. */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev_ts")) >
            gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }
}
