package graft.streaming

import graft.core.TableStore
import graft.curation.Scd2
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String,
  value: Double)

case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
  session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

/** Per-key in-flight session state for [[CdcStream.sessionize]]. */
case class SessionState(start: Long, last: Long, n: Int, totalValue: Double)

/** Structured Streaming operators — the streaming face of the engine.
  *
  * The reference ingests CDC deltas in daily batches
  * (reference/src/data_derivation/athena_iceberg/python/
  * updating_db_with_deltas_iceberg.ipynb cells 29-37); these operators run
  * the SAME curation logic continuously: a delta stream lands in the
  * versioned [[TableStore]] through `foreachBatch`, so each micro-batch is
  * one atomic SCD2 commit and the batch/stream code paths share one
  * implementation (no dual maintenance).
  *
  * Scale notes: windowed counts and dedup carry watermarks so state is
  * bounded; sessionization keeps one small state object per active key and
  * emits on event-time timeout — the standard pattern for billions of keys
  * across executors.
  */
object CdcStream {

  /** Watermarked tumbling-window counts per event type. Works on any
    * streaming (or batch) events frame with an event-time `ts` column. */
  def windowedEventCounts(events: DataFrame, watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming dedup on a key with a watermark bounding the dedup state. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** First-occurrence streaming dedup with bounded state:
    * `dropDuplicatesWithinWatermark` emits each key's first-seen row
    * immediately (Append mode, no buffering) and GUARANTEES duplicates
    * arriving within the watermark delay of that first row are dropped;
    * the key's state is evicted once the event-time watermark passes
    * first-seen + delay, so state is bounded by the delay window — the
    * scale contract for dedup over an unbounded stream. Exact (equal to a
    * batch DISTINCT) whenever every duplicate of a key arrives within the
    * delay of its first occurrence — e.g. keys bucketed by event-time day
    * replayed in event-time order under a multi-day delay, the shape the
    * q77 anchor verifies. */
  def dedupFirstWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermark: String = "48 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Continuous CDC→SCD2 ingestion: every micro-batch is applied to the
    * versioned store with [[Scd2.scd2Complex]] (late/duplicate deltas safe,
    * replay idempotent — exactly-once effect on top of at-least-once
    * delivery) and committed atomically. */
  def streamScd2(deltas: DataFrame, store: TableStore, table: String,
      pkCol: String, tsCol: String, checkpointDir: String): StreamingQuery =
    deltas.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // foreachBatch frames are lazy — every action re-executes the
        // incremental plan, and this body takes several (isEmpty, the
        // bulk insert, the merge). Persist for the batch's lifetime.
        val batch = batch0.persist()
        try {
          if (!batch.isEmpty) {
            if (!store.exists(table)) {
              // A first batch may already carry several versions of a key
              // (CDC replay/backfill): bulk-insert only each key's EARLIEST
              // row (anything else would stamp multiple open current rows),
              // then run the regular SCD2 merge on the remainder.
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col(pkCol)).orderBy(col(tsCol))
              val withRn = batch.withColumn("__rn", row_number().over(w))
              Scd2.bulkInsert(store, table,
                withRn.filter(col("__rn") === 1).drop("__rn"), tsCol)
              val rest = withRn.filter(col("__rn") > 1).drop("__rn")
              if (!rest.isEmpty) Scd2.scd2Complex(store, table, rest, pkCol, tsCol)
            } else Scd2.scd2Complex(store, table, batch, pkCol, tsCol)
          }
        } finally { batch.unpersist(); () }
        ()
      }
      .start()

  /** Streaming CDC upsert into the table format (merge-on-read): each
    * micro-batch applies as ONE atomic O(churn) snapshot via
    * [[TableStore.applyCdcMoR]] — new images as data files plus a delete
    * file masking every batch key's older images; rows with
    * `deleteCol` = true just drop their key. Nothing is ever rewritten, so
    * per-epoch cost is the churn, never the table — the CDC-ingestion
    * contract at 100 TB (Iceberg's Flink upsert sink shape). Exactly-once
    * on top of foreachBatch's at-least-once replay: every commit is
    * stamped with the stream's stable (queryId, batchId) and a replayed
    * batch no-ops inside the store. The table must already exist — schema
    * authority stays with the table, extra CDC columns are dropped. */
  def upsertMoRSink(cdc: DataFrame, store: TableStore, table: String,
      keyCols: Seq[String], deleteCol: String,
      checkpointDir: String): StreamingQuery =
    cdc.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // persist: isEmpty + the CDC apply would otherwise each re-run
        // the incremental plan (see streamScd2).
        val batch = batch0.persist()
        try {
          if (!batch.isEmpty) {
            // The stream execution thread tags itself with the query id
            // (StreamExecution.QUERY_ID_KEY) — stable across restarts, it
            // lives in checkpoint metadata, unlike the per-run runId.
            val qid = Option(batch.sparkSession.sparkContext
              .getLocalProperty("sql.streaming.queryId"))
            store.applyCdcMoR(table, batch, keyCols, deleteCol,
              qid.map((_, batchId)))
            ()
          }
        } finally { batch.unpersist(); () }
        ()
      }
      .start()

  /** Stream-stream interval join: enrich each left event with right-side
    * events of the same key whose timestamp falls within
    * [left.ts − lookback, left.ts]. Both sides carry watermarks, so the
    * join state is bounded — Spark retains right rows only until
    * `left watermark − lookback` passes them (the canonical bounded-state
    * stream-stream join; billions of keys spread across executors). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, lookback: String, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
    val r0 = right.withWatermark(tsCol, watermark)
    val r = r0.select(r0.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
    // "leftOuter" additionally emits each unmatched left row (right
    // columns null) once the watermark passes the row's match horizon —
    // the event-time condition bounds when a match can still arrive, so
    // Spark can prove a left row unmatched and evict it; emission
    // happens in the micro-batch AFTER the watermark advance, so a
    // bounded replay must push the watermark past the data and then run
    // one more batch to flush the tail.
    l.join(r,
      col(keyCol) === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $lookback") &&
        col(s"r_$tsCol") <= col(tsCol),
      joinType)
  }

  /** Event-time sessionization with a `gap` inactivity timeout via
    * `flatMapGroupsWithState` — one state object per active user, emitted
    * when the watermark passes last-event + gap.
    *
    * Gap comparisons run at MICROsecond precision (Spark's timestamp
    * resolution) — `Timestamp.getTime` is millis and silently truncates,
    * so a gap within 1 ms of the threshold would split sessions
    * differently from an exact (batch SQL) sessionization. */
  def sessionize(events: Dataset[Event], gapMinutes: Int,
      watermark: String = "10 minutes")(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, fromMicros(s.start),
              fromMicros(s.last), s.n, s.totalValue))
          } else {
            val evs = rows.toSeq.sortBy(e => micros(e.ts))
            var out = List.empty[SessionOut]
            var st = state.getOption
            evs.foreach { e =>
              val t = micros(e.ts)
              st match {
                case Some(s) if t - s.last <= gapUs =>
                  st = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) => // gap exceeded → close previous session
                  out ::= SessionOut(userId, fromMicros(s.start),
                    fromMicros(s.last), s.n, s.totalValue)
                  st = Some(SessionState(t, t, 1, e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              // The event-time timeout contract is millisecond-based:
              // round UP so the timer never fires a microsecond early.
              state.setTimeoutTimestamp(
                math.floorDiv(s.last + gapUs + 999L, 1000L))
            }
            out.reverseIterator
          }
      }
  }
}
