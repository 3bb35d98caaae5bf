package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One user's running profile snapshot — the output row of
  * [[RunningProfileProcessor]]. `n` is strictly monotone per user, so a
  * downstream exact aggregate selects the user's FINAL profile as the
  * max-`n` snapshot with no ordering assumption on the sink. `cents` is
  * the exact integer-cents running sum (no double accumulation drift —
  * the same discipline as the batch anchors' decimal sums). */
case class UserProfile(user_id: Long, n: Long, cents: Long,
    top_type: String, top_n: Long)

/** Arbitrary-state streaming through Spark 4's State API v2
  * (`transformWithState`, SPARK-46815) — the successor to
  * flatMapGroupsWithState the reference-era pipelines would migrate to:
  * typed, named, independently-evolvable state variables per key, stored
  * in the RocksDB state store provider.
  *
  * Per user: a ValueState holds the running (count, cents) pair and a
  * MapState holds per-event-type counts — two state variables with
  * different shapes under ONE operator, the thing the single-state
  * `mapGroupsWithState` API cannot express without packing everything
  * into one blob. Each micro-batch emits one UPDATED snapshot per key
  * seen in that batch (Update-mode semantics); rows within a batch fold
  * in iterator order, which is safe because every emitted field is
  * order-insensitive (counts, sums, per-type counts).
  */
class RunningProfileProcessor
    extends StatefulProcessor[Long, Event, UserProfile] {

  @transient private var totals: ValueState[(Long, Long)] = _
  @transient private var byType: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    byType = getHandle.getMapState[String, Long]("byType",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[UserProfile] = {
    var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { e =>
      n += 1
      // decimal HALF_UP on the value's shortest decimal rendering — the
      // q184 oracle sums DECIMAL(18,2): math.round(v * 100) rounds
      // half-toward-+inf on a binary double (wrong for negative
      // midpoints like -0.125) and inherits representation error for
      // >2-decimal inputs
      cents += new java.math.BigDecimal(String.valueOf(e.value))
        .movePointRight(2)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      val c =
        if (byType.containsKey(e.event_type)) byType.getValue(e.event_type)
        else 0L
      byType.updateValue(e.event_type, c + 1)
    }
    totals.update((n, cents))
    // deterministic argmax over the map: highest count, ties to the
    // lexicographically SMALLEST type name (map iteration order is a
    // store detail, never part of the result)
    val (tt, tn) = byType.iterator().reduceLeft { (a, b) =>
      if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
    }
    Iterator.single(UserProfile(key, n, cents, tt, tn))
  }
}

/** One inactivity-expiry emission: the user's running totals as of the
  * event-time timer that fired `gap` after their latest event. A user
  * who goes quiet and returns fires more than once; `expire_ts` and `n`
  * are both monotone per user, so the FINAL expiry is the max-(n,
  * expire_ts) row — (total events, last event time + gap). */
case class ExpiryEvent(user_id: Long, n: Long,
    expire_ts: java.sql.Timestamp)

/** Event-time TIMERS through the State API v2: each input batch
  * re-arms the key's single timer at (latest event time + gap); when
  * the watermark passes it, [[handleExpiredTimer]] emits the user's
  * snapshot — the "session went quiet" signal driven by the stream's
  * own clock, not wall time. State is kept (not cleared) on expiry so
  * a returning user's next expiry reports cumulative totals. */
class InactivityExpiryProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, ExpiryEvent] {

  @transient private var sess: ValueState[(Long, java.sql.Timestamp)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, java.sql.Timestamp)]("sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[ExpiryEvent] = {
    var (n, maxTs) = if (sess.exists()) sess.get()
      else (0L, null: java.sql.Timestamp)
    rows.foreach { e =>
      n += 1
      if (maxTs == null || e.ts.compareTo(maxTs) > 0) maxTs = e.ts
    }
    sess.update((n, maxTs))
    // one live timer per key: re-arm at the new frontier
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(maxTs.getTime + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[ExpiryEvent] = {
    val (n, maxTs) = sess.get()
    // microsecond-exact: gap rides on the Timestamp's millis, the
    // sub-millisecond part is carried over unchanged
    val t = new java.sql.Timestamp(maxTs.getTime + gapMs)
    t.setNanos(maxTs.getNanos)
    Iterator.single(ExpiryEvent(key, n, t))
  }
}

object StatefulOps {
  /** Running per-user profiles over an event stream — the
    * transformWithState wiring ([[RunningProfileProcessor]]). Requires
    * the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` before starting the
    * query). */
  def runningProfiles(events: Dataset[Event]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user inactivity expiry via event-time timers
    * ([[InactivityExpiryProcessor]]). `watermarkDelay` bounds lateness;
    * timers fire as the watermark passes (latest event + gap). */
  def inactivityExpiry(events: Dataset[Event], gapMinutes: Int,
      watermarkDelay: String): Dataset[ExpiryEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new InactivityExpiryProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
