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
      cents += math.round(e.value * 100)
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
}
