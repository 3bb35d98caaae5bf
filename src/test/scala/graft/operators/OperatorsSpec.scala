package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfBackward attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3")
    ).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:20"), 105.0), // equal-ts must match t2
      (2L, ts("2024-01-01 10:00:30"), 50.0)   // after t3 → no match
    ).toDF("key", "ts", "px")
    val out = AsOfJoin.asOfBackward(trades, quotes, "key", "ts", "ts")
      .select(col("trade"), col("px"))
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map("t1" -> Some(100.0), "t2" -> Some(105.0), "t3" -> None))
  }

  test("asOfBackward equals a naive per-row lookup on fixture events") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val got = AsOfJoin.asOfBackward(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        purchases, "user_id", "ts", "ts")
      .select(col("event_id"), col("value")).as[(Long, Option[Double])]
      .collect().toMap
    // naive oracle via collect (test-only)
    val ps = purchases.as[(Long, java.sql.Timestamp, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    val evs = ev.select(col("event_id"), col("user_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
    evs.foreach { case (eid, uid, t) =>
      val expect = ps.get(uid).flatMap(
        _.takeWhile(_._2.getTime <= t.getTime).lastOption).map(_._3)
      assert(got(eid) == expect, s"event $eid")
    }
  }

  test("sessionizeBatch splits on gaps and numbers sessions per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 12:00:00")), // >30min gap → session 2
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val out = AsOfJoin.sessionizeBatch(ev, "user_id", "ts", gapSeconds = 1800)
      .select(col("user_id"), col("ts"), col("session_seq"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map { case (u, t, s) => (u, t.toString.substring(11, 16), s) }.toSet
    assert(out == Set((1L, "10:00", 1L), (1L, "10:10", 1L),
      (1L, "12:00", 2L), (2L, "09:00", 1L)))
  }

  test("saltedJoin is row-identical to the plain join") {
    val fact = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val dim = Seq((0, "zero"), (1, "one"), (2, "two"), (3, "unused"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .as[(Int, Long, String)].collect().sorted.toSeq
    val salted = SkewTools.saltedJoin(fact, dim, "k", salts = 8, saltBy = col("v"))
      .select("k", "v", "name").as[(Int, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }
}
