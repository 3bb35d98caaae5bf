package graft.streaming

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streamScd2: micro-batched CDC deltas build the same SCD2 chain as batch") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, tmpDir("stream"))
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val deltas = mem.toDF().toDF("pk", "qty", "extraction_timestamp")

    val q = CdcStream.streamScd2(deltas, store, "t", "pk",
      "extraction_timestamp", tmpDir("ckpt"))
    try {
      mem.addData(("A", 1, ts("2022-01-01 00:00:00")),
        ("B", 1, ts("2022-01-01 00:00:00")))
      q.processAllAvailable()
      mem.addData(("A", 3, ts("2022-03-01 00:00:00")))
      q.processAllAvailable()
      // late-arriving delta in a later micro-batch
      mem.addData(("A", 2, ts("2022-02-01 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val out = store.read("t")
      .select(col("pk"), col("qty"),
        date_format(col("start_datetime"), "yyyy-MM-dd").as("s"),
        date_format(col("end_datetime"), "yyyy-MM-dd").as("e"),
        col("is_current"))
      .as[(String, Int, String, String, Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq(
      ("A", 1, "2022-01-01", "2022-02-01", false),
      ("A", 2, "2022-02-01", "2022-03-01", false),
      ("A", 3, "2022-03-01", "2250-01-01", true),
      ("B", 1, "2022-01-01", "2250-01-01", true)))
  }

  test("streamScd2: first batch with several versions of a key keeps one current row") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, tmpDir("stream"))
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val deltas = mem.toDF().toDF("pk", "qty", "extraction_timestamp")

    val q = CdcStream.streamScd2(deltas, store, "t", "pk",
      "extraction_timestamp", tmpDir("ckpt"))
    try {
      // CDC replay: three versions of A and one of B in the FIRST batch
      mem.addData(("A", 1, ts("2022-01-01 00:00:00")),
        ("A", 2, ts("2022-02-01 00:00:00")),
        ("A", 3, ts("2022-03-01 00:00:00")),
        ("B", 9, ts("2022-01-15 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val out = store.read("t")
      .select(col("pk"), col("qty"),
        date_format(col("start_datetime"), "yyyy-MM-dd").as("s"),
        col("is_current"))
      .as[(String, Int, String, Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(out == Seq(
      ("A", 1, "2022-01-01", false),
      ("A", 2, "2022-02-01", false),
      ("A", 3, "2022-03-01", true),
      ("B", 9, "2022-01-15", true)))
    // exactly one current row per key
    val current = store.read("t").filter(col("is_current"))
      .groupBy(col("pk")).count().as[(String, Long)].collect().toMap
    assert(current == Map("A" -> 1L, "B" -> 1L))
  }

  test("windowedEventCounts aggregates per tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val counts = CdcStream.windowedEventCounts(events, "5 minutes", "1 hour")
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
        (2L, ts("2024-01-01 10:45:00"), "click", 2.0),
        (3L, ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wc")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n_events")).as[(String, String, Long)]
      .collect().toSet
    assert(rows == Set(("10:00", "click", 2L), ("11:00", "view", 1L)))
  }

  test("sessionize closes sessions after the gap and counts events") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = CdcStream.sessionize(mem.toDS(), gapMinutes = 30, "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1L, ts("2024-01-01 10:00:00"), "click", 1.0),
        Event(1L, ts("2024-01-01 10:10:00"), "view", 2.0),
        Event(2L, ts("2024-01-01 10:00:00"), "click", 4.0))
      q.processAllAvailable()
      // events far past the watermark close user 1's and user 2's sessions
      mem.addData(Event(3L, ts("2024-01-01 23:00:00"), "click", 9.0))
      q.processAllAvailable()
      mem.addData(Event(3L, ts("2024-01-02 10:00:00"), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess")
      .select(col("user_id"), col("n_events"), col("total_value"))
      .as[(Long, Int, Double)].collect().toSet
    assert(rows.contains((1L, 2, 3.0)), s"got $rows")
    assert(rows.contains((2L, 1, 4.0)), s"got $rows")
  }

  test("intervalJoin enriches left events with recent right events per key") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = CdcStream.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "page"),
      buys.toDF().toDF("user_id", "ts", "amount"),
      "user_id", "ts", lookback = "30 minutes", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      buys.addData((1L, ts("2024-01-01 10:00:00"), 50.0),
        (1L, ts("2024-01-01 08:00:00"), 99.0), // outside the 30 min lookback
        (2L, ts("2024-01-01 10:05:00"), 10.0)) // other key
      clicks.addData((1L, ts("2024-01-01 10:10:00"), "checkout"))
      q.processAllAvailable()
      // advance both watermarks far enough to emit
      buys.addData((9L, ts("2024-01-01 12:00:00"), 0.0))
      clicks.addData((9L, ts("2024-01-01 12:00:00"), "x"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("ij")
      .select(col("user_id"), col("page"), col("r_amount"))
      .as[(Long, String, Double)].collect().toSet
    assert(out.contains((1L, "checkout", 50.0)))
    assert(!out.exists(r => r._3 == 99.0 || r._3 == 10.0))
  }

  test("dedupStream drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "payload")
    val q = CdcStream.dedupStream(events, Seq("event_id"), "5 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), "a"),
        (1L, ts("2024-01-01 10:00:00"), "a"),
        (2L, ts("2024-01-01 10:01:00"), "b"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("dd").count() == 2)
  }
}
