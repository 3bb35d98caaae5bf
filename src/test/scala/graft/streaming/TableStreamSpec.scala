package graft.streaming

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** Streaming reads OF the table format: `spark.readStream.table` over a
  * GraftCatalog table — each micro-batch is the file delta between two
  * committed versions (offsets are versions, checkpointed exactly-once).
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(f: (TableStore, String) => Unit): Unit = {
    val wh = tmpDir("graft_stream")
    val cat = s"gstream${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(new TableStore(spark, wh), cat)
  }

  test("readStream.table streams committed snapshots as micro-batches") {
    withCatalog { (store, cat) =>
      store.commit("t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "create")
      val q = spark.readStream.table(s"$cat.ns.t")
        .writeStream.format("memory").queryName(s"${cat}_sink")
        .option("checkpointLocation", tmpDir("ck")).start()
      try {
        q.processAllAvailable()
        assert(spark.table(s"${cat}_sink").as[(Long, String)].collect().toSet ==
          Set((1L, "a"), (2L, "b"))) // initial snapshot = first batch
        store.append("t", Seq((3L, "c")).toDF("id", "s"))
        store.append("t", Seq((4L, "d")).toDF("id", "s"))
        q.processAllAvailable()
        assert(spark.table(s"${cat}_sink").as[(Long, String)].collect().toSet ==
          Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
        // no new commits → no new rows (no re-emission)
        q.processAllAvailable()
        assert(spark.table(s"${cat}_sink").count() == 4)
      } finally q.stop()
    }
  }

  test("streaming filter prunes files and columns through the same scan path") {
    withCatalog { (store, cat) =>
      store.commit("t", Seq((1L, "a", 10.0)).toDF("id", "s", "v"), "create")
      val q = spark.readStream.table(s"$cat.ns.t")
        .filter(col("id") > 1L).select(col("id"), col("s"))
        .writeStream.format("memory").queryName(s"${cat}_f")
        .option("checkpointLocation", tmpDir("ck")).start()
      try {
        q.processAllAvailable()
        store.append("t", Seq((2L, "b", 20.0), (0L, "z", 0.0)).toDF("id", "s", "v"))
        q.processAllAvailable()
        assert(spark.table(s"${cat}_f").as[(Long, String)].collect().toSet ==
          Set((2L, "b")))
      } finally q.stop()
    }
  }

  test("copy-on-write snapshot fails the stream unless skipRewrites") {
    withCatalog { (store, cat) =>
      store.commit("t", (1 to 50).map(i => (i.toLong, s"x$i")).toDF("id", "s"),
        "create")
      // default: compaction mid-stream is an error (rows would re-emit)
      val q1 = spark.readStream.table(s"$cat.ns.t")
        .writeStream.format("memory").queryName(s"${cat}_s1")
        .option("checkpointLocation", tmpDir("ck")).start()
      try {
        q1.processAllAvailable()
        store.append("t", Seq((51L, "y")).toDF("id", "s"))
        store.compact("t")
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.processAllAvailable()
        }
        assert(e.getMessage.contains("non-append") ||
          Option(e.getCause).exists(_.getMessage.contains("non-append")))
      } finally q1.stop()

      // skipRewrites: the stream survives, emits the append, skips the
      // compaction's rewritten files (no duplicate rows)
      val q2 = spark.readStream.option("skipRewrites", "true")
        .table(s"$cat.ns.t")
        .writeStream.format("memory").queryName(s"${cat}_s2")
        .option("checkpointLocation", tmpDir("ck")).start()
      try {
        q2.processAllAvailable()
        assert(spark.table(s"${cat}_s2").count() == 51) // 50 + append, once
        store.append("t", Seq((52L, "z")).toDF("id", "s"))
        q2.processAllAvailable()
        assert(spark.table(s"${cat}_s2").count() == 52)
      } finally q2.stop()
    }
  }

  test("maxVersionsPerTrigger bounds each micro-batch; backlog drains completely") {
    withCatalog { (store, cat) =>
      // a 6-version backlog BEFORE the stream starts
      store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
      (2L to 6L).foreach(i =>
        store.append("t", Seq((i, s"x$i")).toDF("id", "s")))
      val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.option("maxVersionsPerTrigger", "2")
        .table(s"$cat.ns.t")
        .writeStream
        .option("checkpointLocation", tmpDir("ck"))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          batchSizes.synchronized { batchSizes += n }
          total.addAndGet(n); ()
        }
        .start()
      try {
        q.processAllAvailable()
        assert(total.get() == 6, s"backlog not fully drained: ${total.get()}")
        // 2 versions per trigger = at most 2 rows per batch here, and the
        // 6-version backlog needs at least 3 non-empty batches
        val nonEmpty = batchSizes.synchronized(batchSizes.filter(_ > 0).toSeq)
        assert(nonEmpty.size >= 3, s"backlog drained in $nonEmpty")
        assert(nonEmpty.forall(_ <= 2), s"a batch exceeded the limit: $nonEmpty")
        // steady state: one more append arrives as its own batch
        store.append("t", Seq((7L, "y")).toDF("id", "s"))
        q.processAllAvailable()
        assert(total.get() == 7)
      } finally q.stop()
    }
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches, then stops") {
    withCatalog { (store, cat) =>
      store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
      (2 to 6).foreach(i => store.append("t", Seq((i.toLong, s"x$i")).toDF("id", "s")))
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val rows = new java.util.concurrent.atomic.AtomicLong(0L)
      val ck = tmpDir("ck_an")
      def drain(): Unit = {
        val q = spark.readStream
          .option("maxVersionsPerTrigger", "2")
          .table(s"$cat.ns.t")
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val n = df.count()
            if (n > 0) batches.incrementAndGet()
            rows.addAndGet(n)
            ()
          }
          .option("checkpointLocation", ck).start()
        // must terminate BY ITSELF once the pinned backlog drains
        assert(q.awaitTermination(120000), "AvailableNow query did not stop")
      }
      drain()
      assert(rows.get() == 6, s"expected full drain, got ${rows.get()}")
      assert(batches.get() >= 3,
        s"expected >=3 rate-limited batches, got ${batches.get()}")
      // re-run on the SAME checkpoint: exactly-once — nothing re-emits
      drain()
      assert(rows.get() == 6, s"re-run re-emitted: ${rows.get()}")
      // a new commit, then a third run: only the delta arrives
      store.append("t", Seq((7L, "g")).toDF("id", "s"))
      drain()
      assert(rows.get() == 7, s"delta drain wrong: ${rows.get()}")
    }
  }
}
