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
}
