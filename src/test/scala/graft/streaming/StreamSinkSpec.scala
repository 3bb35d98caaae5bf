package graft.streaming

import graft.SparkSpec
import graft.core.TableStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming writes INTO the table format: `df.writeStream.toTable` against
  * a GraftCatalog table appends one snapshot per micro-batch epoch, with the
  * (queryId, epochId) exactly-once ledger stamped in each manifest so a
  * restarted query that replays a committed epoch no-ops instead of
  * double-appending (Iceberg's Spark sink semantics).
  */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(f: (TableStore, String) => Unit): Unit = {
    val wh = tmpDir("graft_sink")
    val cat = s"gsink${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(new TableStore(spark, wh), cat)
  }

  test("writeStream.toTable appends one epoch-stamped snapshot per batch") {
    withCatalog { (store, cat) =>
      spark.sql(s"CREATE TABLE $cat.ns.sink (id BIGINT, s STRING)")
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val q = in.toDF().toDF("id", "s")
        .writeStream.option("checkpointLocation", tmpDir("ck"))
        .toTable(s"$cat.ns.sink")
      try {
        in.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        in.addData((3L, "c"))
        q.processAllAvailable()
        assert(spark.table(s"$cat.ns.sink").as[(Long, String)].collect().toSet ==
          Set((1L, "a"), (2L, "b"), (3L, "c")))
        val ms = store.manifests("sink")
        val epochs = ms.filter(_.operation == "stream-append").flatMap(_.streamEpoch)
        assert(epochs.map(_._2).sorted == Seq(0L, 1L))
        assert(epochs.map(_._1).distinct.size == 1) // one stable query id
        // appends are cumulative: batch-written rows stay readable
        assert(store.read("sink").count() == 3)
      } finally q.stop()
    }
  }

  test("a replayed epoch is a no-op: the store-level exactly-once ledger") {
    withCatalog { (store, cat) =>
      store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
      val schema = store.read("t").schema.json
      def stage(rows: Seq[(Long, String)]): Seq[(Path, String)] = {
        val dir = tmpDir("stage")
        rows.toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(dir)
        val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.listStatus(new Path(dir)).filter(_.getPath.getName.endsWith(".parquet"))
          .toSeq.map(s => (s.getPath, s.getPath.getName))
      }
      val kept = store.manifests("t").last.files
      val v1 = store.commitStaged("t", kept, stage(Seq((2L, "b"))),
        "stream-append", schema, Some(("qid-A", 0L)))
      // the restarted query re-runs epoch 0: same query id, same epoch
      val v2 = store.commitStaged("t", store.manifests("t").last.files,
        stage(Seq((2L, "b"))), "stream-append", schema, Some(("qid-A", 0L)))
      assert(v2 == v1)                        // no new snapshot
      assert(store.read("t").count() == 2)    // no duplicate rows
      // a LATER epoch from the same query commits normally
      val v3 = store.commitStaged("t", store.manifests("t").last.files,
        stage(Seq((3L, "c"))), "stream-append", schema, Some(("qid-A", 1L)))
      assert(v3 == v1 + 1 && store.read("t").count() == 3)
      // a different query's epoch 0 is independent (no cross-query dedup)
      val v4 = store.commitStaged("t", store.manifests("t").last.files,
        stage(Seq((4L, "d"))), "stream-append", schema, Some(("qid-B", 0L)))
      assert(v4 == v3 + 1 && store.read("t").count() == 4)
      assert(store.lastStreamEpoch("t", "qid-A").contains(1L))
      assert(store.lastStreamEpoch("t", "qid-B").contains(0L))
    }
  }

  test("applyCdcMoR: upserts + deletes land as one atomic snapshot") {
    withCatalog { (store, _) =>
      store.commit("t",
        Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "s", "v"),
        "create")
      val v0 = store.currentVersion("t")
      // one batch: update id=1, insert id=4, delete id=2
      val cdc = Seq((1L, "a2", 10.0, false), (4L, "d", 4.0, false),
        (2L, "b", 0.0, true)).toDF("id", "s", "v", "_deleted")
      store.applyCdcMoR("t", cdc, Seq("id"), "_deleted")
      assert(store.currentVersion("t") == v0 + 1) // ONE commit for the batch
      assert(store.read("t").as[(Long, String, Double)].collect().toSet ==
        Set((1L, "a2", 10.0), (3L, "c", 3.0), (4L, "d", 4.0)))
      val m = store.manifests("t").maxBy(_.version)
      assert(m.operation == "cdc_mor" && m.deleteFiles.nonEmpty)
    }
  }

  test("upsertMoRSink streams CDC batches exactly-once into the store") {
    withCatalog { (store, _) =>
      store.commit("t",
        Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v"), "create")
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String, Double, Boolean)]
      val q = graft.streaming.CdcStream.upsertMoRSink(
        in.toDF().toDF("id", "s", "v", "_deleted"), store, "t",
        Seq("id"), "_deleted", tmpDir("ck"))
      try {
        in.addData((1L, "a2", 10.0, false), (3L, "c", 3.0, false))
        q.processAllAvailable()
        in.addData((2L, "b", 0.0, true))
        q.processAllAvailable()
        assert(store.read("t").as[(Long, String, Double)].collect().toSet ==
          Set((1L, "a2", 10.0), (3L, "c", 3.0)))
        // each epoch committed once, under one stable query id
        val epochs = store.manifests("t")
          .filter(_.operation == "cdc_mor").flatMap(_.streamEpoch)
        assert(epochs.map(_._2).sorted == Seq(0L, 1L))
        assert(epochs.map(_._1).distinct == Seq(q.id.toString))
        // a replayed epoch (same qid, batch 1) no-ops at the store layer
        val v = store.currentVersion("t")
        store.applyCdcMoR("t",
          Seq((2L, "b", 0.0, true)).toDF("id", "s", "v", "_deleted"),
          Seq("id"), "_deleted", Some((q.id.toString, 1L)))
        assert(store.currentVersion("t") == v)
      } finally q.stop()
    }
  }

  test("streaming writes into a partitioned table land in the partition layout") {
    withCatalog { (store, cat) =>
      spark.sql(s"CREATE TABLE $cat.ns.psink (id BIGINT, k STRING) " +
        "PARTITIONED BY (k)")
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val q = in.toDF().toDF("id", "k")
        .writeStream.option("checkpointLocation", tmpDir("ck"))
        .toTable(s"$cat.ns.psink")
      try {
        in.addData((1L, "x"), (2L, "y"), (3L, "x"))
        q.processAllAvailable()
      } finally q.stop()
      val files = store.manifests("psink").last.files
      assert(files.nonEmpty &&
        files.forall(_.partitionValues.exists(_._1 == "k")))
      // partition-exact pruning works on stream-written files
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.psink WHERE k = 'x'")
        .head.getLong(0) == 2L)
    }
  }
}
