package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WriteOrderSpec extends SparkSpec {
  import spark.implicits._

  test("ordered writes produce range-disjoint files that prune; content unchanged") {
    val store = new TableStore(spark, tmpDir("wo"))
    store.commit("t", Seq((1L, "x")).toDF("id", "s"), "create")
    store.setWriteOrder("t", Seq("id"))
    // a shuffled batch: without write order, every file spans the full
    // id range and nothing prunes
    val batch = (2L to 401L).map(i => (i, s"s$i")).sortBy(_._2.hashCode)
      .toDF("id", "s").repartition(4)
    store.append("t", batch)
    assert(store.read("t").count() == 401)
    assert(store.read("t").select("id").as[Long].collect().sorted.toSeq ==
      (1L to 401L))
    // the new files cover narrow disjoint ranges → a point lookup skips
    // most of them
    // (AQE may coalesce the tiny batch into few output files — 2 is
    // enough to prove the ranges are disjoint and prune)
    val (kept, total) = store.prunedFileCount("t", "id", 400L, 401L)
    assert(total >= 2, s"expected at least 2 files, got $total")
    assert(kept < total, s"no pruning: $kept of $total")
    // order survives compaction's carry and applies to later appends
    store.compact("t")
    store.append("t", Seq((1000L, "z"), (500L, "y")).toDF("id", "s"))
    assert(store.writeOrderOf("t") == Seq("id"))
    assert(store.read("t").count() == 403)
  }

  test("write order validates columns and clears with empty") {
    val store = new TableStore(spark, tmpDir("wo"))
    store.commit("t", Seq((1L, "x")).toDF("id", "s"), "create")
    intercept[IllegalArgumentException] {
      store.setWriteOrder("t", Seq("nope"))
    }
    store.setWriteOrder("t", Seq("id"))
    store.setWriteOrder("t", Seq.empty)
    assert(store.writeOrderOf("t").isEmpty)
  }
}
