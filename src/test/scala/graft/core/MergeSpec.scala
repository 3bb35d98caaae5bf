package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("merge"))

  test("3-branch merge: update + delete + insert in one pass") {
    val store = freshStore()
    store.commit("emp",
      Seq((1, "ann", 10), (2, "bob", 10), (5, "eve", 20))
        .toDF("id", "name", "dept"), "create")
    val delta = Seq(
      (1, "ann", 10, true),   // matched + deleted flag → DELETE
      (5, "eve", 30, false),  // matched → UPDATE (dept change)
      (9, "zoe", 40, false),  // not matched → INSERT
      (11, "del", 40, true)   // not matched + deleted → ignored
    ).toDF("id", "name", "dept", "record_deleted")

    Merge.into(store, "emp")
      .using(delta)
      .on(Seq("id"))
      .whenMatchedDelete(Some(Merge.source("record_deleted")))
      .whenMatchedUpdate()
      .whenNotMatchedInsert(Some(!Merge.source("record_deleted")))
      .run()

    val out = store.read("emp").as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq((2, "bob", 10), (5, "eve", 30), (9, "zoe", 40)))
  }

  test("first matching clause wins, in declaration order") {
    val store = freshStore()
    store.commit("t", Seq((1, 100)).toDF("id", "v"), "create")
    Merge.into(store, "t")
      .using(Seq((1, 5)).toDF("id", "v"))
      .on(Seq("id"))
      .whenMatchedUpdate(Some(Merge.source("v") < 10),
        set = Some(Map("v" -> lit(-1))))
      .whenMatchedUpdate() // would set v=5; must not fire
      .run()
    assert(store.read("t").as[(Int, Int)].collect().toSeq == Seq((1, -1)))
  }

  test("unmatched target rows survive; unmatched source rows drop without insert clause") {
    val store = freshStore()
    store.commit("t", Seq((1, "a"), (2, "b")).toDF("id", "s"), "create")
    Merge.into(store, "t")
      .using(Seq((2, "B"), (3, "C")).toDF("id", "s"))
      .on(Seq("id"))
      .whenMatchedUpdate()
      .run()
    assert(store.read("t").as[(Int, String)].collect().sortBy(_._1).toSeq ==
      Seq((1, "a"), (2, "B")))
  }

  test("cardinality violation: >1 source row per target row errors") {
    val store = freshStore()
    store.commit("t", Seq((1, "a")).toDF("id", "s"), "create")
    val err = intercept[IllegalArgumentException] {
      Merge.into(store, "t")
        .using(Seq((1, "x"), (1, "y")).toDF("id", "s"))
        .on(Seq("id"))
        .whenMatchedUpdate()
        .run()
    }
    assert(err.getMessage.contains("more than one source row"))
  }

  test("insert with explicit values fills unassigned columns with null") {
    val store = freshStore()
    store.commit("t", Seq((1, "a", 10)).toDF("id", "s", "v"), "create")
    Merge.into(store, "t")
      .using(Seq(7).toDF("id"))
      .on(Seq("id"))
      .whenNotMatchedInsert(values =
        Some(Map("id" -> Merge.source("id"), "s" -> lit("new"))))
      .run()
    val got = store.read("t").collect().map(r =>
      (r.getInt(0), r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(got.sortBy(_._1).toSeq == Seq((1, "a", 10), (7, "new", -1)))
  }
}
