package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BranchSpec extends SparkSpec {
  import spark.implicits._

  test("branch commits are invisible on main until fast_forward publishes the chain") {
    val store = new TableStore(spark, tmpDir("br"))
    store.commit("t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "create")
    store.createBranch("t", "audit")
    store.appendToBranch("t", "audit", Seq((3L, "c")).toDF("id", "s"))
    store.appendToBranch("t", "audit", Seq((4L, "d")).toDF("id", "s"))
    // main untouched; branch sees fork + its own appends
    assert(store.read("t").count() == 2)
    assert(store.currentVersion("t") == 1L)
    assert(store.readBranch("t", "audit").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(store.branches("t") == Seq(("audit", 2L)))
    val v = store.fastForward("t", "audit")
    assert(v == 3L) // two published commits
    assert(store.read("t").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // intermediate branch commit is a real, time-travelable main version
    assert(store.readVersion("t", 2).count() == 3)
    assert(store.branches("t").isEmpty)
  }

  test("fast_forward refuses a diverged main; dropBranch cleans branch data only") {
    val store = new TableStore(spark, tmpDir("br"))
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    store.createBranch("t", "b1")
    store.appendToBranch("t", "b1", Seq((2L, "b")).toDF("id", "s"))
    store.append("t", Seq((9L, "z")).toDF("id", "s")) // main diverges
    val e = intercept[IllegalArgumentException] {
      store.fastForward("t", "b1")
    }
    assert(e.getMessage.contains("diverged") ||
      e.getMessage.contains("advanced"))
    assert(store.readBranch("t", "b1").count() == 2) // branch intact
    store.dropBranch("t", "b1")
    assert(store.branches("t").isEmpty)
    assert(store.read("t").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 9L)) // main data untouched
  }

  test("expiring main history never deletes files a live branch references") {
    val store = new TableStore(spark, tmpDir("br"))
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    store.createBranch("t", "keep") // forks at v1
    // main rewrites everything: v1's files are unreferenced by main v2
    store.commit("t", Seq((5L, "e")).toDF("id", "s"), "create")
    store.expireSnapshots("t", keepLast = 1)
    // branch still reads the fork content
    assert(store.readBranch("t", "keep").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("$refs metadata table lists tags and branches") {
    val wh = tmpDir("br_cat")
    val cat = s"grefs${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val store = new TableStore(spark, wh)
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    store.createTag("t", "v1-release", 1L)
    store.createBranch("t", "dev")
    store.appendToBranch("t", "dev", Seq((2L, "b")).toDF("id", "s"))
    val refs = spark.sql(s"SELECT name, type, version FROM $cat.ns.`t$$refs`")
      .as[(String, String, Long)].collect().toSet
    assert(refs == Set(("v1-release", "tag", 1L), ("dev", "branch", 1L)))
  }

  test("branch appends enforce fork-time CHECK constraints") {
    val store = new TableStore(spark, tmpDir("br"))
    store.commit("t", Seq((1L, 1.0)).toDF("id", "v"), "create")
    store.addCheckConstraint("t", "pos", "v > 0")
    store.createBranch("t", "b")
    intercept[Exception] {
      store.appendToBranch("t", "b", Seq((2L, -1.0)).toDF("id", "v"))
    }
    store.appendToBranch("t", "b", Seq((2L, 2.0)).toDF("id", "v"))
    assert(store.readBranch("t", "b").count() == 2)
  }
}
