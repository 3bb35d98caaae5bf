package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concurrent writers racing optimistic commits: merges replan on
  * conflict (serializable — the retried merge reads the winner's
  * snapshot), merge-on-read deltas retry like appends. Every writer's
  * effect must land; no lost updates, no resurrect. */
class ConcurrentWriteSpec extends SparkSpec {
  import spark.implicits._

  private def race(n: Int)(job: Int => Unit): Unit = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // await each future individually: a fail-fast sequence would shut the
    // pool down under still-running rivals
    val futures = (0 until n).map(i => Future(job(i)))
    val results = futures.map(f => scala.util.Try(Await.result(f, 600.seconds)))
    pool.shutdown()
    results.foreach(_.get)
  }

  test("4 concurrent CoW merges all land (replan-on-conflict)") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_race_m").toString)
    store.commit("t",
      (0L until 400L).map(i => (i, 0L)).toDF("id", "v"), "create")
    val v0 = store.currentVersion("t")
    race(4) { w =>
      // writer w updates its own disjoint 100-key slice to w+1
      val src = (0L until 400L).filter(_ % 4 == w)
        .map(i => (i, w + 1L)).toDF("id", "v")
      Merge.into(store, "t").using(src)
        .on(Seq("id"))
        .whenMatchedUpdate()
        .withRetries(16)
        .run()
      ()
    }
    // every writer committed exactly one snapshot
    assert(store.currentVersion("t") == v0 + 4)
    // no lost updates: every slice carries its writer's value
    val got = store.read("t").groupBy(col("v"))
      .agg(count(lit(1)).as("n")).orderBy(col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L)))
  }

  test("4 concurrent MoR upserts retry like appends; all deltas apply") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_race_mor").toString)
    store.commit("t",
      (0L until 400L).map(i => (i, 0L)).toDF("id", "v"), "create")
    race(4) { w =>
      val src = (0L until 400L).filter(_ % 4 == w)
        .map(i => (i, 100L + w)).toDF("id", "v")
      store.upsertMoR("t", src, Seq("id"))
      ()
    }
    val got = store.read("t").groupBy(col("v"))
      .agg(count(lit(1)).as("n")).orderBy(col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((100L, 100L), (101L, 100L), (102L, 100L),
      (103L, 100L)))
  }
}
