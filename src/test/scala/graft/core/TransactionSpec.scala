package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-table transactions: all-or-nothing durability at the single
  * create-exclusive intent write, staged invisibility, idempotent
  * roll-forward recovery across every crash window. */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_txn").toString)

  private def dfA = (1 to 10).map(i => (i.toLong, s"a$i")).toDF("id", "v")
  private def dfB = (1 to 5).map(i => (i.toLong, i * 100L)).toDF("id", "amt")

  test("commit applies every op; both tables advance") {
    val store = newStore()
    val out = store.beginTransaction()
      .stageOverwrite("fact", dfA)
      .stageOverwrite("dim", dfB)
      .commit()
    assert(out.keySet == Set("fact", "dim"))
    assert(store.read("fact").count() == 10 && store.read("dim").count() == 5)
    // append + overwrite compose in one txn, including twice on one table
    val out2 = store.beginTransaction()
      .stageAppend("fact", dfA.withColumn("v", lit("x")))
      .stageAppend("fact", dfA.limit(3))
      .stageOverwrite("dim", dfB.limit(2))
      .commit()
    assert(store.read("fact").count() == 23)
    assert(store.read("dim").count() == 2)
    assert(out2("fact") > out("fact"))
  }

  test("staged ops are invisible; abort reclaims them") {
    val store = newStore()
    store.commit("t", dfA, "create")
    val txn = store.beginTransaction().stageAppend("t", dfA)
    assert(store.read("t").count() == 10, "staged rows must not be visible")
    assert(store.currentVersion("t") == 1L)
    txn.abort()
    assert(store.read("t").count() == 10)
    intercept[IllegalArgumentException](txn.commit())
  }

  test("crash BEFORE the intent write: transaction never happened") {
    val store = newStore()
    store.commit("t1", dfA, "create")
    store.commit("t2", dfB, "create")
    // stage ops but never call commit() — simulates a crash pre-intent
    store.beginTransaction().stageAppend("t1", dfA).stageOverwrite("t2", dfA)
    assert(store.recoverTransactions() == 0)
    assert(store.read("t1").count() == 10 && store.read("t2").count() == 5)
  }

  test("crash AFTER the intent write: recovery rolls the whole txn forward") {
    val store = newStore()
    store.commit("t1", dfA, "create")
    store.commit("t2", dfB, "create")
    // Build a committed-but-unapplied state: run a real commit, then
    // restore the intent file and strip the applied versions — equivalent
    // to a crash between the intent write and application.
    val whA = new java.io.File(store.warehouse)
    val txn = store.beginTransaction().stageAppend("t1", dfA)
    // capture staged side manifest before commit consumes it
    val stagedDir = new java.io.File(whA, "t1/_txnstaged")
    val stagedFile = stagedDir.listFiles()
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith(".")).head
    val stagedBytes = java.nio.file.Files.readAllBytes(stagedFile.toPath)
    txn.commit()
    assert(store.read("t1").count() == 20)
    // resurrect the pre-apply state: intent present, staged manifest
    // present, applied version rolled back via time-travel overwrite is
    // NOT equivalent — instead verify idempotency: re-running recovery
    // with the intent restored must NOT double-append (marker guard).
    val intent = s"""{"id":${'"'}${txn.id}${'"'},"ops":[{"k":0,"table":"t1","shape":"append"}]}"""
    val txns = new java.io.File(whA, "_txns"); txns.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(txns, s"${txn.id}.json").toPath, intent.getBytes)
    java.nio.file.Files.write(stagedFile.toPath, stagedBytes)
    assert(store.recoverTransactions() == 1)
    assert(store.read("t1").count() == 20, "recovery must not double-apply")
    assert(store.recoverTransactions() == 0, "intent must be consumed")
  }

  test("partial application: recovery completes only the unapplied ops") {
    val store = newStore()
    store.commit("t1", dfA, "create")
    store.commit("t2", dfB, "create")
    // Stage two ops through the real API, commit, then simulate the
    // crash-window where op0 applied but op1 did not: restore the intent
    // and op1's staged manifest, and rewind ONLY t2 by deleting its new
    // manifest + pointer (files of v2 are inert without the manifest).
    val txn = store.beginTransaction()
      .stageAppend("t1", dfA).stageOverwrite("t2", dfA)
    val wh = new java.io.File(store.warehouse)
    val staged2 = new java.io.File(wh, "t2/_txnstaged").listFiles()
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith(".")).head
    val staged2Bytes = java.nio.file.Files.readAllBytes(staged2.toPath)
    val out = txn.commit()
    assert(store.read("t2").count() == 10)
    // rewind t2 to v1 (crash before op1's manifest write)
    val mani2 = new java.io.File(wh, s"t2/_manifests/${out("t2")}.json")
    assert(mani2.delete())
    java.nio.file.Files.write(new java.io.File(wh, "t2/_current").toPath,
      "1".getBytes)
    assert(store.read("t2").count() == 5)
    val intent = s"""{"id":${'"'}${txn.id}${'"'},"ops":[
      {"k":0,"table":"t1","shape":"append"},
      {"k":1,"table":"t2","shape":"overwrite"}]}"""
    val txns = new java.io.File(wh, "_txns"); txns.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(txns, s"${txn.id}.json").toPath, intent.getBytes)
    java.nio.file.Files.write(staged2.toPath, staged2Bytes)
    assert(store.recoverTransactions() == 1)
    assert(store.read("t1").count() == 20, "applied op must not re-apply")
    assert(store.read("t2").count() == 10, "unapplied op must roll forward")
  }

  test("beginTransaction drives pending recovery first") {
    val store = newStore()
    store.commit("t", dfA, "create")
    val txn = store.beginTransaction().stageAppend("t", dfA)
    val wh = new java.io.File(store.warehouse)
    val staged = new java.io.File(wh, "t/_txnstaged").listFiles()
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith(".")).head
    val stagedBytes = java.nio.file.Files.readAllBytes(staged.toPath)
    txn.commit()
    // resurrect the intent: the NEXT beginTransaction must drain it
    val txns = new java.io.File(wh, "_txns"); txns.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(txns, s"${txn.id}.json").toPath,
      s"""{"id":${'"'}${txn.id}${'"'},"ops":[{"k":0,"table":"t","shape":"append"}]}""".getBytes)
    java.nio.file.Files.write(staged.toPath, stagedBytes)
    store.beginTransaction().stageAppend("t", dfA.limit(1)).commit()
    assert(store.read("t").count() == 21)
    assert(!new java.io.File(txns, s"${txn.id}.json").exists())
  }

  test("stageDeleteKeys purges across tables atomically through MoR reads") {
    val store = newStore()
    store.commit("o", dfA, "create")   // ids 1..10
    store.commit("l", dfB, "create")   // ids 1..5
    store.beginTransaction()
      .stageDeleteKeys("o", Seq(2L, 4L).toDF("id"), Seq("id"))
      .stageDeleteKeys("l", Seq(2L, 4L, 9L).toDF("id"), Seq("id"))
      .commit()
    assert(store.read("o").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L, 6L, 7L, 8L, 9L, 10L))
    assert(store.read("l").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 5L))
    // a second purge layers on the first (same key columns)
    store.beginTransaction()
      .stageDeleteKeys("o", Seq(1L).toDF("id"), Seq("id")).commit()
    assert(store.read("o").count() == 7)
  }

  test("deletekeys crash windows: pre-intent inert, post-intent idempotent") {
    val store = newStore()
    store.commit("t", dfA, "create")
    // pre-intent: staged keys never committed — reads unaffected
    store.beginTransaction().stageDeleteKeys("t", Seq(1L).toDF("id"), Seq("id"))
    assert(store.recoverTransactions() == 0)
    assert(store.read("t").count() == 10)
    // post-intent: resurrect the intent after a real commit; the marker
    // guard must skip re-application (no double delete-file layering)
    val txn = store.beginTransaction()
      .stageDeleteKeys("t", Seq(2L, 3L).toDF("id"), Seq("id"))
    txn.commit()
    assert(store.read("t").count() == 8)
    val wh = new java.io.File(store.warehouse)
    val txns = new java.io.File(wh, "_txns"); txns.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(txns, s"${txn.id}.json").toPath,
      s"""{"id":${'"'}${txn.id}${'"'},"ops":[{"k":0,"table":"t","shape":"deletekeys"}]}""".getBytes)
    assert(store.recoverTransactions() == 1)
    assert(store.read("t").count() == 8)
  }

  test("orphan GC: pending txn staging survives, abandoned staging is swept") {
    val store = newStore()
    store.commit("t", dfA, "create")
    store.beginTransaction().stageAppend("t", dfA) // pending, never committed
    val wh = new java.io.File(store.warehouse)
    def txnDirs = new java.io.File(wh, "t").listFiles()
      .filter(_.getName.startsWith("txn-")).toSeq
    assert(txnDirs.nonEmpty)
    // pending: side manifest exists → GC must keep the staged data
    store.removeOrphanFiles("t", olderThanMs = 0L)
    assert(txnDirs.head.exists, "pending txn staging must survive GC")
    // applied txn data is manifest-referenced → survives GC
    val applied = store.beginTransaction().stageAppend("t", dfA).commit()
    store.removeOrphanFiles("t", olderThanMs = 0L)
    assert(store.read("t").count() == 20)
    assert(applied("t") == store.currentVersion("t"))
    // abandon the pending txn the crash way (side manifest vanishes
    // without abort) → its data dir becomes sweepable
    new java.io.File(wh, "t/_txnstaged").listFiles().foreach(_.delete())
    val swept = store.removeOrphanFiles("t", olderThanMs = 0L)
    assert(swept.exists(_.startsWith("txn-")), s"expected txn sweep, got $swept")
    assert(store.read("t").count() == 20, "referenced txn data must remain")
  }

  test("CHECK constraints are enforced on staged rows") {
    val store = newStore()
    store.commit("t", dfB, "create")
    store.addCheckConstraint("t", "amt_pos", "amt > 0")
    val bad = Seq((99L, -5L)).toDF("id", "amt")
    val ex = intercept[Exception] {
      store.beginTransaction().stageAppend("t", bad).commit()
    }
    assert(ex.getMessage != null)
    assert(store.read("t").count() == 5)
  }

  test("consistentVersions repairs a mixed cut from a half-applied txn") {
    val store = newStore()
    store.commit("t1", dfA, "create")
    store.commit("t2", dfB, "create")
    // same crash-window construction as the partial-application test:
    // op0 (t1) applied, op1 (t2) not — exactly the read-skew state a
    // naive two-pointer read would serve as "current"
    val txn = store.beginTransaction()
      .stageAppend("t1", dfA).stageOverwrite("t2", dfA)
    val wh = new java.io.File(store.warehouse)
    val staged2 = new java.io.File(wh, "t2/_txnstaged").listFiles()
      .filter(f => f.getName.endsWith(".json") && !f.getName.startsWith(".")).head
    val staged2Bytes = java.nio.file.Files.readAllBytes(staged2.toPath)
    val out = txn.commit()
    val mani2 = new java.io.File(wh, s"t2/_manifests/${out("t2")}.json")
    assert(mani2.delete())
    java.nio.file.Files.write(new java.io.File(wh, "t2/_current").toPath,
      "1".getBytes)
    val intent = s"""{"id":${'"'}${txn.id}${'"'},"ops":[
      {"k":0,"table":"t1","shape":"append"},
      {"k":1,"table":"t2","shape":"overwrite"}]}"""
    val txns = new java.io.File(wh, "_txns"); txns.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(txns, s"${txn.id}.json").toPath, intent.getBytes)
    java.nio.file.Files.write(staged2.toPath, staged2Bytes)
    // the naive cut IS mixed right now: t1 post-txn, t2 pre-txn
    assert(store.read("t1").count() == 20 && store.read("t2").count() == 5)
    val cut = store.consistentVersions(Seq("t1", "t2"))
    assert(store.readVersion("t1", cut("t1")).count() == 20)
    assert(store.readVersion("t2", cut("t2")).count() == 10,
      "the cut must contain ALL of the transaction's ops, not half")
  }

  test("consistentVersions is a plain pointer read when nothing is in flight") {
    val store = newStore()
    store.commit("a", dfA, "create")
    store.commit("b", dfB, "create")
    store.append("a", dfA)
    val cut = store.consistentVersions(Seq("a", "b", "a"))
    assert(cut == Map("a" -> 2L, "b" -> 1L))
  }

  test("CALL consistent_cut pins versions readable via VERSION AS OF") {
    val store = newStore()
    store.commit("a", dfA, "create")
    store.commit("b", dfB, "create")
    store.append("b", dfB)
    val cat = s"gtxncut${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", store.warehouse)
    val cut = spark.sql(s"CALL $cat.system.consistent_cut(tables => 'a,b')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cut == Map("a" -> 1L, "b" -> 2L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.b VERSION AS OF ${cut("b")}")
      .head.getLong(0) == 10L)
  }
}
