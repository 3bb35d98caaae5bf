package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** Column rename WITHOUT data rewrite (Delta column-mapping / Iceberg
  * field-id semantics): each field's PHYSICAL parquet name is pinned at
  * first write, renames touch metadata only, and files written before
  * and after a rename share one physical name. Every face must keep
  * working through the mapping: API reads, SQL scans with pushdown +
  * file pruning, metadata-only aggregates, SQL INSERT, merge-on-read,
  * and time travel across the rename boundary. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("cmap")
    val cat = s"gcm${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  private def df0 = (1 to 100).map(i => (i.toLong, s"v$i", i % 7))
    .toDF("id", "payload", "grp")

  private def physicalColumns(store: TableStore, table: String): Set[String] = {
    val m = store.manifests(table).maxBy(_.version)
    m.files.flatMap { fe =>
      spark.read.parquet(
        new java.io.File(store.warehouse, s"$table/${fe.path}").toString)
        .columns
    }.toSet
  }

  test("rename is metadata-only: old files keep the physical name") {
    val (_, _, store) = freshCat()
    store.commit("t", df0.repartition(3, col("id")), "create")
    store.renameColumn("t", "payload", "body")
    // no data file rewritten; footers still say 'payload'
    assert(physicalColumns(store, "t").contains("payload"))
    assert(!physicalColumns(store, "t").contains("body"))
    val got = store.read("t")
    assert(got.columns.toSeq == Seq("id", "body", "grp"))
    assert(got.filter(col("body") === "v5").count() == 1)
    // writes AFTER the rename pin the SAME physical name
    store.append("t", Seq((200L, "vNew", 1)).toDF("id", "body", "grp"))
    assert(!physicalColumns(store, "t").contains("body"),
      "post-rename files must reuse the pinned physical name")
    assert(store.read("t").count() == 101)
    assert(store.read("t").filter(col("body") === "vNew").count() == 1)
  }

  test("time travel across the rename boundary serves each epoch's names") {
    val (_, _, store) = freshCat()
    store.commit("t", df0, "create")
    store.renameColumn("t", "payload", "body")
    assert(store.readVersion("t", 1L).columns.contains("payload"))
    assert(store.readVersion("t", 2L).columns.contains("body"))
    assert(store.readVersion("t", 1L).count() == 100)
  }

  test("SQL face: ALTER RENAME, filtered scans, pruning, INSERT, UPDATE") {
    val (_, cat, store) = freshCat()
    store.commit("t", df0.repartitionByRange(4, col("id")), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN payload TO body")
    val q = spark.sql(
      s"SELECT body FROM $cat.ns.t WHERE id BETWEEN 10 AND 20 ORDER BY body")
    assert(q.collect().map(_.getString(0)).toSeq ==
      (10 to 20).map(i => s"v$i").sorted)
    // manifest file pruning on the stats still fires (logical-keyed)
    val (kept, total) = store.prunedFileCount("t", "id", 10L, 20L)
    assert(kept < total, s"pruning dead after rename: $kept/$total")
    // SQL INSERT writes under the pinned physical name
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (500, 'vIns', 3)")
    assert(!physicalColumns(store, "t").contains("body"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t WHERE body = 'vIns'")
      .head.getLong(0) == 1L)
    // row-level SQL write through the mapping
    spark.sql(s"UPDATE $cat.ns.t SET body = 'vUpd' WHERE id = 500")
    assert(spark.sql(s"SELECT body FROM $cat.ns.t WHERE id = 500")
      .head.getString(0) == "vUpd")
    // metadata-only aggregate resolves through the logical name
    assert(spark.sql(s"SELECT min(body) FROM $cat.ns.t").head.getString(0)
      == "v1")
  }

  test("filter pushdown on the renamed column reaches the reader") {
    val (_, cat, store) = freshCat()
    store.commit("t", df0.repartitionByRange(4, col("id")), "create")
    store.renameColumn("t", "id", "row_id")
    val q = spark.sql(
      s"SELECT row_id FROM $cat.ns.t WHERE row_id = 42")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // the physical filter must appear in the plan (pushed to parquet)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("42"), plan)
    // top-k pushdown prunes on the renamed key too
    val t = spark.sql(s"SELECT row_id FROM $cat.ns.t ORDER BY row_id LIMIT 3")
    assert(t.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("merge-on-read works after a rename (keys through the mapping)") {
    val (_, cat, store) = freshCat()
    store.commit("t", df0, "create")
    store.renameColumn("t", "payload", "body")
    val upd = Seq((5L, "patched", 99)).toDF("id", "body", "grp")
    store.upsertMoR("t", upd, Seq("id"))
    val got = store.read("t")
    assert(got.count() == 100)
    assert(got.filter(col("id") === 5L).head.getString(1) == "patched")
    // SQL read path (MorScan) through the same mapping
    assert(spark.sql(s"SELECT body FROM $cat.ns.t WHERE id = 5")
      .head.getString(0) == "patched")
  }

  test("rename guards: partition, live MoR overlay, constraints, dropped") {
    val (_, _, store) = freshCat()
    store.commitPartitioned("p", df0, Seq("grp"), "create")
    intercept[IllegalArgumentException](store.renameColumn("p", "grp", "g2"))
    store.commit("t", df0, "create")
    store.upsertMoR("t", Seq((1L, "x", 0)).toDF("id", "payload", "grp"),
      Seq("id"))
    intercept[IllegalArgumentException](
      store.renameColumn("t", "payload", "body"))
    store.commit("c", df0, "create")
    store.addCheckConstraint("c", "grp_ok", "grp >= 0")
    intercept[IllegalArgumentException](store.renameColumn("c", "grp", "g2"))
    intercept[IllegalArgumentException](store.renameColumn("c", "nope", "x"))
  }

  test("rename chain and swap settle on stable physical names") {
    val (_, _, store) = freshCat()
    store.commit("t", df0, "create")
    store.renameColumn("t", "payload", "body")
    store.renameColumn("t", "body", "text")
    assert(store.read("t").filter(col("text") === "v7").count() == 1)
    assert(store.columnMapOf("t") == Map("text" -> "payload"))
    // swap two names through a temp
    store.renameColumn("t", "id", "tmp0")
    store.renameColumn("t", "grp", "id")
    store.renameColumn("t", "tmp0", "grp")
    val m = store.columnMapOf("t")
    assert(m("id") == "grp" && m("grp") == "id")
    val r = store.read("t").filter(col("grp") === 9L) // old id
    assert(r.count() == 1 && r.head.getAs[Int]("id") == 9 % 7)
  }
}
