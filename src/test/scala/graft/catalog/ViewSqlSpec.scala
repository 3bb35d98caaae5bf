package graft.catalog

import graft.SparkSpec
import graft.core.TableStore

/** `CREATE/DROP/SHOW VIEWS` SQL over a Graft catalog via the injected
  * extension rule ([[org.apache.spark.sql.graft.GraftViewDdlRule]]) —
  * and its interop with the `CALL create_view` procedure face, which
  * shares the same `_views/` store. */
class ViewSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("vsql")
    val cat = s"gvsql${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  test("CREATE VIEW persists, registers, stays current; DROP removes both faces") {
    val (wh, cat, store) = freshCat()
    store.commit("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"),
      "create")
    spark.sql(
      s"CREATE VIEW $cat.ns.v_big AS SELECT id, s FROM $cat.ns.t WHERE id > 1")
    // queryable immediately (registered like the procedure does)
    assert(spark.sql("SELECT COUNT(*) FROM v_big").head.getLong(0) == 2)
    // persisted in the warehouse store, visible to SHOW VIEWS
    assert(GraftViews.exists(spark, wh, "v_big"))
    assert(spark.sql(s"SHOW VIEWS IN $cat.ns").collect()
      .map(_.getString(1)).toSeq == Seq("v_big"))
    // a view is SQL text over LIVE tables — new appends show through
    store.append("t", Seq((4L, "d")).toDF("id", "s"))
    assert(spark.sql("SELECT COUNT(*) FROM v_big").head.getLong(0) == 3)
    // OR REPLACE swaps the definition; IF NOT EXISTS is a no-op on it
    spark.sql(
      s"CREATE OR REPLACE VIEW $cat.ns.v_big AS SELECT id FROM $cat.ns.t")
    assert(spark.sql("SELECT * FROM v_big").columns.toSeq == Seq("id"))
    spark.sql(
      s"CREATE VIEW IF NOT EXISTS $cat.ns.v_big AS SELECT 1 AS nope")
    assert(spark.sql("SELECT * FROM v_big").columns.toSeq == Seq("id"))
    // plain CREATE on an existing view fails
    intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.ns.v_big AS SELECT 1 AS nope"))
    // DDL-time validation: a view over a missing column never persists
    intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.ns.v_bad AS SELECT no_such_col FROM $cat.ns.t"))
    assert(!GraftViews.exists(spark, wh, "v_bad"))
    spark.sql(s"DROP VIEW $cat.ns.v_big")
    assert(!GraftViews.exists(spark, wh, "v_big"))
    assert(spark.sql(s"SHOW VIEWS IN $cat.ns").count() == 0)
    intercept[Exception](spark.sql(s"DROP VIEW $cat.ns.v_big"))
    spark.sql(s"DROP VIEW IF EXISTS $cat.ns.v_big") // no-op, no error
  }

  test("SQL DDL and CALL procedures share one view store") {
    val (wh, cat, store) = freshCat()
    store.commit("t", Seq((1L, "x")).toDF("id", "s"), "create")
    spark.sql(s"CALL $cat.system.create_view('v_proc', " +
      s"'SELECT id FROM $cat.ns.t')")
    // procedure-created view visible to SQL SHOW VIEWS and SQL DROP
    assert(spark.sql(s"SHOW VIEWS IN $cat.ns").collect()
      .map(_.getString(1)).contains("v_proc"))
    spark.sql(s"DROP VIEW $cat.ns.v_proc")
    assert(!GraftViews.exists(spark, wh, "v_proc"))
    // SQL-created view visible to the procedure face
    spark.sql(s"CREATE VIEW $cat.ns.v_sql AS SELECT s FROM $cat.ns.t")
    assert(GraftViews.sqlOf(spark, wh, "v_sql").exists(_.contains("SELECT s")))
  }

  test("session-catalog view DDL is untouched by the rule") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW v_plain_tmp AS SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM v_plain_tmp").head.getInt(0) == 7)
    spark.sql("DROP VIEW v_plain_tmp")
  }
}
