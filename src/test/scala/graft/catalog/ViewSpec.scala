package graft.catalog

import graft.SparkSpec
import graft.core.TableStore

class ViewSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(f: (TableStore, String) => Unit): Unit = {
    val wh = tmpDir("graft_views")
    val cat = s"gview${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(new TableStore(spark, wh), cat)
  }

  test("create_view persists, registers, and stays current across appends") {
    withCatalog { (store, cat) =>
      store.commit("t",
        Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
          .toDF("id", "grp", "v"), "create")
      val vn = s"${cat}_by_grp"
      spark.sql(s"CALL $cat.system.create_view(name => '$vn', " +
        s"sql => 'SELECT grp, SUM(v) AS total FROM $cat.ns.t GROUP BY grp')")
        .collect()
      assert(spark.sql(s"SELECT * FROM $vn ORDER BY grp")
        .as[(String, Double)].collect().toSeq ==
        Seq(("a", 40.0), ("b", 20.0)))
      // always-current: an append shows up without re-registering
      store.append("t", Seq((4L, "b", 5.0)).toDF("id", "grp", "v"))
      assert(spark.sql(s"SELECT total FROM $vn WHERE grp = 'b'")
        .head.getDouble(0) == 25.0)
      // duplicate create refuses; replace => true succeeds
      intercept[Exception] {
        spark.sql(s"CALL $cat.system.create_view(name => '$vn', " +
          "sql => 'SELECT 1 AS one')").collect()
      }
      spark.sql(s"CALL $cat.system.create_view(name => '$vn', " +
        s"sql => 'SELECT COUNT(*) AS n FROM $cat.ns.t', replace => true)")
        .collect()
      assert(spark.sql(s"SELECT n FROM $vn").head.getLong(0) == 4)
      // persisted: a cleared session re-hydrates via sync_views
      spark.catalog.dropTempView(vn)
      val r = spark.sql(s"CALL $cat.system.sync_views()").head()
      assert(r.getLong(0) >= 1 && r.getString(1).contains(vn))
      assert(spark.sql(s"SELECT n FROM $vn").head.getLong(0) == 4)
      // drop removes file and registration
      spark.sql(s"CALL $cat.system.drop_view(name => '$vn')").collect()
      assert(GraftViews.list(spark, store.warehouse).isEmpty)
      intercept[Exception] {
        spark.sql(s"SELECT * FROM $vn").collect()
      }
    }
  }
}
