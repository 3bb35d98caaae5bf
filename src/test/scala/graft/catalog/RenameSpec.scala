package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** ALTER TABLE … RENAME TO: one directory rename carrying the full
  * history, the MoR overlay, and time travel. */
class RenameSpec extends SparkSpec {
  import spark.implicits._

  test("rename keeps history, overlay, and time travel; old name gone") {
    val wh = tmpDir("graft_ren")
    val cat = s"gren${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val store = new TableStore(spark, wh)
    store.commit("t", (1L to 100L).map(i => (i, i * 2)).toDF("id", "v"),
      "create")
    store.append("t", Seq((101L, 0L)).toDF("id", "v"))
    store.upsertMoR("t", Seq((1L, 999L)).toDF("id", "v"), Seq("id"))

    spark.sql(s"ALTER TABLE $cat.ns.t RENAME TO $cat.ns.t2")

    assert(!store.exists("t") && store.exists("t2"))
    // full current state through the overlay
    val cur = store.read("t2")
    assert(cur.count() == 101L)
    assert(cur.filter(col("id") === 1L).head.getLong(1) == 999L)
    // history and time travel intact
    assert(store.manifests("t2").size == 3)
    assert(store.readVersion("t2", 1).count() == 100L)
    // old name unresolvable in SQL
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.ns.t").collect() }
    // rename onto an existing table refuses
    store.commit("t3", Seq((1L, 1L)).toDF("id", "v"), "create")
    intercept[IllegalArgumentException] { store.renameTable("t2", "t3") }
  }
}
