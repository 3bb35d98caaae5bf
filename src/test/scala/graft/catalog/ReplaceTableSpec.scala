package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** Atomic `CREATE / REPLACE TABLE [AS SELECT]` via StagingTableCatalog:
  * the replace is ONE manifest swap (readers never see a half-written
  * table), the new snapshot carries the new schema and partition spec
  * with nothing inherited, prior versions stay time-travelable, and a
  * failed RTAS leaves the old snapshot untouched. */
class ReplaceTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("rtas")
    val cat = s"grt${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  test("CTAS goes through the staged path and lands one create version") {
    val (_, cat, store) = freshCat()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("rt_src")
    spark.sql(s"CREATE TABLE $cat.ns.t USING graft AS SELECT * FROM rt_src")
    val ms = store.manifests("t")
    assert(ms.map(_.operation) == Seq("create"),
      s"CTAS must land as ONE create version, got ${ms.map(_.operation)}")
    assert(spark.table(s"$cat.ns.t").count() == 2)
  }

  test("REPLACE TABLE AS SELECT swaps schema atomically, keeps history") {
    val (_, cat, store) = freshCat()
    store.commit("t", (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      "create")
    spark.sql(s"REPLACE TABLE $cat.ns.t USING graft AS " +
      "SELECT CAST(id AS STRING) AS key, id * 2 AS dbl FROM " +
      s"$cat.ns.t WHERE id <= 3")
    val got = spark.table(s"$cat.ns.t")
    assert(got.columns.toSeq == Seq("key", "dbl"))
    assert(got.count() == 3)
    // history retained: version 1 still serves the OLD schema and rows
    val v1 = spark.sql(s"SELECT * FROM $cat.ns.t VERSION AS OF 1")
    assert(v1.columns.toSeq == Seq("id", "s"))
    assert(v1.count() == 10)
    assert(store.manifests("t").map(_.operation) == Seq("create", "replace"))
  }

  test("CREATE OR REPLACE works for both absent and present tables") {
    val (_, cat, store) = freshCat()
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("rt_src2")
    spark.sql(s"CREATE OR REPLACE TABLE $cat.ns.t USING graft " +
      "AS SELECT * FROM rt_src2")
    assert(store.manifests("t").map(_.operation) == Seq("create"))
    spark.sql(s"CREATE OR REPLACE TABLE $cat.ns.t USING graft " +
      "AS SELECT 5 AS n")
    assert(store.manifests("t").map(_.operation) == Seq("create", "replace"))
    assert(spark.table(s"$cat.ns.t").columns.toSeq == Seq("n"))
  }

  test("REPLACE on a missing table fails; plain REPLACE lands empty") {
    val (_, cat, store) = freshCat()
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE $cat.ns.absent USING graft AS SELECT 1 AS x")
    }
    store.commit("t", Seq((1, 2)).toDF("a", "b"), "create")
    // REPLACE TABLE without AS SELECT: new empty snapshot, new schema
    spark.sql(s"REPLACE TABLE $cat.ns.t (k STRING, v BIGINT) USING graft")
    val got = spark.table(s"$cat.ns.t")
    assert(got.columns.toSeq == Seq("k", "v") && got.count() == 0)
    assert(spark.sql(s"SELECT * FROM $cat.ns.t VERSION AS OF 1").count() == 1)
  }

  test("failed RTAS leaves the old snapshot untouched") {
    val (_, cat, store) = freshCat()
    store.commit("t", (1 to 5).map(i => (i, s"v$i")).toDF("id", "s"), "create")
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE $cat.ns.t USING graft AS " +
        "SELECT id, CAST(assert_true(id < 3, 'boom') AS STRING) AS s " +
        s"FROM $cat.ns.t")
    }
    // no new version, no schema change, rows intact
    assert(store.manifests("t").map(_.operation) == Seq("create"))
    assert(spark.table(s"$cat.ns.t").count() == 5)
  }

  test("partitioned RTAS lands the new spec with partition pruning") {
    val (wh, cat, store) = freshCat()
    store.commit("t", (1 to 100).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "grp", "s"), "create")
    spark.sql(s"REPLACE TABLE $cat.ns.t USING graft PARTITIONED BY (grp) " +
      s"AS SELECT id, grp, s FROM $cat.ns.t")
    val m = store.manifests("t").maxBy(_.version)
    assert(m.partitionBy == Seq("grp"))
    assert(m.files.nonEmpty &&
      m.files.forall(_.partitionValues.contains("grp")))
    // partition-exact file pruning on the replaced table
    val hit = m.files.filter(_.partitionValues("grp") == "2")
    assert(hit.nonEmpty && hit.size < m.files.size)
    assert(spark.sql(s"SELECT count(*) c FROM $cat.ns.t WHERE grp = 2")
      .head().getLong(0) == 25L)
  }

  test("replace resets column mapping and tombstones") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, "a")).toDF("id", "payload"), "create")
    store.renameColumn("t", "payload", "body")
    spark.sql(s"REPLACE TABLE $cat.ns.t USING graft AS " +
      "SELECT 'x' AS payload") // the old PHYSICAL name, fine to reuse now
    val m = store.manifests("t").maxBy(_.version)
    assert(m.columnMap.isEmpty && m.droppedColumns.isEmpty)
    assert(spark.table(s"$cat.ns.t").select("payload").head().getString(0)
      == "x")
  }
}
