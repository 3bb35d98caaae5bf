package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  /** Unique catalog name per test: CatalogManager caches the initialized
    * instance per name, so re-pointing an existing name's warehouse would
    * silently keep the old one. */
  private def withCatalog[T](f: (TableStore, String) => T): T = {
    n += 1
    val cat = s"g$n"
    val wh = tmpDir("cat")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(new TableStore(spark, wh), cat)
  }

  test("SQL reads resolve through the catalog with pushdown intact") {
    withCatalog { (store, cat) =>
      store.commit("t", (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "s"), "create")
      val out = spark.sql(s"SELECT s FROM $cat.ns.t WHERE id = 42").as[String].collect()
      assert(out.toSeq == Seq("v42"))
    }
  }

  test("VERSION AS OF reads an older snapshot") {
    withCatalog { (store, cat) =>
      store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
      store.append("t", Seq((2L, "b")).toDF("id", "s"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t VERSION AS OF 1")
        .as[Long].head() == 1L)
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").as[Long].head() == 2L)
    }
  }

  test("TIMESTAMP AS OF resolves the snapshot at that instant") {
    withCatalog { (store, cat) =>
      store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
      Thread.sleep(30)
      val mid = java.sql.Timestamp.from(java.time.Instant.now())
      Thread.sleep(30)
      store.append("t", Seq((2L, "b")).toDF("id", "s"))
      val n = spark.sql(
        s"SELECT count(*) FROM $cat.ns.t TIMESTAMP AS OF '$mid'").as[Long].head()
      assert(n == 1L)
    }
  }

  test("catalog sees copy-on-write snapshots (shared files) consistently") {
    withCatalog { (store, cat) =>
      store.commit("t",
        (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
          .repartitionByRange(4, col("id")), "create")
      graft.core.Merge.into(store, "t")
        .using(Seq((5L, "X")).toDF("id", "s"))
        .on(Seq("id")).whenMatchedUpdate().run()
      val out = spark.sql(s"SELECT s FROM $cat.ns.t WHERE id IN (5, 50) ORDER BY id")
        .as[String].collect().toSeq
      assert(out == Seq("X", "v50"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").as[Long].head() == 100L)
    }
  }
}
