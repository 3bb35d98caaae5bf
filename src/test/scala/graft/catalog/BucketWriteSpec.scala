package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** Storage-partitioned SQL writes into bucket-partitioned tables: the
  * catalog's `bucket(n, key)` V2 function gives Spark the engine's own md5
  * bucket arithmetic for write clustering, and the writer derives the
  * bucket directory per row — so SQL INSERTs land in the same layout (and
  * prune the same way) as library `commitBucketed` writes.
  */
class BucketWriteSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(f: (TableStore, String) => Unit): Unit = {
    val wh = tmpDir("graft_bw")
    val cat = s"gbw${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(new TableStore(spark, wh), cat)
  }

  test("the catalog bucket() function matches TableStore.bucketOf exactly") {
    withCatalog { (_, cat) =>
      val keys = Seq(1L, 42L, 12345L, -7L).toDF("k")
      val viaStore = keys
        .select(col("k"), TableStore.bucketOf(col("k"), 16).as("b"))
        .as[(Long, Long)].collect().toMap
      keys.createOrReplaceTempView(s"${cat}_keys")
      val viaSql = spark.sql(
        s"SELECT k, $cat.ns.bucket(16, k) FROM ${cat}_keys")
        .as[(Long, Int)].collect().toMap
      assert(viaSql.view.mapValues(_.toLong).toMap == viaStore)
    }
  }

  test("SQL INSERT INTO a bucket-spec table lands bucketed, clustered, pruned") {
    withCatalog { (store, cat) =>
      val bc = TableStore.bucketColumn("id", 8)
      store.commit("t", Seq.empty[(Long, String)].toDF("id", "s"), "create")
      store.setPartitionSpec("t", Seq(bc))
      val rows = (1 to 400).map(i => s"($i, 'v$i')").mkString(", ")
      spark.sql(s"INSERT INTO $cat.ns.t VALUES $rows")
      val m = store.manifests("t").maxBy(_.version)
      val staged = m.files.filter(_.path.contains("__p_"))
      // every staged file carries a bucket partition value...
      assert(staged.nonEmpty && staged.forall(_.partitionValues.contains(bc)))
      // ...whose id is the SAME arithmetic the library uses
      val expected = (1 to 400).map(i =>
        TableStore.bucketOfString(i.toString, 8)).toSet.map((x: Integer) => x.toString)
      assert(staged.flatMap(_.partitionValues.get(bc)).toSet == expected)
      // clustering held: one file per touched bucket, not tasks × buckets
      assert(staged.size == expected.size)
      // key lookups prune to the key's bucket
      val (hit, untouched) =
        store.filesHitByKeys("t", "id", Seq(42L).toDF("id"))
      assert(untouched.nonEmpty && hit.size < staged.size)
      // and the rows read back whole
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0) == 400L)
      assert(spark.sql(s"SELECT s FROM $cat.ns.t WHERE id = 42")
        .head.getString(0) == "v42")
    }
  }
}
