package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition evolution: the spec changes metadata-only — old files keep
  * their own layout and keep pruning by it, new writes lay out by the new
  * spec, and every planning path treats mixed layouts conservatively.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_pevo").toString)

  test("evolve identity -> bucket: old files prune by k, new by bucket") {
    val store = newStore()
    val part1 = (1 to 1000).map(i => (i.toLong, s"k${i % 4}", i * 1.0))
    store.commitPartitioned("t", part1.toDF("id", "k", "v"), Seq("k"), "create")
    val v1Files = store.manifests("t").maxBy(_.version).files.map(_.path).toSet

    val bc = TableStore.bucketColumn("id", 8)
    store.setPartitionSpec("t", Seq(bc))
    // metadata-only: same files, new spec, new snapshot
    val m2 = store.manifests("t").maxBy(_.version)
    assert(m2.operation == "set-partition-spec" &&
      m2.files.map(_.path).toSet == v1Files && m2.partitionBy == Seq(bc))

    // appends now lay out by the bucket spec (bucket column materialized)
    val part2 = (1001 to 2000).map(i => (i.toLong, s"k${i % 4}", i * 1.0))
    store.append("t",
      part2.toDF("id", "k", "v")
        .withColumn(bc, TableStore.bucketOf(col("id"), 8)))
    val m3 = store.manifests("t").maxBy(_.version)
    val newFiles = m3.files.filterNot(f => v1Files.contains(f.path))
    assert(newFiles.nonEmpty &&
      newFiles.forall(_.partitionValues.contains(bc)))

    // all rows survive the mixed layout
    assert(store.read("t").count() == 2000)
    // old files still prune on their identity value (stats are per-file)
    val (kHit, kTotal) = store.prunedFileCount("t", "k", "k1", "k1")
    assert(kHit < kTotal)
    // key lookups prune NEW files via the bucket transform; OLD files
    // (no bucket value) are conservatively hit, never wrongly skipped
    val (hit, skipped) = store.filesHitByKeys("t", "id", Seq(1500L).toDF("id"))
    assert(skipped.nonEmpty && skipped.forall(_.partitionValues.contains(bc)))
    assert(v1Files.subsetOf(hit.map(_.path).toSet))
  }

  test("CALL set_partition_spec evolves via SQL and validates columns") {
    val wh = tmpDir("graft_pevo_sql")
    val cat = s"gpevo${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val store = new TableStore(spark, wh)
    store.commit("t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "create")
    val r = spark.sql(
      s"CALL $cat.system.set_partition_spec(`table` => 't', columns => 's')")
      .head
    assert(r.getString(1) == "s")
    assert(store.manifests("t").maxBy(_.version).partitionBy == Seq("s"))
    // later appends land partitioned on s
    store.append("t", Seq((3L, "c")).toDF("id", "s"))
    val latest = store.manifests("t").maxBy(_.version)
    assert(latest.files.exists(_.partitionValues.get("s").contains("c")))
    intercept[IllegalArgumentException] {
      store.setPartitionSpec("t", Seq("nope"))
    }
  }
}
