package graft.core

import graft.SparkSpec
import graft.catalog.GraftCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ALTER COLUMN TYPE without data rewrite (Iceberg type promotion /
  * Delta type widening): old files keep their narrow physical type and
  * Spark 4's parquet readers widen at scan time; new files carry the
  * wide type natively. Stats-based file skipping must stay live across
  * the boundary (the promotion set is same-stat-kind by construction),
  * and every unsafe change must be rejected loudly. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("widen")
    val cat = s"gtw${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  private def physicalType(store: TableStore, table: String,
      column: String): Set[DataType] = {
    val m = store.manifests(table).maxBy(_.version)
    m.files.map { fe =>
      spark.read.parquet(
        new java.io.File(store.warehouse, s"$table/${fe.path}").toString)
        .schema(column).dataType
    }.toSet
  }

  test("int->long widen is metadata-only; reads span narrow and wide files") {
    val (_, _, store) = freshCat()
    val narrow = (1 to 100).map(i => (i, s"v$i")).toDF("n", "s")
    store.commit("t", narrow.repartition(3, col("n")), "create")
    store.widenColumnType("t", "n", LongType)
    // no data file rewritten — footers still carry int32
    assert(physicalType(store, "t", "n") == Set(IntegerType))
    assert(store.read("t").schema("n").dataType == LongType)
    // append values past int range under the widened schema
    store.append("t", Seq((5000000000L, "big")).toDF("n", "s"))
    assert(physicalType(store, "t", "n") == Set(IntegerType, LongType))
    val got = store.read("t")
    assert(got.count() == 101)
    assert(got.agg(sum(col("n"))).head.getLong(0) == 5050L + 5000000000L)
    assert(got.filter(col("n") === 5000000000L).count() == 1)
    assert(got.filter(col("n") === 42L).count() == 1)
  }

  test("float->double and decimal precision widen") {
    val (_, _, store) = freshCat()
    val df = (1 to 10).map(i => (i, i + 0.5f,
      java.math.BigDecimal.valueOf(i * 100L, 2))).toDF("id", "f", "d")
      .withColumn("d", col("d").cast(DecimalType(9, 2)))
    store.commit("t", df, "create")
    store.widenColumnType("t", "f", DoubleType)
    store.widenColumnType("t", "d", DecimalType(18, 2))
    val got = store.read("t")
    assert(got.schema("f").dataType == DoubleType)
    assert(got.schema("d").dataType == DecimalType(18, 2))
    // float bits widen exactly: i + 0.5 is dyadic, so equality is safe
    assert(got.filter(col("f") === 3.5d).count() == 1)
    assert(got.agg(sum(col("d"))).head.getDecimal(0).longValueExact() == 55L)
    // a decimal past the old precision lands fine post-widen
    store.append("t", Seq((11, 11.5d, new java.math.BigDecimal("12345678901234.56")))
      .toDF("id", "f", "d").withColumn("d", col("d").cast(DecimalType(18, 2))))
    assert(store.read("t").filter(col("d") > lit("1000000000")).count() == 1)
  }

  test("SQL face: ALTER COLUMN TYPE, pushdown, file pruning stays live") {
    val (_, cat, store) = freshCat()
    val df = (1 to 400).map(i => (i, i % 7)).toDF("n", "grp")
    store.commit("t", df.repartitionByRange(4, col("n")), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN n TYPE BIGINT")
    assert(spark.table(s"$cat.ns.t").schema("n").dataType == LongType)
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (9000000000, 3)")
    assert(spark.sql(
      s"SELECT sum(n) FROM $cat.ns.t WHERE n > 350").head.getLong(0) ==
      (351 to 400).map(_.toLong).sum + 9000000000L)
    // stats pruning on the widened column: same-kind stats still compare
    val (kept, total) = store.prunedFileCount("t", "n", 10L, 20L)
    assert(kept < total, s"pruning dead after widen: $kept/$total")
  }

  test("time travel serves each epoch's schema") {
    val (_, _, store) = freshCat()
    store.commit("t", Seq((1, "a")).toDF("n", "s"), "create")
    store.widenColumnType("t", "n", LongType)
    assert(store.readVersion("t", 1L).schema("n").dataType == IntegerType)
    assert(store.readVersion("t", 2L).schema("n").dataType == LongType)
  }

  test("guard matrix: narrowing, cross-kind, partition source, live MoR") {
    val (_, _, store) = freshCat()
    val df = (1 to 20).map(i => (i.toLong, i, s"v$i")).toDF("id", "n", "s")
    store.commit("t", df, "create")
    intercept[IllegalArgumentException] {
      store.widenColumnType("t", "id", IntegerType) // narrowing
    }
    intercept[IllegalArgumentException] {
      store.widenColumnType("t", "n", DoubleType) // cross-kind
    }
    intercept[IllegalArgumentException] {
      store.widenColumnType("t", "n", StringType) // not a promotion
    }
    intercept[IllegalArgumentException] {
      store.widenColumnType("t", "missing", LongType)
    }
    // partition/transform source
    val part = (1 to 20).map(i => (i, s"v$i")).toDF("n", "s")
    store.commit("p", part, "create",
      partitionBy = Seq(TableStore.bucketColumn("n", 4)))
    intercept[IllegalArgumentException] {
      store.widenColumnType("p", "n", LongType)
    }
    // live merge-on-read delete files block widening until compaction
    store.commit("m", (1 to 20).map(i => (i, s"v$i")).toDF("n", "s"), "create")
    store.deleteKeysMoR("m", Seq(3).toDF("n"), Seq("n"))
    intercept[IllegalArgumentException] {
      store.widenColumnType("m", "n", LongType)
    }
    store.compact("m")
    store.widenColumnType("m", "n", LongType)
    assert(store.read("m").filter(col("n") === 3L).count() == 0)
    assert(store.read("m").count() == 19)
  }

  test("compaction after widen rewrites files to the wide type") {
    val (_, _, store) = freshCat()
    store.commit("t", (1 to 50).map(i => (i, s"v$i")).toDF("n", "s"), "create")
    store.widenColumnType("t", "n", LongType)
    store.append("t", Seq((6000000000L, "big")).toDF("n", "s"))
    store.compact("t")
    assert(physicalType(store, "t", "n") == Set(LongType))
    assert(store.read("t").agg(sum(col("n"))).head.getLong(0) ==
      1275L + 6000000000L)
  }
}
