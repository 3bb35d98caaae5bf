package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** Column DEFAULT values (Delta / Iceberg-v3 default-value semantics,
  * reference: iceberg spec "Default values" + ALTER TABLE ... SET DEFAULT):
  *
  *  - `ADD COLUMN c T DEFAULT v` is METADATA-ONLY — no backfill rewrite.
  *    Files written before the column existed physically lack it; scans
  *    substitute the pinned EXISTS_DEFAULT for their rows (Spark's parquet
  *    readers fill missing columns from the read schema's metadata).
  *  - INSERTs that omit the column (explicit column list, or the DEFAULT
  *    keyword) take CURRENT_DEFAULT at write time — values are materialized
  *    into the new files, so later SET DEFAULT never rewrites history.
  *  - `ALTER COLUMN c SET DEFAULT v2` moves ONLY CURRENT_DEFAULT (future
  *    inserts); EXISTS_DEFAULT stays pinned, so pre-column rows keep v.
  *  - `DROP DEFAULT` makes omitted columns NULL again, old rows unchanged.
  */
class DefaultColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("defcol")
    val cat = s"gdef${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  private def physicalColumns(store: TableStore, table: String): Set[String] = {
    val m = store.manifests(table).maxBy(_.version)
    m.files.flatMap { fe =>
      spark.read.parquet(
        new java.io.File(store.warehouse, s"$table/${fe.path}").toString)
        .columns
    }.toSet
  }

  test("ADD COLUMN DEFAULT is metadata-only and backfills reads") {
    val (_, cat, store) = freshCat()
    store.commit("t", (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN score INT DEFAULT 7")
    // no rewrite: the old files still physically lack the column
    assert(!physicalColumns(store, "t").contains("score"))
    val got = spark.sql(s"SELECT id, score FROM $cat.ns.t")
    assert(got.count() == 50)
    assert(got.filter(col("score") === 7).count() == 50,
      "pre-column rows must read the EXISTS_DEFAULT")
    // aggregation over the filled column
    assert(spark.sql(s"SELECT sum(score) s FROM $cat.ns.t")
      .head().getLong(0) == 350L)
  }

  test("INSERT omitting the column takes CURRENT_DEFAULT") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN score INT DEFAULT 7")
    spark.sql(s"INSERT INTO $cat.ns.t (id, s) VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 'c', DEFAULT)")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (4, 'd', 99)")
    val rows = spark.sql(s"SELECT id, score FROM $cat.ns.t ORDER BY id")
      .as[(Long, Int)].collect().toSeq
    assert(rows == Seq((1L, 7), (2L, 7), (3L, 7), (4L, 99)))
  }

  test("SET DEFAULT moves future inserts only; EXISTS_DEFAULT stays pinned") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN score INT DEFAULT 7")
    spark.sql(s"INSERT INTO $cat.ns.t (id, s) VALUES (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN score SET DEFAULT 42")
    spark.sql(s"INSERT INTO $cat.ns.t (id, s) VALUES (3, 'c')")
    val rows = spark.sql(s"SELECT id, score FROM $cat.ns.t ORDER BY id")
      .as[(Long, Int)].collect().toSeq
    // id=1 predates the column (EXISTS_DEFAULT 7, unmoved by SET DEFAULT);
    // id=2 was materialized at 7; id=3 lands after SET DEFAULT 42.
    assert(rows == Seq((1L, 7), (2L, 7), (3L, 42)))
  }

  test("DROP DEFAULT makes omitted columns NULL; history unchanged") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN score INT DEFAULT 7")
    spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN score DROP DEFAULT")
    spark.sql(s"INSERT INTO $cat.ns.t (id, s) VALUES (2, 'b')")
    val rows = spark.sql(s"SELECT id, score FROM $cat.ns.t ORDER BY id")
      .as[(Long, Option[Int])].collect().toSeq
    assert(rows == Seq((1L, Some(7)), (2L, None)))
  }

  test("CREATE TABLE with DEFAULT feeds partial INSERTs from day one") {
    val (_, cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, s STRING, " +
      "score INT DEFAULT 5) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t (id, s) VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, 'b', 9)")
    val rows = spark.sql(s"SELECT id, score FROM $cat.ns.t ORDER BY id")
      .as[(Long, Int)].collect().toSeq
    assert(rows == Seq((1L, 5), (2L, 9)))
  }

  test("filters over the defaulted column see pre-column rows") {
    val (_, cat, store) = freshCat()
    store.commit("t", (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN score INT DEFAULT 7")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (100, 'x', 3)")
    // predicate pushdown must not drop old files: their rows satisfy
    // score = 7 via the existence default even though the footer has no
    // 'score' column (and no stats for it).
    assert(spark.sql(s"SELECT count(*) c FROM $cat.ns.t WHERE score = 7")
      .head().getLong(0) == 20L)
    assert(spark.sql(s"SELECT count(*) c FROM $cat.ns.t WHERE score < 5")
      .head().getLong(0) == 1L)
  }

  test("string and date defaults round-trip through the literal SQL") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN tag STRING DEFAULT 'unk'")
    spark.sql(
      s"ALTER TABLE $cat.ns.t ADD COLUMN d DATE DEFAULT DATE'2024-01-15'")
    spark.sql(s"INSERT INTO $cat.ns.t (id, s) VALUES (2, 'b')")
    val rows = spark.sql(s"SELECT id, tag, CAST(d AS STRING) dd " +
      s"FROM $cat.ns.t ORDER BY id")
      .as[(Long, String, String)].collect().toSeq
    assert(rows == Seq((1L, "unk", "2024-01-15"), (2L, "unk", "2024-01-15")))
  }
}
