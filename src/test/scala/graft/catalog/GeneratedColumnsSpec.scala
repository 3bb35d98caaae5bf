package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** `GENERATED ALWAYS AS (expr)` columns: the DDL's expression lands in
  * the schema metadata (Spark's own catalyst key), every SQL write path
  * computes the column from its siblings, explicit writes are refused,
  * and a generated PARTITION column gets the same partition-exact file
  * pruning as any identity column (Delta's generated-column layout). */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("gencol")
    val cat = s"ggc${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  test("by-name insert computes the generated column") {
    val (_, cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (a INT, b INT, " +
      "s BIGINT GENERATED ALWAYS AS (a + b)) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t (a, b) VALUES (1, 2), (10, 20)")
    val rows = spark.table(s"$cat.ns.t").select("a", "s")
      .as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1, 3L), (10, 30L)))
  }

  test("INSERT ... SELECT computes per row; explicit writes are refused") {
    val (_, cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (txt STRING, " +
      "len INT GENERATED ALWAYS AS (length(txt))) USING graft")
    Seq("ab", "abcd", "x").toDF("txt").createOrReplaceTempView("gc_src")
    spark.sql(s"INSERT INTO $cat.ns.t (txt) SELECT txt FROM gc_src")
    val got = spark.table(s"$cat.ns.t").as[(String, Int)]
      .collect().toMap
    assert(got == Map("ab" -> 2, "abcd" -> 4, "x" -> 1))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t (txt, len) VALUES ('zz', 99)")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('zz', 99)")
    }
  }

  test("positional insert with DEFAULT in the generated slot computes") {
    val (_, cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (a INT, " +
      "d INT GENERATED ALWAYS AS (a * 2)) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (5, DEFAULT), (7, DEFAULT)")
    val rows = spark.table(s"$cat.ns.t").as[(Int, Int)]
      .collect().toSeq.sortBy(_._1)
    assert(rows == Seq((5, 10), (7, 14)))
  }

  test("generated partition column lands the partition layout and prunes") {
    val (_, cat, store) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (ts TIMESTAMP, v INT, " +
      "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) USING graft " +
      "PARTITIONED BY (d)")
    spark.sql(s"INSERT INTO $cat.ns.t (ts, v) VALUES " +
      "(TIMESTAMP'2024-01-01 05:00:00', 1), " +
      "(TIMESTAMP'2024-01-01 19:00:00', 2), " +
      "(TIMESTAMP'2024-02-15 08:00:00', 3)")
    val m = store.manifests("t").maxBy(_.version)
    assert(m.partitionBy == Seq("d"))
    assert(m.files.forall(_.partitionValues.contains("d")))
    assert(m.files.map(_.partitionValues("d")).toSet ==
      Set("2024-01-01", "2024-02-15"))
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.t WHERE d = DATE'2024-01-01'")
      .as[Long].head() == 3L)
  }

  test("overwrite and update-shaped writes keep computing") {
    val (_, cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (a INT, " +
      "neg INT GENERATED ALWAYS AS (-a)) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t (a) VALUES (1)")
    spark.sql(s"INSERT OVERWRITE $cat.ns.t (a) VALUES (42)")
    val rows = spark.table(s"$cat.ns.t").as[(Int, Int)].collect().toSeq
    assert(rows == Seq((42, -42)))
  }

  test("UPDATE and MERGE recompute the generated column (CoW rewrite)") {
    val (_, cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (a INT, " +
      "dbl INT GENERATED ALWAYS AS (a * 2)) USING graft")
    spark.sql(s"INSERT INTO $cat.ns.t (a) VALUES (1), (2), (3)")
    spark.sql(s"UPDATE $cat.ns.t SET a = a + 10 WHERE a = 2")
    val afterUpdate = spark.table(s"$cat.ns.t").as[(Int, Int)]
      .collect().toSeq.sortBy(_._1)
    assert(afterUpdate == Seq((1, 2), (3, 6), (12, 24)),
      s"UPDATE must recompute dbl, got $afterUpdate")
    Seq(3, 4).toDF("a").createOrReplaceTempView("gcm_src")
    spark.sql(s"MERGE INTO $cat.ns.t t USING gcm_src s ON t.a = s.a " +
      "WHEN MATCHED THEN UPDATE SET a = s.a + 100 " +
      "WHEN NOT MATCHED THEN INSERT (a) VALUES (s.a)")
    val afterMerge = spark.table(s"$cat.ns.t").as[(Int, Int)]
      .collect().toSeq.sortBy(_._1)
    assert(afterMerge == Seq((1, 2), (4, 8), (12, 24), (103, 206)),
      s"MERGE must recompute dbl, got $afterMerge")
  }
}
