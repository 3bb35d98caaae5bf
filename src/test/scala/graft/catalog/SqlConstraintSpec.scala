package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.functions._

/** The standard SQL face of CHECK constraints (SUPPORT_TABLE_CONSTRAINT):
  * `ALTER TABLE … ADD CONSTRAINT c CHECK (…)` validates all existing
  * rows then enforces every later write; `DROP CONSTRAINT` is
  * metadata-only; inline `CREATE TABLE … CHECK` and CTAS constraints
  * commit atomically with the data. Shares storage with the
  * `CALL add_check_constraint` procedure face. */
class SqlConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("sqlcon")
    val cat = s"gsc${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  test("ADD CONSTRAINT validates existing rows and enforces new writes") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, 10), (2L, 20)).toDF("id", "qty"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    assert(store.checkConstraints("t") == Seq("qty_pos" -> "qty > 0"))
    // violating insert is refused inside the write
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, -5)")
    }
    assert(spark.table(s"$cat.ns.t").count() == 2)
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 5)")
    assert(spark.table(s"$cat.ns.t").count() == 3)
  }

  test("ADD CONSTRAINT aborts when existing rows violate it") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, -1)).toDF("id", "qty"), "create")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.t ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    }
    assert(store.checkConstraints("t").isEmpty)
  }

  test("DROP CONSTRAINT is metadata-only; IF EXISTS tolerates absence") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, 10)).toDF("id", "qty"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    spark.sql(s"ALTER TABLE $cat.ns.t DROP CONSTRAINT qty_pos")
    assert(store.checkConstraints("t").isEmpty)
    spark.sql(s"ALTER TABLE $cat.ns.t DROP CONSTRAINT IF EXISTS nope")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, -5)") // no longer enforced
    assert(spark.table(s"$cat.ns.t").count() == 2)
  }

  test("inline CREATE TABLE CHECK constraint enforces from the start") {
    val (_, cat, store) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, qty INT, " +
      "CONSTRAINT qty_pos CHECK (qty > 0)) USING graft")
    assert(store.checkConstraints("t") == Seq("qty_pos" -> "qty > 0"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 0)")
    }
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 1)")
    assert(spark.table(s"$cat.ns.t").count() == 1)
  }

  test("REPLACE TABLE with an inline CHECK carries it into the fresh epoch") {
    // (Spark's parser forbids constraints in CTAS/RTAS, so the staged
    // path is reached via plain REPLACE — fresh schema + fresh checks.)
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, -5)).toDF("id", "qty"), "create")
    spark.sql(s"REPLACE TABLE $cat.ns.t (id BIGINT, qty INT, " +
      "CONSTRAINT qty_pos CHECK (qty > 0)) USING graft")
    assert(store.checkConstraints("t") == Seq("qty_pos" -> "qty > 0"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, -1)")
    }
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, 1)")
    assert(spark.table(s"$cat.ns.t").count() == 1)
    // the pre-replace epoch (with its violating row) still time-travels
    assert(spark.sql(s"SELECT qty FROM $cat.ns.t VERSION AS OF 1")
      .as[Int].head() == -5)
  }

  test("DESCRIBE surfaces the constraint via Table.constraints()") {
    val (_, cat, store) = freshCat()
    store.commit("t", Seq((1L, 10)).toDF("id", "qty"), "create")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t"))
    val cs = tbl.constraints()
    assert(cs.length == 1 && cs.head.name() == "qty_pos")
  }
}
