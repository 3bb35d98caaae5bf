package graft.curation

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Golden-fixture port of the reference's SCD2 E2E suite
  * (reference/src/data_curation/tests/create_test_data.py:125-305, see
  * FIXTURES.md §1): full load → cdc_1 simple update → cdc_2 pure insert →
  * cdc_3 LATE-ARRIVING update re-linking the history chain.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val Sentinel = "2250-01-01 00:00:00"

  private def batch(rows: (String, Int, String, String)*): DataFrame =
    rows.toDF("pk", "qty", "ts_s", "op")
      .withColumn("extraction_timestamp", to_timestamp(col("ts_s")))
      .drop("ts_s")
      .select("pk", "qty", "extraction_timestamp", "op")

  private def state(store: TableStore, t: String): Seq[(String, Int, String, String, Boolean)] =
    store.read(t)
      .select(col("pk"), col("qty"),
        date_format(col("start_datetime"), "yyyy-MM-dd").as("s"),
        date_format(col("end_datetime"), "yyyy-MM-dd").as("e"),
        col("is_current"))
      .as[(String, Int, String, String, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  private def setup(): TableStore = {
    val store = new TableStore(spark, tmpDir("scd2"))
    Scd2.bulkInsert(store, "t",
      batch(("A", 1, "2022-01-01 00:00:00", null),
            ("B", 1, "2022-01-01 00:00:00", null)))
    store
  }

  test("bulk insert: all rows current with sentinel end (expected output " +
    "create_test_data.py:180-200)") {
    val store = setup()
    assert(state(store, "t") == Seq(
      ("A", 1, "2022-01-01", "2250-01-01", true),
      ("B", 1, "2022-01-01", "2250-01-01", true)))
  }

  test("cdc_1 simple update closes the old version and inserts the new") {
    val store = setup()
    Scd2.scd2Simple(store, "t", batch(("A", 3, "2022-03-01 00:00:00", "U")))
    assert(state(store, "t") == Seq(
      ("A", 1, "2022-01-01", "2022-03-01", false),
      ("A", 3, "2022-03-01", "2250-01-01", true),
      ("B", 1, "2022-01-01", "2250-01-01", true)))
  }

  test("cdc_2 pure insert appends a new current key, others untouched") {
    val store = setup()
    Scd2.scd2Simple(store, "t", batch(("A", 3, "2022-03-01 00:00:00", "U")))
    Scd2.scd2Simple(store, "t", batch(("C", 4, "2022-04-01 00:00:00", "I")))
    assert(state(store, "t") == Seq(
      ("A", 1, "2022-01-01", "2022-03-01", false),
      ("A", 3, "2022-03-01", "2250-01-01", true),
      ("B", 1, "2022-01-01", "2250-01-01", true),
      ("C", 4, "2022-04-01", "2250-01-01", true)))
  }

  test("cdc_3 LATE-ARRIVING update re-links the whole chain " +
    "(expected rows create_test_data.py:261-305)") {
    val store = setup()
    Scd2.scd2Simple(store, "t", batch(("A", 3, "2022-03-01 00:00:00", "U")))
    Scd2.scd2Simple(store, "t", batch(("C", 4, "2022-04-01 00:00:00", "I")))
    Scd2.scd2Complex(store, "t", batch(("A", 2, "2022-02-01 00:00:00", "U")))
    assert(state(store, "t") == Seq(
      ("A", 1, "2022-01-01", "2022-02-01", false),
      ("A", 2, "2022-02-01", "2022-03-01", false),
      ("A", 3, "2022-03-01", "2250-01-01", true),
      ("B", 1, "2022-01-01", "2250-01-01", true),
      ("C", 4, "2022-04-01", "2250-01-01", true)))
  }

  test("scd2Complex is idempotent on replayed batches") {
    val store = setup()
    val late = batch(("A", 2, "2022-02-01 00:00:00", "U"))
    Scd2.scd2Simple(store, "t", batch(("A", 3, "2022-03-01 00:00:00", "U")))
    Scd2.scd2Complex(store, "t", late)
    val once = state(store, "t")
    Scd2.scd2Complex(store, "t", late)
    assert(state(store, "t") == once)
  }

  test("scd2Complex result is independent of delta arrival order") {
    val d1 = batch(("A", 3, "2022-03-01 00:00:00", "U"))
    val d2 = batch(("A", 2, "2022-02-01 00:00:00", "U"))
    val s1 = setup(); Scd2.scd2Complex(s1, "t", d1); Scd2.scd2Complex(s1, "t", d2)
    val s2 = setup(); Scd2.scd2Complex(s2, "t", d2); Scd2.scd2Complex(s2, "t", d1)
    val s3 = setup(); Scd2.scd2Complex(s3, "t", d1.unionByName(d2))
    assert(state(s1, "t") == state(s2, "t"))
    assert(state(s1, "t") == state(s3, "t"))
  }

  test("SCD2 invariants: exactly one current row per pk; intervals chain " +
    "without gaps or overlaps") {
    val store = setup()
    Scd2.scd2Simple(store, "t", batch(("A", 3, "2022-03-01 00:00:00", "U")))
    Scd2.scd2Complex(store, "t", batch(("A", 2, "2022-02-01 00:00:00", "U")))
    val df = store.read("t")
    val currents = df.filter(col("is_current")).groupBy("pk").count()
      .filter(col("count") =!= 1).count()
    assert(currents == 0, "each pk must have exactly one current row")
    // each row's end must equal the next row's start within the pk chain
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pk").orderBy("start_datetime")
    val broken = df
      .withColumn("next_start", lead(col("start_datetime"), 1).over(w))
      .filter(col("next_start").isNotNull &&
        col("end_datetime") =!= col("next_start"))
      .count()
    assert(broken == 0, "version intervals must partition time")
  }

  test("skewed CDC batch: 90% of delta rows on ONE pk still yields a " +
    "correct chain (the CurationBench skew cell's correctness anchor)") {
    val store = setup()
    // 1000 successive versions of hot pk "A" + a handful on other keys —
    // the re-chain window sees one deep partition, the merge join one
    // heavy key; results must match the batch-derived chain exactly.
    val hot = (1 to 1000).map(i =>
      ("A", i, f"2022-02-01 ${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d", "U"))
    val cold = Seq(("B", 7, "2022-02-01 00:00:01", "U"),
      ("ZZZ", 1, "2022-02-01 00:00:02", "U"))
    Scd2.scd2Complex(store, "t", batch((hot ++ cold): _*))
    val df = store.read("t")
    // exactly one current row per pk, chain contiguous
    assert(df.filter(col("is_current")).groupBy("pk").count()
      .filter(col("count") =!= 1).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pk").orderBy("start_datetime")
    assert(df.withColumn("next_start", lead(col("start_datetime"), 1).over(w))
      .filter(col("next_start").isNotNull &&
        col("end_datetime") =!= col("next_start")).count() == 0)
    // hot key: bulk row + 1000 versions; current one is the max-ts version
    assert(df.filter(col("pk") === "A").count() == 1001)
    assert(df.filter(col("pk") === "A" && col("is_current"))
      .select("qty").as[Int].head() == 1000)
  }

  test("latestPerKey keeps exactly the newest row per key") {
    val df = Seq(
      (1, "2024-01-01 00:00:00", "old"),
      (1, "2024-01-03 00:00:00", "new"),
      (2, "2024-01-02 00:00:00", "only")
    ).toDF("id", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Scd2.latestPerKey(df, Seq("id"), "ts")
      .select("id", "v").as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "new"), (2, "only")))
  }

  test("applyCdcDeltas: employees-style day-3 batch (FIXTURES.md §2)") {
    val store = new TableStore(spark, tmpDir("cdc"))
    store.commit("emp", Seq(
      (1, "hr", false, "2024-01-01 00:00:00"),
      (5, "it", false, "2024-01-02 00:00:00"),
      (7, "ops", false, "2024-01-02 00:00:00")
    ).toDF("employee_id", "dept", "record_deleted", "d")
      .withColumn("date_received", to_timestamp(col("d"))).drop("d"), "create")
    val day3 = Seq(
      (1, "hr", true, "2024-01-03 00:00:00"),   // delete
      (7, "fin", false, "2024-01-03 00:00:00"), // move dept
      (7, "sec", false, "2024-01-04 00:00:00"), // later same-batch update wins
      (9, "new", false, "2024-01-03 00:00:00")  // insert
    ).toDF("employee_id", "dept", "record_deleted", "d")
      .withColumn("date_received", to_timestamp(col("d"))).drop("d")
    Scd2.applyCdcDeltas(store, "emp", day3, Seq("employee_id"), "date_received")
    val out = store.read("emp").select("employee_id", "dept")
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((5, "it"), (7, "sec"), (9, "new")))
  }
}
