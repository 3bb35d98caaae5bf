package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def full(store: TableStore, src: String) =
    store.read(src).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  test("incremental refresh folds only the delta; result equals a full aggregate") {
    val store = new TableStore(spark, tmpDir("mv"))
    store.commit("src",
      Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)).toDF("g", "v"), "create")
    MatView.create(store, "src", "mv", Seq("g"), "v")
    assert(MatView.read(store, "mv").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq == full(store, "src"))
    // two appends, then one refresh: delta = 3 rows, mode incremental
    store.append("src", Seq(("b", 4.0), ("c", 5.0)).toDF("g", "v"))
    store.append("src", Seq(("a", 6.5)).toDF("g", "v"))
    val (v, deltaRows, mode) = MatView.refresh(store, "src", "mv", Seq("g"), "v")
    assert(mode == "incremental" && deltaRows == 3 && v == 3)
    assert(MatView.read(store, "mv").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq == full(store, "src"))
    // idempotent: same source version folds an empty delta
    val (_, zero, _) = MatView.refresh(store, "src", "mv", Seq("g"), "v")
    assert(zero == 0)
    assert(MatView.read(store, "mv").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq == full(store, "src"))
  }

  test("a rewrite in the source history falls back to a full recompute") {
    val store = new TableStore(spark, tmpDir("mv"))
    store.commit("src", Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v"), "create")
    MatView.create(store, "src", "mv", Seq("g"), "v")
    store.append("src", Seq(("c", 3.0)).toDF("g", "v"))
    store.compact("src") // non-append snapshot in the delta range
    val (_, _, mode) = MatView.refresh(store, "src", "mv", Seq("g"), "v")
    assert(mode == "full")
    assert(MatView.read(store, "mv").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq == full(store, "src"))
  }

  private def fullJoin(store: TableStore) =
    store.read("l").join(store.read("r"), Seq("k")).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  test("join view: one refresh after BOTH sides grow equals the full join") {
    val store = new TableStore(spark, tmpDir("mvj"))
    store.commit("l", Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), "create")
    store.commit("r", Seq((1L, "a"), (2L, "b")).toDF("k", "g"), "create")
    MatView.createJoin(store, "l", "r", "mv", Seq("k"), Seq("g"), "v")
    // ΔL joins old AND new R keys; ΔR matches old AND new L rows —
    // all three legs (ΔL⋈R_old, ΔL⋈ΔR, L_old⋈ΔR) are non-empty
    store.append("l", Seq((2L, 4.0), (3L, 8.0)).toDF("k", "v"))
    store.append("r", Seq((3L, "a")).toDF("k", "g"))
    val (_, _, deltaRows, mode) = MatView.refreshJoin(store, "l", "r",
      "mv", Seq("k"), Seq("g"), "v")
    assert(mode == "incremental" && deltaRows == 3, s"$mode/$deltaRows")
    assert(MatView.read(store, "mv").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq == fullJoin(store))
    // idempotent at the same versions
    val (_, _, zero, _) = MatView.refreshJoin(store, "l", "r", "mv",
      Seq("k"), Seq("g"), "v")
    assert(zero == 0L)
  }

  test("join view: a rewrite on either side falls back to full") {
    val store = new TableStore(spark, tmpDir("mvj"))
    store.commit("l", Seq((1L, 1.0)).toDF("k", "v"), "create")
    store.commit("r", Seq((1L, "a")).toDF("k", "g"), "create")
    MatView.createJoin(store, "l", "r", "mv", Seq("k"), Seq("g"), "v")
    store.append("r", Seq((1L, "b")).toDF("k", "g"))
    store.compact("r")
    val (_, _, _, mode) = MatView.refreshJoin(store, "l", "r", "mv",
      Seq("k"), Seq("g"), "v")
    assert(mode == "full")
    assert(MatView.read(store, "mv").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq == fullJoin(store))
  }
}
