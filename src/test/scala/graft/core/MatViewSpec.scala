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
}
