package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup equals the window-rank formulation") {
    // skewed groups: one tiny (< k), one exactly k, one large with ties
    val rows = Seq.tabulate(500) { i =>
      val g = if (i < 2) "tiny" else if (i < 5) "exact" else "big"
      (g, (i * 7919L) % 97, i.toLong) // score collisions in "big"
    }
    val df = rows.toDF("g", "score", "id")
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "id", k = 3)
      .select($"g", $"rank", $"id", $"score")
      .as[(String, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 3)
      .select($"g", $"rank", $"id", $"score")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == want, s"got ${got -- want} extra, missing ${want -- got}")
    // the tiny group yields all its rows, never padded
    assert(got.count(_._1 == "tiny") == 2)
  }

  test("partial buffers merge to the global top-k across partitions") {
    val df = spark.range(0, 10000, 1, 16)
      .select(lit("g").as("g"), (col("id") % 1000).as("score"),
        col("id").as("id"))
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "id", k = 4)
      .select($"rank", $"id", $"score").as[(Int, Long, Long)]
      .collect().toList.sortBy(_._1)
    // global best: score 999 at ids 999, 1999, 2999, 3999 (id ASC ties)
    assert(got == List((1, 999L, 999L), (2, 1999L, 999L),
      (3, 2999L, 999L), (4, 3999L, 999L)), got.toString)
  }
}
