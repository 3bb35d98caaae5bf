package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  test("gaps densify onto the per-key grid and carry the last sum forward") {
    // key a: events at hours 1, 1, 4 (gap at 2, 3); key b: hour 2 only
    val df = Seq(("a", ts(1), 10L), ("a", ts(1), 5L), ("a", ts(4), 7L),
      ("b", ts(2), 3L)).toDF("k", "t", "v")
    val got = GapFill.locf(df, "k", "t", "hour", col("v"))
      .select($"k", hour($"bucket").as("h"), $"n_events", $"v_locf")
      .as[(String, Int, Long, Long)].collect().toSet
    val want = Set(
      ("a", 1, 2L, 15L), // two events, sum 15
      ("a", 2, 0L, 15L), // gap: carried
      ("a", 3, 0L, 15L), // gap: carried
      ("a", 4, 1L, 7L),  // new observation replaces the carry
      ("b", 2, 1L, 3L))  // b's grid spans only its own hour
    assert(got == want, s"got $got")
  }

  test("a key with no gaps is the identity aggregate") {
    val df = Seq(("k", ts(5), 1L), ("k", ts(6), 2L)).toDF("k", "t", "v")
    val got = GapFill.locf(df, "k", "t", "hour", col("v"))
      .agg(sum($"n_events"), count(lit(1))).as[(Long, Long)].head()
    assert(got == ((2L, 2L)))
  }
}
