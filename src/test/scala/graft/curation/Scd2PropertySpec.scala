package graft.curation

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized SCD2 invariants (SURVEY.md §5 "property tests"): for ANY
  * sequence of CDC deltas — duplicates, late arrivals, interleaved keys —
  * scd2Complex must keep exactly one current row per key, partition time
  * without gaps or overlaps, be idempotent under replay, and be
  * independent of delta arrival order. Seeded generation keeps runs
  * reproducible.
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomBatch(rnd: Random, maxRows: Int = 10): List[(String, Int, String)] =
    List.fill(1 + rnd.nextInt(maxRows)) {
      val pk = ("A".charAt(0) + rnd.nextInt(4)).toChar.toString
      val day = 1 + rnd.nextInt(28)
      (pk, 1 + rnd.nextInt(99), f"2022-01-$day%02d 00:00:00")
    }

  private def toDf(rows: List[(String, Int, String)]): DataFrame =
    rows.toDF("pk", "qty", "ts_s")
      .withColumn("extraction_timestamp", to_timestamp(col("ts_s"))).drop("ts_s")

  private def applyAll(batches: List[List[(String, Int, String)]]): Seq[(String, Int, String, String, Boolean)] = {
    val store = new TableStore(spark, tmpDir("prop"))
    store.commit("t",
      Scd2.withScd2Columns(toDf(List(("Z", 0, "2021-01-01 00:00:00")))), "bulk_insert")
    batches.filter(_.nonEmpty).foreach(b => Scd2.scd2Complex(store, "t", toDf(b)))
    store.read("t")
      .select(col("pk"), col("qty"),
        date_format(col("start_datetime"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("end_datetime"), "yyyy-MM-dd HH:mm:ss").as("e"),
        col("is_current"))
      .as[(String, Int, String, String, Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
  }

  private def invariantsHold(state: Seq[(String, Int, String, String, Boolean)]): Boolean =
    state.groupBy(_._1).values.forall { rows =>
      val sorted = rows.sortBy(_._3)
      rows.count(_._5) == 1 && sorted.last._5 &&
        sorted.sliding(2).forall {
          case Seq(a, b) => a._4 == b._3 // end == next start, no gap/overlap
          case _ => true
        }
    }

  test("invariants hold for arbitrary delta sequences") {
    (1 to 6).foreach { seed =>
      val rnd = new Random(seed)
      val state = applyAll(List.fill(3)(randomBatch(rnd)))
      assert(invariantsHold(state), s"invariants violated for seed=$seed: $state")
    }
  }

  test("replaying the same batch is a no-op (idempotence)") {
    (10 to 13).foreach { seed =>
      val b = randomBatch(new Random(seed))
      assert(applyAll(List(b)) == applyAll(List(b, b)), s"seed=$seed not idempotent")
    }
  }

  test("result is independent of batch arrival order") {
    (20 to 22).foreach { seed =>
      val rnd = new Random(seed)
      val (b1, b2) = (randomBatch(rnd), randomBatch(rnd))
      assert(applyAll(List(b1, b2)) == applyAll(List(b2, b1)),
        s"seed=$seed order-dependent")
    }
  }
}
