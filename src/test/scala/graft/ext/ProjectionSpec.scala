package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Signed random projection: linearity against the deterministic sign
  * matrix, JL norm concentration, and null handling. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("basis vectors project to exactly their matrix column") {
    // e_i quantizes to 127 at position i: proj_j must equal 127·s(j,i)
    val dim = 8
    val rows = (0 until dim).map { i =>
      (i.toLong, (0 until dim).map(k => if (k == i) 1.0f else 0.0f))
    }
    val got = Projection.signedProject(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", dim, 4)
      .orderBy("vec_id").collect()
    got.foreach { r =>
      val i = r.getLong(0).toInt + 1
      val proj = r.getSeq[Long](1)
      (1 to 4).foreach { j =>
        assert(proj(j - 1) == 127L * Projection.signOf(j, i),
          s"vec e_$i, component $j")
      }
    }
  }

  test("JL norm concentration: E[||p||^2] ~ outDim * ||q||^2") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map(i =>
      (i.toLong, (0 until 64).map(_ => rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val proj = Projection.signedProject(df, "vec_id", "embedding", 64, 16)
    val codes = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("vec_id"), expr(
        "aggregate(transform(codes, c -> CAST(c*c AS BIGINT)), 0L, (a,x)->a+x)")
        .as("q2"))
    val ratios = proj.join(codes, "vec_id")
      .select((expr(
        "aggregate(transform(proj, p -> p*p), 0L, (a,x)->a+x)").cast("double")
        / (col("q2") * 16.0)).as("r"))
      .collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.6 && mean < 1.4, s"norm ratio mean $mean outside JL band")
  }

  test("null vectors are dropped; projection is deterministic") {
    val df = Seq(
      (0L, Some((0 until 64).map(_.toFloat))),
      (1L, None)).toDF("vec_id", "embedding")
    val a = Projection.signedProject(df, "vec_id", "embedding", 64, 16)
      .collect()
    assert(a.length == 1 && a.head.getLong(0) == 0L)
    val b = Projection.signedProject(df.repartition(5), "vec_id",
      "embedding", 64, 16).collect()
    assert(a.head.getSeq[Long](1) == b.head.getSeq[Long](1))
  }
}
