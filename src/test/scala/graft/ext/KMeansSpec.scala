package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic synthetic corpus: 3 well-separated groups on axes of an
  // 8-dim space plus per-vector jitter (scale 0 makes group members
  // identical, so group purity holds by construction for any seeding).
  private def corpus(n: Int, jitter: Double = 0.1) = {
    val rows = (0 until n).map { i =>
      val g = i % 3
      val base = Array.fill(8)(jitter * ((i * 7 + 3) % 5))
      base(g) = 1.0
      (i.toLong, base.map(_.toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("assignment is independent of partitioning (exact integer sums)") {
    val df = corpus(90)
    val a = KMeans.assign(df.repartition(7), k = 3, iters = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val b = KMeans.assign(df.repartition(2), k = 3, iters = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._2).distinct.sorted == Seq(0, 1, 2))
  }

  test("well-separated groups land in pure clusters") {
    val df = corpus(90, jitter = 0.0)
    val byGroup = KMeans.assign(df, k = 3, iters = 4)
      .withColumn("g", (col("vec_id") % 3).cast("int"))
      .groupBy(col("g")).agg(countDistinct(col("cluster")).as("nc"))
      .as[(Int, Long)].collect().toMap
    assert(byGroup.values.toSet == Set(1L), s"mixed clusters: $byGroup")
  }

  test("empty clusters keep their centroid (k > natural groups)") {
    // k=6 over 3 groups: some clusters may end empty; assign must still
    // return a defined, stable result using the carried-forward centroids.
    val df = corpus(30)
    val a = KMeans.assign(df, k = 6, iters = 4).count()
    assert(a == 30)
  }

  test("semDedup flags the higher id of an identical-vector pair") {
    val base = corpus(30)
    val clone = base.filter(col("vec_id") === 4L)
      .select(lit(1000L).as("vec_id"), col("embedding"))
    val out = KMeans.semDedup(base.union(clone), k = 3, iters = 3, thrPct = 99)
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1000L), "identical clone not flagged")
    assert(!out(4L), "lower-id representative must survive")
  }

  test("semDedup is deterministic across partitionings") {
    val df = corpus(60)
    val a = KMeans.semDedup(df.repartition(5), k = 3, iters = 3, thrPct = 95)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    val b = KMeans.semDedup(df.repartition(1), k = 3, iters = 3, thrPct = 95)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("probe rank 1 over corpus codes equals the assignment") {
    val df = corpus(90)
    val (assigned, cents) = KMeans.assignWithCentroids(df, k = 3, iters = 3)
    val codes = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("codes"), x => x.cast("double")).as("__q"))
    val p1 = KMeans.probe(codes, cents, nprobe = 1, "__q")
      .select(col("vec_id"), col("cluster"))
      .as[(Long, Int)].collect().toMap
    val a = assigned.select(col("vec_id"), col("cluster"))
      .as[(Long, Int)].collect().toMap
    assert(p1 == a, "nearest probed centroid must be the assigned cluster")
    // nprobe=3 emits every centroid once per row, ranks 1..3
    val p3 = KMeans.probe(codes.limit(1), cents, nprobe = 3, "__q")
      .select(col("probe_rank"), col("cluster")).collect()
    assert(p3.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    assert(p3.map(_.getInt(1)).distinct.length == 3)
  }
}
