package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(
      pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("transitive chains collapse to one component (A~B, B~C => A,B,C)") {
    val m = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint clusters stay disjoint; component is the min member id") {
    val m = cc(Seq((10L, 20L), (20L, 30L), (5L, 7L), (100L, 101L)))
    assert(m == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      5L -> 5L, 7L -> 5L, 100L -> 100L, 101L -> 100L))
  }

  test("cycles and reversed/duplicated pairs converge") {
    val m = cc(Seq((3L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long path converges within the round cap (pointer jumping)") {
    // A 64-node path has diameter 63; plain min-propagation would need 63
    // rounds — pointer jumping must land it well inside maxRounds = 30.
    val path = (0L until 63L).map(i => (i, i + 1))
    val m = cc(path)
    assert(m.values.toSet == Set(0L))
    assert(m.size == 64)
  }

  test("random graphs match a local union-find reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 120 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
      // Local union-find with min-id normalization.
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map(v => v -> find(v)).toMap
      assert(cc(edges) == want, s"trial $trial mismatch")
    }
  }

  test("nearDupComponents equals CC over expanded member pairs on fixtures") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaPairs = Clustering.connectedComponents(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8),
      "id_a", "id_b").as[(Long, Long)].collect().toMap
    val collapsed = Dedup.nearDupComponents(docs, "doc_id", "text",
      n = 3, threshold = 0.8).as[(Long, Long)].collect().toMap
    assert(collapsed == viaPairs)
  }

  test("clusters summary matches hand-computed membership") {
    val out = Clustering.clusters(
      Seq((1L, 2L), (2L, 5L), (8L, 9L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 5L), (8L, 2L, 9L)))
  }

  test("persistent footprint is bounded: intermediate rounds are freed") {
    // A 64-node path needs many propagation rounds; every round is
    // localCheckpoint-materialized, and each round's blocks must be freed
    // when its successor lands — only the returned frame's backing blocks
    // (plus at most the just-freed round awaiting async cleanup) remain.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = Clustering.connectedComponents(
      (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b"),
      "id_a", "id_b")
    labels.collect()
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.size <= 2,
      s"expected ≤2 surviving checkpoint RDDs, found ${mine.size}")
  }

  override def afterAll(): Unit = {
    // Free the final-round checkpoint blocks backing returned frames so
    // later suites' getPersistentRDDs assertions see a clean slate
    // (in an application ContextCleaner does this at frame GC).
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    super.afterAll()
  }

  test("contaminatedIds flags exactly the docs sharing an 8-gram with eval") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val train = Seq(
      // contains the full 8-gram "the quick brown fox jumps over the lazy"
      (1L, "prefix words the quick brown fox jumps over the lazy dog"),
      // shares only shorter fragments — no common 8-gram
      (2L, "the quick brown fox sleeps under a tree near the river bank"),
      (3L, "completely unrelated content about spark partitions and shuffles")
    ).toDF("doc_id", "text")
    val out = Contamination
      .contaminatedIds(train, evalSet, "doc_id", "text", n = 8)
      .as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("stratifiedByHash caps every stratum at k, deterministically") {
    val df = (1L to 200L).map(i => (s"src${i % 3}", i)).toDF("source", "doc_id")
    val s1 = graft.curation.Sampling
      .stratifiedByHash(df, Seq("source"), "doc_id", k = 10)
      .as[(String, Long)].collect().toSet
    val s2 = graft.curation.Sampling
      .stratifiedByHash(df.repartition(7), Seq("source"), "doc_id", k = 10)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2) // partitioning-independent
    val perStratum = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 10))
    assert(perStratum.keySet == Set("src0", "src1", "src2"))
  }
}
