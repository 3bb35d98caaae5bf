package graft.ext

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Local reference: contiguous fill over md5(id) order. */
  private def expected(docs: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var off = 0L
    docs.sortBy { case (id, _) => (md5hex(id.toString), id) }.map {
      case (id, tok) =>
        val bin = off / budget
        off += tok
        id -> bin
    }.toMap
  }

  test("contiguousFill matches the local reference bin assignment") {
    val docs = (1L to 300L).map(i => (i, 1L + (i * 37) % 500))
    val out = Packing.contiguousFill(
      docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok", budgetTokens = 1000L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(out == expected(docs, 1000L))
  }

  test("result is independent of input partitioning and bucket fan-out") {
    val docs = (1L to 200L).map(i => (i, 10L + i % 90))
    val df = docs.toDF("doc_id", "n_tok")
    val a = Packing.contiguousFill(df, "doc_id", "n_tok", 512L, bucketNibbles = 1)
      .select("doc_id", "offset", "bin").as[(Long, Long, Long)].collect().toSet
    val b = Packing.contiguousFill(df.repartition(13), "doc_id", "n_tok", 512L,
      bucketNibbles = 2)
      .select("doc_id", "offset", "bin").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  override def afterAll(): Unit = {
    // Free checkpoint blocks backing returned frames (ContextCleaner's
    // job at frame GC in an application) so later suites start clean.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    super.afterAll()
  }

  test("offsets are a permutation-exact prefix sum (no token lost)") {
    val docs = (1L to 150L).map(i => (i, i % 13 + 1))
    val out = Packing.contiguousFill(
      docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok", 100L)
      .select("offset", "n_tokens").as[(Long, Long)].collect().sortBy(_._1)
    var expectedOff = 0L
    out.foreach { case (off, tok) =>
      assert(off == expectedOff, s"gap/overlap at offset $off")
      expectedOff += tok
    }
    assert(expectedOff == docs.map(_._2).sum)
  }

  test("docs longer than the budget keep their start bin; bins stay sorted") {
    val docs = Seq((1L, 50L), (2L, 5000L), (3L, 60L), (4L, 70L))
    val out = Packing.contiguousFill(
      docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok", 1000L)
      .select("doc_id", "offset", "bin").as[(Long, Long, Long)].collect()
    out.foreach { case (_, off, bin) => assert(bin == off / 1000L) }
  }
}
