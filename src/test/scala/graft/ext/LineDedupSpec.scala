package graft.ext

import graft.SparkSpec

/** C4-style line dedup with rewrite: shared lines survive only in their
  * smallest-id document; documents reassemble from surviving lines in
  * original order. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha\nshared footer\nbeta"),
    (1L, "gamma\nshared footer"),
    (2L, "shared footer"),
    (3L, "unique only"))

  test("keeper keeps, later docs lose, order preserved") {
    val out = LineDedup.dedupLines(docs.toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((3L, 3L, "alpha\nshared footer\nbeta")))
    assert(out(1L) == ((2L, 1L, "gamma")))
    // every line dropped -> empty rewrite, row survives
    assert(out(2L) == ((1L, 0L, "")))
    assert(out(3L) == ((1L, 1L, "unique only")))
  }

  test("result is partitioning-independent") {
    val df = docs.toDF("id", "t")
    val a = LineDedup.dedupLines(df.repartition(7), "id", "t")
      .orderBy("id").collect().toSeq
    val b = LineDedup.dedupLines(df.coalesce(1), "id", "t")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("duplicate lines WITHIN one document are untouched") {
    val out = LineDedup.dedupLines(
      Seq((7L, "x\nx\ny")).toDF("id", "t"), "id", "t").collect()
    assert(out.length == 1 && out.head.getString(3) == "x\nx\ny")
  }
}
