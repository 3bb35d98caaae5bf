package graft.ext

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark table query table"),
    (2L, "table only here"),
    (3L, "query only here"),
    (4L, "query table query"),
    (5L, "nothing relevant")
  ).toDF("doc_id", "text")

  test("index holds per-doc term frequencies") {
    val idx = Search.buildIndex(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(idx.contains(("table", 1L, 2L)))
    assert(idx.contains(("query", 4L, 2L)))
    assert(!idx.exists(_._1 == "table") == false)
  }

  test("conjunctive search requires every term; scores by tf sum with id tiebreak") {
    val idx = Search.buildIndex(docs, "doc_id", "text")
    val hits = Search.searchAll(idx, "doc_id", Seq("table", "query"), 10)
      .as[(Long, Long)].collect().toSeq
    // docs 1 (tf 2+1=3) and 4 (tf 1+2=3) contain both; tie → id order
    assert(hits == Seq((1L, 3L), (4L, 3L)))
    // k bounds the result
    assert(Search.searchAll(idx, "doc_id", Seq("table", "query"), 1)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 3L)))
    // duplicate terms in the query don't inflate the AND arity
    assert(Search.searchAll(idx, "doc_id", Seq("table", "table"), 10)
      .as[(Long, Long)].collect().toMap.keySet == Set(1L, 2L, 4L))
  }
}
