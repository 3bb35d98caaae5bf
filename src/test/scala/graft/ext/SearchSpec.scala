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

  private def sortedIdx(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("incremental index refresh equals a full rebuild; rewrite forces full") {
    val store = new graft.core.TableStore(spark, tmpDir("graft_idx"))
    store.commit("c", docs.filter($"doc_id" <= 2L), "create")
    Search.createIndexTable(store, "c", "i", "doc_id", "text")
    store.append("c", docs.filter($"doc_id" === 3L || $"doc_id" === 4L))
    val (_, n1, m1) = Search.refreshIndex(store, "c", "i", "doc_id", "text")
    assert(m1 == "incremental" && n1 == 2L)
    assert(sortedIdx(store.read("i")) ==
      sortedIdx(Search.buildIndex(docs.filter($"doc_id" <= 4L), "doc_id", "text")))
    // idempotent: nothing new → empty delta
    val (_, n2, m2) = Search.refreshIndex(store, "c", "i", "doc_id", "text")
    assert(m2 == "incremental" && n2 == 0L)
    // a rewrite in the source history makes the delta unreadable → full
    store.compact("c")
    store.append("c", docs.filter($"doc_id" === 5L))
    val (_, _, m3) = Search.refreshIndex(store, "c", "i", "doc_id", "text")
    assert(m3 == "full")
    assert(sortedIdx(store.read("i")) ==
      sortedIdx(Search.buildIndex(docs, "doc_id", "text")))
  }

  test("concurrent refreshes never double-fold the same delta") {
    // Both refreshes read the same watermark, both build the delta's
    // postings; exactly one append must land — the loser re-checks the
    // commit-recorded watermark on CAS conflict and becomes a no-op.
    // (The interleaving is nondeterministic; the assertion is valid for
    // every schedule and catches the double-fold whenever the race
    // fires.)
    val store = new graft.core.TableStore(spark, tmpDir("graft_idx_race"))
    store.commit("c", docs.filter($"doc_id" <= 2L), "create")
    Search.createIndexTable(store, "c", "i", "doc_id", "text")
    store.append("c", docs.filter($"doc_id" > 2L))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Future.sequence((1 to 2).map(_ => Future {
      Search.refreshIndex(store, "c", "i", "doc_id", "text")
    }))
    val results = Await.result(runs, 120.seconds)
    assert(results.forall(_._3 == "incremental"))
    // at most one refresh reports folded rows; the other no-ops
    assert(results.count(_._2 > 0L) <= 1)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("token", "doc_id").collect().toSeq
    assert(sorted(store.read("i")) ==
      sorted(Search.buildIndex(docs, "doc_id", "text")))
  }

  test("rrfFuse: per-arm reciprocal contributions, id tiebreak, k bound") {
    import org.apache.spark.sql.functions.col
    val armA = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val armB = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("doc_id", "rank")
    val fused = Search.rrfFuse(Seq(armA, armB), "doc_id", "rank", k = 10)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3))).toSeq
    // doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/63; then 40 (1/62) > 30 (1/63)
    assert(fused.map(_._1) == Seq(20L, 10L, 40L, 30L))
    val f20 = fused.find(_._1 == 20L).get
    assert(f20._2 == Some(2L) && f20._3 == Some(1L))
    assert(f20._4 == 1.0 / 62.0 + 1.0 / 61.0)
    // single-arm docs carry a null rank for the missing arm
    assert(fused.find(_._1 == 30L).get._3.isEmpty)
    // cross-arm tie (rank 3 in exactly one arm each) breaks by id:
    // doc 30 (arm A rank 3) before doc 40 would be a tie only at equal
    // rank — here 40 has rank 2 in B so check the order is by score
    assert(fused.find(_._1 == 40L).get._4 == 1.0 / 62.0)
    // k bounds the fused list
    assert(Search.rrfFuse(Seq(armA, armB), "doc_id", "rank", k = 2)
      .count() == 2)
    // deterministic under repartitioning
    val again = Search.rrfFuse(
      Seq(armA.repartition(5), armB.repartition(3)), "doc_id", "rank", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(again == fused.map(_._1))
  }

  test("SQL: CALL refresh_index maintains the index table") {
    val wh = tmpDir("graft_idx_sql")
    val cat = s"gidx${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val store = new graft.core.TableStore(spark, wh)
    store.commit("c", docs.filter($"doc_id" <= 2L), "create")
    Search.createIndexTable(store, "c", "i", "doc_id", "text")
    store.append("c", docs.filter($"doc_id" > 2L))
    val r = spark.sql(s"CALL $cat.system.refresh_index(source => 'c', " +
      "index => 'i', id_col => 'doc_id', text_col => 'text')").collect()
    assert(r.head.getLong(1) == 3L && r.head.getString(2) == "incremental")
    assert(sortedIdx(spark.table(s"$cat.ns.i")) ==
      sortedIdx(Search.buildIndex(docs, "doc_id", "text")))
  }
}
