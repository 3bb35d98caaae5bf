package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import graft.core.TableStore.{ColStats, FileEntry}
import graft.core.TopKFilePruning
import org.apache.spark.sql.functions._

/** LIMIT / ORDER BY ... LIMIT pushdown into the manifest-backed scan:
  * a LIMIT covers from the fewest files whose recorded row counts reach
  * k, and a top-k keeps only files some valid answer can need (strict-
  * dominance witnesses on the leading sort key, null counts honored).
  * The gate is twofold every time: the pruned plan's ANSWER equals the
  * unpruned computation, and the scan really read fewer files. */
class TopKPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def fe(path: String, rows: Long, min: String, max: String,
      nulls: Long = 0L, kind: String = "long"): FileEntry =
    FileEntry(path, sizeBytes = 1L, rowCount = rows,
      stats = Map("c" -> ColStats(min, max, kind, nulls)))

  // ------------------------------------------------------------ unit: LIMIT
  test("forLimit picks a fewest-files cover and bails on unknown counts") {
    val files = Seq(fe("a", 10, "0", "9"), fe("b", 100, "10", "99"),
      fe("c", 5, "100", "104"))
    val kept = TopKFilePruning.forLimit(files, 50).get
    assert(kept.map(_.path) == Seq("b"))
    // unknown row count anywhere → no pruning
    val unknown = files :+ FileEntry("d", sizeBytes = 9L, rowCount = 0L)
    assert(TopKFilePruning.forLimit(unknown, 50).isEmpty)
    // total ≤ k → nothing to prune
    assert(TopKFilePruning.forLimit(files, 200).isEmpty)
  }

  // ------------------------------------------------------------ unit: top-k
  test("forTopK asc keeps the low files only") {
    val files = Seq(fe("lo", 50, "0", "49"), fe("mid", 50, "50", "99"),
      fe("hi", 50, "100", "149"))
    val kept = TopKFilePruning.forTopK(files, "c", asc = true,
      nullsFirst = true, k = 10, Set.empty, singleKey = true).get
    assert(kept.map(_.path) == Seq("lo"))
    val keptDesc = TopKFilePruning.forTopK(files, "c", asc = false,
      nullsFirst = false, k = 10, Set.empty, singleKey = true).get
    assert(keptDesc.map(_.path) == Seq("hi"))
  }

  test("forTopK is jointly sound on identical files (no mutual skip)") {
    // pairwise reasoning would let each file cite the other and skip both
    val files = Seq(fe("a", 10, "5", "5"), fe("b", 10, "5", "5"))
    val kept = TopKFilePruning.forTopK(files, "c", asc = true,
      nullsFirst = true, k = 10, Set.empty, singleKey = true)
    // either keeps one file (10 witness rows ≤ T=5 cover k) or keeps all
    kept.foreach(ks => assert(ks.map(_.rowCount).sum >= 10))
    assert(kept.forall(_.nonEmpty))
  }

  test("forTopK never drops null rows under NULLS FIRST") {
    // 'hiWithNulls' has huge values BUT nulls that outrank everything
    val files = Seq(fe("lo", 50, "0", "49"),
      fe("hiWithNulls", 50, "1000", "1049", nulls = 3L))
    val kept = TopKFilePruning.forTopK(files, "c", asc = true,
      nullsFirst = true, k = 10, Set.empty, singleKey = true)
    assert(kept.forall(_.exists(_.path == "hiWithNulls")))
    // unknown null count must be treated as "may hold nulls"
    val unknown = Seq(fe("lo", 50, "0", "49"),
      fe("hiUnknown", 50, "1000", "1049", nulls = -1L))
    val kept2 = TopKFilePruning.forTopK(unknown, "c", asc = true,
      nullsFirst = true, k = 10, Set.empty, singleKey = true)
    assert(kept2.forall(_.exists(_.path == "hiUnknown")))
    // NULLS LAST: the same nulls trail, so the high file IS skippable
    val keptLast = TopKFilePruning.forTopK(files, "c", asc = true,
      nullsFirst = false, k = 10, Set.empty, singleKey = true).get
    assert(keptLast.map(_.path) == Seq("lo"))
  }

  test("null-cover shortcut fires single-key only") {
    val files = Seq(fe("nulls", 20, "0", "0", nulls = 20L),
      fe("vals", 50, "1", "50"))
    val single = TopKFilePruning.forTopK(files, "c", asc = true,
      nullsFirst = true, k = 10, Set.empty, singleKey = true).get
    assert(single.map(_.path) == Seq("nulls"))
    // with a tie-break column, specific null rows are not interchangeable:
    // the value file is still skippable by thresholds, but the null file
    // must survive — and here no threshold can skip 'vals' rows below
    // witnesses, so everything is kept
    val multi = TopKFilePruning.forTopK(files, "c", asc = true,
      nullsFirst = true, k = 10, Set.empty, singleKey = false)
    assert(multi.forall(_.exists(_.path == "nulls")))
  }

  test("forTopK bails on dropped columns, stat-less files and NaN bounds") {
    val files = Seq(fe("a", 10, "0", "9"), fe("b", 10, "10", "19"))
    assert(TopKFilePruning.forTopK(files, "c", asc = true, nullsFirst = true,
      k = 5, Set("c"), singleKey = true).isEmpty)
    val statless = files :+ FileEntry("s", 9L, rowCount = 7L)
    assert(TopKFilePruning.forTopK(statless, "c", asc = true,
      nullsFirst = true, k = 5, Set.empty, singleKey = true).isEmpty)
    val nan = Seq(fe("a", 10, "0.0", "NaN", kind = "double"),
      fe("b", 10, "10.0", "19.0", kind = "double"))
    assert(TopKFilePruning.forTopK(nan, "c", asc = true, nullsFirst = true,
      k = 5, Set.empty, singleKey = true).isEmpty)
  }

  // ------------------------------------------------------- end-to-end (SQL)
  private def freshCat(): (String, String, TableStore) = {
    val wh = tmpDir("topk")
    val cat = s"gtopk${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (wh, cat, new TableStore(spark, wh))
  }

  private def scanFileCounts(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.graft.GraftStatsScan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val self = p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: org.apache.spark.sql.graft.GraftStatsScan => Seq(g)
            case _ => Seq.empty
          }
        case _ => Seq.empty
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      self ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).map(_.currentFileCount)
  }

  test("SQL ORDER BY LIMIT reads fewer files and matches the full sort") {
    val (_, cat, store) = freshCat()
    val df = (0 until 8000).map(i => (i.toLong, s"s${i % 97}", i % 13))
      .toDF("id", "tag", "grp")
    store.commit("t", df.repartitionByRange(8, col("id")), "create")
    assert(store.manifests("t").maxBy(_.version).files.size >= 8)

    val q = spark.sql(s"SELECT id, tag FROM $cat.ns.t ORDER BY id LIMIT 7")
    val got = q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == (0 until 7).map(i => (i.toLong, s"s${i % 97}")))
    val counts = scanFileCounts(q)
    assert(counts.nonEmpty && counts.head < 8,
      s"top-k should have pruned files, scanned ${counts.headOption}")

    val qd = spark.sql(
      s"SELECT id FROM $cat.ns.t ORDER BY id DESC, tag LIMIT 5")
    assert(qd.collect().map(_.getLong(0)).toSeq ==
      (7999 to 7995 by -1).map(_.toLong))
    assert(scanFileCounts(qd).head < 8)
  }

  test("SQL plain LIMIT covers k rows from fewer files") {
    val (_, cat, store) = freshCat()
    val df = (0 until 6000).map(i => (i.toLong, i % 7)).toDF("id", "m")
    store.commit("t", df.repartition(6), "create")
    val total = store.manifests("t").maxBy(_.version).files.size
    val q = spark.sql(s"SELECT id FROM $cat.ns.t LIMIT 10")
    assert(q.collect().length == 10)
    assert(scanFileCounts(q).head < total)
    // a filtered LIMIT must NOT prune by row counts (rows may not survive)
    val qf = spark.sql(s"SELECT id FROM $cat.ns.t WHERE m = 3 LIMIT 10")
    assert(qf.collect().length == 10)
  }

  test("SQL top-k with real null rows returns the nulls under NULLS FIRST") {
    val (_, cat, store) = freshCat()
    val vals = (10 until 2010).map(i => (Some(i.toLong), s"v$i"))
    val nulls = (0 until 4).map(i => (None: Option[Long], s"n$i"))
    val df = (vals ++ nulls).toDF("c", "tag")
    // nulls land with high ids in one range file; range-partition by tag
    // so null rows concentrate but share files with values
    store.commit("t", df.repartitionByRange(6, col("c")), "create")
    val got = spark.sql(
      s"SELECT tag FROM $cat.ns.t ORDER BY c LIMIT 4")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("n0", "n1", "n2", "n3"))
    // DESC with explicit NULLS LAST: pure value top, nulls never surface
    val desc = spark.sql(
      s"SELECT tag FROM $cat.ns.t ORDER BY c DESC NULLS LAST LIMIT 3")
      .collect().map(_.getString(0)).toSeq
    assert(desc == Seq("v2009", "v2008", "v2007"))
  }

  test("manifest round-trips per-file null counts") {
    val (_, _, store) = freshCat()
    val df = ((0 until 100).map(i => Some(i.toLong)) ++
      Seq.fill(7)(None: Option[Long])).toDF("c")
    store.commit("t", df.coalesce(1), "create")
    val entry = store.manifests("t").maxBy(_.version).files.head
    assert(entry.stats("c").nulls == 7L,
      s"expected 7 harvested nulls, got ${entry.stats("c")}")
  }
}
