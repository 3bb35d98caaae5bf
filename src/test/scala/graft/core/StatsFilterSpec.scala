package graft.core

import graft.SparkSpec
import graft.core.TableStore.ColStats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** Manifest-stat pruning of `LIKE 'p%'` (StringStartsWith): rows with the
  * prefix live in [p, succ(p)), so a file skips when its string [min,max]
  * misses that range entirely. */
class StatsFilterSpec extends SparkSpec {
  import spark.implicits._

  private def st(min: String, max: String) =
    Map("k" -> ColStats(min, max, "string"))

  test("StringStartsWith prunes on string min/max stats") {
    val f = StringStartsWith("k", "car")
    assert(StatsFilter.fileMayMatch(st("cabbage", "cart"), f)) // overlaps
    assert(!StatsFilter.fileMayMatch(st("dog", "emu"), f)) // range above
    assert(!StatsFilter.fileMayMatch(st("ant", "cap"), f)) // range below
    assert(StatsFilter.fileMayMatch(st("car", "car"), f)) // exact boundary
    assert(StatsFilter.fileMayMatch(st("cars", "cart"), f)) // inside
    assert(!StatsFilter.fileMayMatch(st("cas", "cat"), f)) // at succ(p)
    // empty prefix matches everything
    assert(StatsFilter.fileMayMatch(st("a", "b"), StringStartsWith("k", "")))
    // missing stats: conservative keep
    assert(StatsFilter.fileMayMatch(Map.empty, f))
    // non-ASCII prefix: only the max-side bound applies (still prunes below)
    assert(!StatsFilter.fileMayMatch(st("ant", "cap"), StringStartsWith("k", "caré")))
    assert(StatsFilter.fileMayMatch(st("zz", "zz"), StringStartsWith("k", "caé")))
  }

  test("asciiSuccessor edges") {
    assert(StatsFilter.asciiSuccessor("car").contains("cas"))
    assert(StatsFilter.asciiSuccessor("a").contains("b"))
    assert(StatsFilter.asciiSuccessor("").isEmpty)
    assert(StatsFilter.asciiSuccessor("é").isEmpty)
  }

  // AQE-aware scan extraction (executedPlan.collect stops at adaptive nodes)
  private def statsScans(p: org.apache.spark.sql.execution.SparkPlan)
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
    self ++ kids.flatMap(statsScans)
  }

  test("SQL LIKE 'p%' skips files on a string-clustered table") {
    val wh = tmpDir("graft_sfp")
    val cat = s"gsf${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val store = new TableStore(spark, wh)
    // 26 letter groups range-clustered into 8 files: per-file key ranges
    // are disjoint letter spans
    val data = (0 until 2600).map { i =>
      (i.toLong, s"${('a' + i % 26).toChar}${"%04d".format(i)}")
    }.toDF("id", "k").repartitionByRange(8, col("k"))
    store.commit("t", data, "create")
    val m = store.manifests("t").maxBy(_.version)
    assert(m.files.size == 8)
    val df = spark.sql(s"SELECT count(*) AS n FROM $cat.ns.t WHERE k LIKE 'c%'")
    assert(df.collect().head.getLong(0) == 100L)
    val scan = statsScans(df.queryExecution.executedPlan).headOption
    assert(scan.isDefined, "GraftStatsScan not found")
    assert(scan.get.currentFileCount < m.files.size,
      s"LIKE prefix prune failed: ${scan.get.currentFileCount}/${m.files.size}")
  }
}
