package graft.catalog

import graft.SparkSpec
import graft.core.TableStore
import org.apache.spark.sql.execution.SparkPlan

/** Metadata-only aggregates: an unfiltered, ungrouped COUNT(*)/MIN/MAX over
  * a catalog table is answered from the manifest (footer-harvested row
  * counts and min/max) with ZERO data files read — the plan collapses to a
  * LocalTableScan. Any condition that breaks exactness (filter, GROUP BY,
  * unsupported function) falls back to the normal scan, never approximates.
  */
class MetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog(f: (TableStore, String) => Unit): Unit = {
    val wh = tmpDir("graft_magg")
    val cat = s"gmagg${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    f(new TableStore(spark, wh), cat)
  }

  private def hasFileScan(plan: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => nodes(s.plan)
      case o => o.children.flatMap(nodes)
    })
    nodes(plan).exists(_.isInstanceOf[
      org.apache.spark.sql.execution.datasources.v2.BatchScanExec])
  }

  test("count/min/max answer from the manifest with no file scan") {
    withCatalog { (store, cat) =>
      store.commit("t",
        Seq((3L, "b", 2.5), (1L, "a", -1.0), (7L, "c", 9.75))
          .toDF("id", "s", "v"), "create")
      store.append("t", Seq((5L, "zz", 0.0)).toDF("id", "s", "v"))
      val df = spark.sql(
        s"SELECT COUNT(*), MIN(id), MAX(id), MIN(s), MAX(s), MIN(v), MAX(v) " +
          s"FROM $cat.ns.t")
      val r = df.head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getDouble(5), r.getDouble(6)) ==
        ((4L, 1L, 7L, "a", "zz", -1.0, 9.75)))
      assert(!hasFileScan(df.queryExecution.executedPlan),
        "expected a metadata-only LocalTableScan plan")
    }
  }

  test("a filter or GROUP BY falls back to the real scan, exactly") {
    withCatalog { (store, cat) =>
      store.commit("t",
        Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
          .toDF("id", "s", "v"), "create")
      val filtered = spark.sql(
        s"SELECT COUNT(*) FROM $cat.ns.t WHERE v > 1.5")
      assert(filtered.head.getLong(0) == 2L)
      assert(hasFileScan(filtered.queryExecution.executedPlan))
      val grouped = spark.sql(
        s"SELECT s, COUNT(*) AS n FROM $cat.ns.t GROUP BY s ORDER BY s")
      assert(grouped.as[(String, Long)].collect().toSeq ==
        Seq(("a", 2L), ("b", 1L)))
      assert(hasFileScan(grouped.queryExecution.executedPlan))
    }
  }

  test("a column with nulls or a non-stat type falls back; empty table " +
      "answers NULL/0") {
    withCatalog { (store, cat) =>
      store.commit("t",
        Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
          .toDF("id", "s"), "create")
      // local[4] splits the 3 rows into 3 files; the all-null-s file has
      // NO stats for s (parquet omits footer min/max with no non-null
      // value) but is provably harvested (it has id stats) — it
      // contributes nothing to MIN/MAX and the metadata answer stays exact
      val df = spark.sql(s"SELECT COUNT(*), MIN(s), MAX(s) FROM $cat.ns.t")
      val r = df.head
      assert((r.getLong(0), r.getString(1), r.getString(2)) == ((3L, "a", "c")))
      assert(!hasFileScan(df.queryExecution.executedPlan))
      // AVG is not provable from min/max stats — must fall back
      val avg = spark.sql(s"SELECT AVG(id) FROM $cat.ns.t")
      assert(avg.head.getDouble(0) == 2.0)
      assert(hasFileScan(avg.queryExecution.executedPlan))
    }
  }

  test("GROUP BY an identity partition column answers from the manifest") {
    withCatalog { (_, cat) =>
      spark.sql(s"CREATE TABLE $cat.ns.p (id BIGINT, v DOUBLE, k STRING) " +
        "PARTITIONED BY (k)")
      // no ±0.0 extremes: a zero float extreme legitimately bails (parquet
      // widens zero bounds in footer stats) and would force a real scan
      spark.sql(s"INSERT INTO $cat.ns.p VALUES " +
        "(1, 1.5, 'x'), (2, 2.5, 'x'), (3, -4.0, 'y'), (4, 7.5, NULL)")
      val df = spark.sql(s"SELECT k, COUNT(*) AS n, MIN(v) AS lo, " +
        s"MAX(v) AS hi FROM $cat.ns.p GROUP BY k ORDER BY k")
      assert(df.collect().map(r => (r.isNullAt(0), if (r.isNullAt(0)) ""
        else r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq == Seq((true, "", 1L, 7.5, 7.5), (false, "x", 2L, 1.5, 2.5),
          (false, "y", 1L, -4.0, -4.0)))
      assert(!hasFileScan(df.queryExecution.executedPlan))
      // a zero extreme falls back to the scan — and stays exact
      val zeroed = spark.sql(s"SELECT MIN(least(v, 0.0)) FROM $cat.ns.p")
      assert(zeroed.head.getDouble(0) == -4.0)
      // grouping by a NON-partition column must fall back to a real scan
      val byId = spark.sql(s"SELECT id, COUNT(*) AS n FROM $cat.ns.p GROUP BY id")
      assert(byId.count() == 4)
      assert(hasFileScan(byId.queryExecution.executedPlan))
    }
  }

  test("timestamps and dates push through their internal long form") {
    withCatalog { (store, cat) =>
      val df0 = Seq(
        (java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
          java.sql.Date.valueOf("2024-01-02")),
        (java.sql.Timestamp.valueOf("2023-06-01 00:00:00"),
          java.sql.Date.valueOf("2023-06-01"))).toDF("ts", "d")
      store.commit("t", df0, "create")
      val q = spark.sql(s"SELECT MIN(ts), MAX(ts), MIN(d), MAX(d) FROM $cat.ns.t")
      val r = q.head
      assert(r.getTimestamp(0) == java.sql.Timestamp.valueOf("2023-06-01 00:00:00"))
      assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
      assert(r.getDate(2) == java.sql.Date.valueOf("2023-06-01"))
      assert(r.getDate(3) == java.sql.Date.valueOf("2024-01-02"))
      assert(!hasFileScan(q.queryExecution.executedPlan))
    }
  }
}
