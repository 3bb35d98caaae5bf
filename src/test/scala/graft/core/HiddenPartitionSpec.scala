package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hidden partitioning (temporal + truncate transforms): partition values
  * derive from source columns at write time, queries filter on the SOURCE
  * column only, and files skip through the derived partition value. */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_hpart").toString)

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

  private def eventsDf = {
    // 4 distinct days, 250 rows each
    (0 until 1000).map { i =>
      (i.toLong, s"2024-01-${"%02d".format(1 + i % 4)} ${"%02d".format(i % 24)}:30:00",
        s"u${i % 7}", i * 1.5)
    }.toDF("id", "tss", "user", "v")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
  }

  test("days(ts): write computes the partition, source-column filters prune") {
    val store = newStore()
    val dcol = TableStore.daysColumn("ts")
    store.commitPartitioned("ev", eventsDf, Seq(dcol), "create")
    val m = store.manifests("ev").maxBy(_.version)
    // every file carries a derived day value; the batch never had it
    assert(m.files.nonEmpty &&
      m.files.forall(_.partitionValues.get(dcol).exists(
        _.matches("2024-01-0[1-4]"))))
    // schema untouched: the derived column never lands in the data files
    assert(store.read("ev").columns.toSet == Set("id", "user", "v", "ts"))
    // pruning on the derived value (library planning path)
    val (hit, total) = store.prunedFileCount("ev", dcol,
      "2024-01-02", "2024-01-02")
    assert(hit < total, s"expected day skip, got $hit/$total")
    // content round-trips
    assert(store.read("ev").agg(sum("id")).head.getLong(0) ==
      (0L until 1000L).sum)
    // appends inherit the spec and derive the value too
    store.append("ev", eventsDf.withColumn("id", col("id") + 1000))
    val m2 = store.manifests("ev").maxBy(_.version)
    assert(m2.files.forall(_.partitionValues.contains(dcol)))
    assert(store.read("ev").count() == 2000)
  }

  test("SQL: CREATE TABLE PARTITIONED BY (days(ts)) + INSERT prunes on ts") {
    val wh = tmpDir("graft_hpart_sql")
    val cat = s"ghp${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.ev " +
      "(id BIGINT, user STRING, v DOUBLE, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    eventsDf.createOrReplaceTempView("hp_src")
    spark.sql(s"INSERT INTO $cat.ns.ev SELECT id, user, v, ts FROM hp_src")
    val store = new TableStore(spark, wh)
    val dcol = TableStore.daysColumn("ts")
    val m = store.manifests("ev").maxBy(_.version)
    assert(m.partitionBy == Seq(dcol))
    assert(m.files.forall(_.partitionValues.get(dcol).exists(
      _.matches("2024-01-0[1-4]"))))
    // a ts range filter prunes files through the derived day value
    val df = spark.sql(s"SELECT sum(id) AS s FROM $cat.ns.ev " +
      "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' " +
      "AND ts < TIMESTAMP '2024-01-03 00:00:00'")
    val expect = eventsDf.filter(col("ts") >= lit("2024-01-02") &&
      col("ts") < lit("2024-01-03")).agg(sum("id")).head.getLong(0)
    assert(df.collect().head.getLong(0) == expect)
    val scan = statsScans(df.queryExecution.executedPlan).headOption
    assert(scan.isDefined, "GraftStatsScan not found")
    assert(scan.get.currentFileCount < m.files.size,
      s"hidden prune failed: ${scan.get.currentFileCount}/${m.files.size}")
    // boundary conservatism: a strict bound inside a day keeps that day
    val edge = spark.sql(s"SELECT count(*) AS n FROM $cat.ns.ev " +
      "WHERE ts > TIMESTAMP '2024-01-04 22:30:00'")
    val expectEdge = eventsDf.filter(col("ts") > lit("2024-01-04 22:30:00"))
      .count()
    assert(edge.collect().head.getLong(0) == expectEdge)
  }

  test("truncate(2, user) prunes equality filters by prefix") {
    val wh = tmpDir("graft_hpart_tr")
    val cat = s"ghtr${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.doc (id BIGINT, lang STRING) " +
      "PARTITIONED BY (truncate(2, lang))")
    Seq((1L, "en-GB"), (2L, "en-US"), (3L, "fr-FR"), (4L, "de-DE"),
      (5L, "fr-CA"))
      .toDF("id", "lang").createOrReplaceTempView("hp_tr_src")
    spark.sql(s"INSERT INTO $cat.ns.doc SELECT * FROM hp_tr_src")
    val store = new TableStore(spark, wh)
    val tcol = TableStore.truncColumn("lang", 2)
    val m = store.manifests("doc").maxBy(_.version)
    assert(m.files.forall(_.partitionValues.get(tcol).exists(
      Set("en", "fr", "de").contains)))
    val df = spark.sql(
      s"SELECT count(*) AS n FROM $cat.ns.doc WHERE lang = 'fr-FR'")
    assert(df.collect().head.getLong(0) == 1L)
    val scan = statsScans(df.queryExecution.executedPlan).headOption
    assert(scan.exists(_.currentFileCount < m.files.size),
      "prefix prune failed")
  }

  test("spec validation: temporal needs ts/date, truncate needs string") {
    val store = newStore()
    store.commit("t", Seq((1L, "a")).toDF("id", "s"), "create")
    intercept[IllegalArgumentException] {
      store.setPartitionSpec("t", Seq(TableStore.daysColumn("id")))
    }
    intercept[IllegalArgumentException] {
      store.setPartitionSpec("t", Seq(TableStore.truncColumn("id", 2)))
    }
    intercept[IllegalArgumentException] {
      store.setPartitionSpec("t", Seq(TableStore.daysColumn("nope")))
    }
    // valid: truncate on the string column
    store.setPartitionSpec("t", Seq(TableStore.truncColumn("s", 1)))
    assert(store.manifests("t").maxBy(_.version).partitionBy ==
      Seq(TableStore.truncColumn("s", 1)))
  }

  test("months/years render fixed-width order-preserving values") {
    val store = newStore()
    val df = Seq(
      (1L, "2023-11-05 10:00:00"), (2L, "2023-12-31 23:59:59"),
      (3L, "2024-01-01 00:00:00"), (4L, "2024-06-15 12:00:00"))
      .toDF("id", "tss").withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val mcol = TableStore.monthsColumn("ts")
    store.commitPartitioned("tm", df, Seq(mcol), "create")
    val vals = store.manifests("tm").maxBy(_.version)
      .files.flatMap(_.partitionValues.get(mcol)).toSet
    assert(vals == Set("2023-11", "2023-12", "2024-01", "2024-06"))
    val (hit, total) = store.prunedFileCount("tm", mcol, "2024-01", "2024-06")
    assert(hit == 2 && total == 4)
  }
}
