package graft

import graft.core.{Merge, TableStore}
import graft.curation.Scd2
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Numeric-determinism discipline (so results hash-match the DuckDB oracle):
  * every aggregated numeric is either (a) an exact-decimal SUM (addition is
  * order-independent), (b) a COUNT, or (c) deterministic double arithmetic on
  * top of those exact values (e.g. avg = exact-sum::double / count). We never
  * expose an engine-internal double accumulation (plain SUM/AVG/STDDEV over
  * doubles), whose value depends on partition merge order.
  */
object SparkEntry {

  private def dec(c: Column, scale: Int): Column = c.cast(DecimalType(18, scale))
  private def tmpStore(s: SparkSession): TableStore =
    new TableStore(s, java.nio.file.Files.createTempDirectory("graft_wh").toString)
  /** Order-independent exact sum: cast each row value to decimal, sum, re-cast. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast(DecimalType(18, scale))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2B hash aggregate + scalar arithmetic + sort (TPC-H Q1 shape; covers
    // SURVEY §2B "Hash aggregate w/ GROUP BY", SUM/AVG/COUNT, ORDER BY).
    "q01_pricing_summary" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          // scale 6: price(2dp)·(1-disc)(2dp)·(1+tax)(2dp) has ≤6 exact
          // decimals — the cast snaps to the exact product instead of
          // genuinely rounding (midpoint rounding differs across engines).
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          (sum(dec(col("l_quantity"), 2)).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2B multi-way equi-join (5 tables) + agg; Catalyst broadcasts the dims.
    "q02_revenue_by_nation" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1998-01-01"))
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // §2B ORDER BY + LIMIT → TakeOrderedAndProject (top-k without full sort).
    "q03_topk_orders" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast(DateType).as("o_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // §2B semi-join via IN-subquery (q14a/q23/q95 shape) → LEFT_SEMI.
    "q04_semijoin_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val big = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // §2B anti-join via NOT EXISTS (q16/q69/q94 shape) → LEFT_ANTI.
    "q05_customers_without_orders" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // §2A A10+A12: full SCD2 lifecycle through TableStore — bulk insert of
    // the earliest event per user, then scd2Complex over the remaining CDC
    // stream rebuilds every user's version chain.
    "q20_scd2_history" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val withRn = ev.withColumn("__rn", row_number().over(w))
      val full = withRn.filter(col("__rn") === 1).drop("__rn")
      val delta = withRn.filter(col("__rn") > 1).drop("__rn")
      val store = tmpStore(s)
      Scd2.bulkInsert(store, "ev", full, tsCol = "ts")
      Scd2.scd2Complex(store, "ev", delta, pkCol = "user_id", tsCol = "ts")
      store.read("ev")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("start_datetime"), col("end_datetime"),
          col("is_current"))
        .orderBy(col("user_id"), col("start_datetime"))
    }),

    // §2A A13: 3-branch CDC merge (update / delete / insert) with
    // latest-per-key dedup, through Merge + TableStore.
    "q21_merge_upsert" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("record_deleted", col("event_type") === "error")
      val cutoff = lit("2024-01-20")
      val store = tmpStore(s)
      val target = Scd2.latestPerKey(
        ev.filter(col("ts") < cutoff), Seq("user_id"), "ts")
      store.commit("users", target, "create")
      val delta = ev.filter(col("ts") >= cutoff)
      Scd2.applyCdcDeltas(store, "users", delta, Seq("user_id"), "ts")
      store.read("users")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // §2A A14+A15: time travel + $history metadata.
    "q22_time_travel" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val store = tmpStore(s)
      store.commit("ev", ev.filter(col("ts") < lit("2024-01-15")), "create")
      store.append("ev", ev.filter(col("ts") >= lit("2024-01-15")))
      val v1CommitMs = store.manifests("ev").head.timestampMs
      val v1Rows = store.readAsOf("ev", v1CommitMs).count()
      val v2Rows = store.read("ev").count()
      val nVersions = store.history("ev").count()
      Seq((v1Rows, v2Rows, nVersions))
        .toDF("v1_n_rows", "v2_n_rows", "n_versions")
    }),

    // §2A A16: bin-pack compaction preserves rows while packing files.
    "q23_compaction" -> ((s, dir) => {
      import s.implicits._
      val store = tmpStore(s)
      store.commit("ev", Tables.load(s, dir, "events").repartition(16), "create")
      val before = store.manifests("ev").last.files.size.toLong
      store.compact("ev", targetFileBytes = 1024L * 1024 * 1024)
      val after = store.manifests("ev").last.files.size.toLong
      val rows = store.read("ev").count()
      Seq((before, after, rows)).toDF("files_before", "files_after", "n_rows")
    })
  )

  // ------------------------------------------------------------ oracle SQL

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q04_semijoin_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q20_scd2_history" ->
      """SELECT user_id, event_id, event_type, value,
        | ts AS start_datetime,
        | coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
        |          TIMESTAMP '2250-01-01') AS end_datetime,
        | (lead(ts) OVER (PARTITION BY user_id ORDER BY ts)) IS NULL AS is_current
        |FROM events
        |ORDER BY user_id, start_datetime""".stripMargin,

    "q21_merge_upsert" ->
      """WITH tgt AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
        |                 FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1
        |), src AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
        |                 FROM events WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1
        |)
        |SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value FROM src WHERE event_type <> 'error'
        |  UNION ALL
        |  SELECT t.user_id, t.event_id, t.event_type, t.value FROM tgt t
        |  WHERE t.user_id NOT IN (SELECT user_id FROM src)
        |)
        |ORDER BY user_id""".stripMargin,

    "q22_time_travel" ->
      """SELECT
        | (SELECT count(*) FROM events WHERE ts < TIMESTAMP '2024-01-15') AS v1_n_rows,
        | count(*) AS v2_n_rows,
        | CAST(2 AS BIGINT) AS n_versions
        |FROM events""".stripMargin,

    "q23_compaction" ->
      """SELECT CAST(16 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after,
        | count(*) AS n_rows
        |FROM events""".stripMargin
  )
}
