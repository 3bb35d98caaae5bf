package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B: is the graph fixpoints' CPU going into STRING join keys?
  * Runs labelPropagation and pageRank over the q151-shaped edge list twice
  * — once with the production "c<id>"/"s<id>" string node keys, once with
  * an equivalent synthetic LONG key — at the same iteration count, and
  * prints wall + process-CPU for each (opt guide §1: measure before
  * changing the operator; §2.3 "narrower types"). */
object ProfileGraphKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    def edgesOf(asLong: Boolean) = {
      val li = graft.Tables.loadSpread(spark, sfDir, "lineitem")
      val ord = graft.Tables.load(spark, sfDir, "orders")
      val pairs =
        if (asLong)
          li.join(ord, li("l_orderkey") === ord("o_orderkey"))
            .groupBy((col("o_custkey") * 2).as("src"),
              (col("l_suppkey") * 2 + 1).as("dst"))
            .agg(count(lit(1)).as("w"))
        else
          li.join(ord, li("l_orderkey") === ord("o_orderkey"))
            .groupBy(
              concat(lit("c"), col("o_custkey").cast("string")).as("src"),
              concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
            .agg(count(lit(1)).as("w"))
      pairs.unionByName(pairs.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
    }

    def time(label: String)(body: => Long): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = body
      println(f"[gk] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%.1f s ($n rows)")
    }

    // Inline long-keyed LPA mirroring LinkAnalysis.labelPropagation's round
    // structure exactly (checkpointed repartitioned edges, SHUFFLE_HASH
    // label build, struct-min top-1, lineage cut cadence) minus the
    // internal cast-to-string — isolates the key-type cost.
    def lpaLong(edges: org.apache.spark.sql.DataFrame, iterations: Int): Long = {
      val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      val e2 = e.repartition(col("src")).localCheckpoint()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
      var labels = nodes.select(col("node"), col("node").as("label"))
        for (i <- 1 to iterations) {
          val winners = e2
            .join(labels.select(col("node").as("src"), col("label"))
              .hint("shuffle_hash"), Seq("src"))
            .groupBy(col("dst").as("node"), col("label"))
            .agg(sum(col("w")).as("__wsum"))
            .groupBy(col("node"))
            .agg(min(struct((-col("__wsum")).as("nw"), col("label").as("l")))
              .as("__m"))
            .select(col("node"), col("__m.l").as("__nl"))
          val next = labels.join(winners.hint("shuffle_hash"), Seq("node"), "left")
            .select(col("node"),
              coalesce(col("__nl"), col("label")).as("label"))
          if (i % graft.ext.LinkAnalysis.CutEvery == 0 || i == iterations)
            labels = next.localCheckpoint()
          else labels = next
        }
      labels.count()
    }

    // warmup both shapes at the smallest scale
    graft.ext.LinkAnalysis.labelPropagation(
      edgesOf(false).limit(1000), "src", "dst", "w", 2).count()
    lpaLong(edgesOf(true).limit(1000), 2)
    (1 to reps).foreach { _ =>
      time("LPA string keys")(graft.ext.LinkAnalysis.labelPropagation(
        edgesOf(false), "src", "dst", "w", 5).count())
      time("LPA long keys  ")(lpaLong(edgesOf(true), 5))
    }
    spark.stop()
  }
}
