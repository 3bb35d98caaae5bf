package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — weighted PageRank in FIXED-POINT
  * integer arithmetic, so a run is bit-replayable on any engine (the
  * float formulation's re-association noise can flip ranks near ties;
  * this one cannot).
  *
  * Why a curation engine carries this: web-corpus quality pipelines use
  * link authority (harmonic centrality / PageRank over the crawl's host
  * graph) as a document-quality prior — a domain linked by many
  * well-linked domains outranks an orphan spam host, before any content
  * model runs. The graph is host-level (millions of nodes from a 100 TB
  * crawl, not billions), but the EDGE list is corpus-scale, so the
  * propagation must be a distributed join, never an in-memory graph.
  *
  * Fixed-point spec (everything int64; `//` is floor division):
  *  - `SCALE = 10^12`; `N` = node count; initial rank `r0 = SCALE // N`.
  *  - per-edge contribution of node j to i: `(r_j · w_ji) // outw_j`
  *    where `outw_j = Σ_k w_jk` (so a node splits its rank across its
  *    out-weight, to floor rounding).
  *  - `r_i' = (dNum · Σ_j contrib_ji + (100−dNum) · (SCALE // N)) // 100`
  *    (damping `dNum/100`, teleport to the uniform floor).
  * Magnitudes: `r ≤ ~SCALE = 10^12`, `w` up to ~10^6 → `r·w ≤ 10^18`
  * stays inside int64 for edge weights to ~9·10^6; pre-scale heavier
  * weights (ranks read only ratios).
  *
  * Scale shape per iteration: one equi-join of the rank table (1 row per
  * node, partitioned by node) against the out-weighted edge list
  * (partitioned by src), one hash aggregate on dst — the standard
  * distributed PageRank round. Lineage is cut every round with the
  * tracked localCheckpoint (see [[Materialize]]), so the plan does not
  * grow with iterations and shuffle blocks are freed on GC. Dangling
  * nodes (no out-edges) keep only their teleport share — acceptable for
  * an authority PRIOR (mass conservation is not required), and exactly
  * mirrored by the oracle.
  */
object LinkAnalysis {

  /** Weighted fixed-point PageRank over `(srcCol, dstCol, wCol)` edges.
    * Returns one row per distinct node: (`node`, `rank`) with `rank` on
    * the `SCALE = 10^12` fixed-point grid. `iterations` is fixed (no
    * convergence test — determinism over adaptivity). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, dampingNum: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1,50]")
    require(dampingNum >= 0 && dampingNum <= 100, "dampingNum in [0,100]")
    val sc = edges.sparkSession.sparkContext
    import Materialize.{checkpointTracked, free}
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w"))
    // out-weight folded onto each edge once; every round joins against it
    val (outw, outwIds) = checkpointTracked(
      e.groupBy(col("src")).agg(sum(col("w")).as("outw")))
    val (e2, e2Ids) = checkpointTracked(e.join(outw, Seq("src")))
    val (nodes, nodeIds) = checkpointTracked(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    free(sc, outwIds)
    try {
      // N and the uniform floor ride as a broadcast 1-row frame so the
      // whole computation stays one lazy plan (and the oracle's CTE
      // computes N the same way).
      val nFrame = nodes.agg(count(lit(1)).as("__n"))
      var (ranks, rankIds) = checkpointTracked(
        nodes.crossJoin(broadcast(nFrame))
          .select(col("node"), expr("1000000000000L div __n").as("rank")))
      for (_ <- 1 to iterations) {
        val contrib = e2.join(
            ranks.select(col("node").as("src"), col("rank")), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("(rank * w) div outw")).as("__in"))
        val next = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(nFrame))
          .select(col("node"),
            expr(s"($dampingNum * coalesce(__in, 0L) + " +
              s"${100 - dampingNum} * (1000000000000L div __n)) div 100")
              .as("rank"))
        val (nextM, nextIds) = checkpointTracked(next)
        free(sc, rankIds)
        ranks = nextM; rankIds = nextIds
      }
      ranks
    } finally {
      // edge/node blocks stay alive for the returned frame's lineage?
      // No: ranks is materialized (localCheckpoint), so its lineage no
      // longer references e2/nodes — safe to free eagerly.
      free(sc, e2Ids); free(sc, nodeIds)
    }
  }

  /** Personalized PageRank: teleport mass restricted to a SEED set —
    * the trusted-domain quality prior (authority flows FROM seeds;
    * spam clusters far from any seed starve). Same fixed-point grid as
    * [[pageRank]]; `seeds` is one `node` column, `r0 = SCALE // |S|`
    * on seeds and 0 elsewhere, and only seeds receive the teleport
    * share each round. Seeds are a normal (small) frame joined per
    * round — broadcast-grade, never collected. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, iterations: Int,
      dampingNum: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1,50]")
    val sc = edges.sparkSession.sparkContext
    import Materialize.{checkpointTracked, free}
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w"))
    val (e2, e2Ids) = checkpointTracked(
      e.join(e.groupBy(col("src")).agg(sum(col("w")).as("outw")), Seq("src")))
    val sd = seeds.select(col(seeds.columns.head).cast("string").as("node"))
      .distinct()
    val (nodes, nodeIds) = checkpointTracked(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__seed"), lit(0)).as("seed")))
    try {
      val sFrame = nodes.agg(sum(col("seed")).cast("long").as("__s"))
      var (ranks, rankIds) = checkpointTracked(
        nodes.crossJoin(broadcast(sFrame))
          .select(col("node"), col("seed"),
            expr("CASE WHEN seed = 1 THEN 1000000000000L div __s " +
              "ELSE 0L END").as("rank")))
      for (_ <- 1 to iterations) {
        val contrib = e2.join(
            ranks.select(col("node").as("src"), col("rank")), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("(rank * w) div outw")).as("__in"))
        val next = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(sFrame))
          .select(col("node"), col("seed"),
            expr(s"($dampingNum * coalesce(__in, 0L) + " +
              s"${100 - dampingNum} * (CASE WHEN seed = 1 THEN " +
              "1000000000000L div __s ELSE 0L END)) div 100").as("rank"))
        val (nextM, nextIds) = checkpointTracked(next)
        free(sc, rankIds)
        ranks = nextM; rankIds = nextIds
      }
      ranks.select(col("node"), col("rank"))
    } finally {
      free(sc, e2Ids); free(sc, nodeIds)
    }
  }

  /** The [[personalizedPageRank]] oracle: `edgesSql` selects
    * `src, dst, w`; `seedsSql` selects `node`. */
  def personalizedPageRankOracleSql(edgesSql: String, seedsSql: String,
      iterations: Int, dampingNum: Int = 85): String = {
    val tp = "CASE WHEN n.seed = 1 THEN 1000000000000 // ns.s ELSE 0 END"
    val rounds = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT n.node,
         |    ($dampingNum * COALESCE(c.contrib, 0) +
         |     ${100 - dampingNum} * ($tp)) // 100 AS rank
         |  FROM nodes n CROSS JOIN scount ns
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM((p.rank * e.w) // e.outw) AS contrib
         |    FROM e2 e JOIN $prev p ON p.node = e.src
         |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
       |e2 AS (SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS outw
       |  FROM edges),
       |seeds AS (SELECT DISTINCT node FROM ($seedsSql) q),
       |nodes AS (SELECT a.node,
       |    CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS seed
       |  FROM (SELECT DISTINCT src AS node FROM edges
       |    UNION SELECT DISTINCT dst FROM edges) a
       |  LEFT JOIN seeds s ON s.node = a.node),
       |scount AS (SELECT SUM(seed) AS s FROM nodes),
       |r0 AS (SELECT n.node,
       |    CASE WHEN n.seed = 1 THEN 1000000000000 // ns.s ELSE 0 END AS rank
       |  FROM nodes n CROSS JOIN scount ns),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations
       |ORDER BY node""".stripMargin
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with a
    * DETERMINISTIC tie-break — each round every node adopts the label
    * with the highest incoming edge-weight sum, ties to the smallest
    * label — so the community assignment is bit-replayable (async LPA
    * is run-order-dependent; this one is a pure function of the graph).
    * Initial label = the node's own id. Fixed iteration count.
    *
    * Scale shape per round: one join of the label table against the
    * edge list, one (dst, label) hash agg, one per-node top-1 window —
    * all key-partitioned; lineage cut per round like [[pageRank]]. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1,20]")
    val sc = edges.sparkSession.sparkContext
    import Materialize.{checkpointTracked, free}
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w"))
    val (e2, e2Ids) = checkpointTracked(e)
    val (nodes, nodeIds) = checkpointTracked(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    try {
      var (labels, labelIds) = checkpointTracked(
        nodes.select(col("node"), col("node").as("label")))
      for (_ <- 1 to iterations) {
        val w1 = Window.partitionBy(col("node"))
          .orderBy(col("__wsum").desc, col("label"))
        val winners = e2
          .join(labels.select(col("node").as("src"), col("label")),
            Seq("src"))
          .groupBy(col("dst").as("node"), col("label"))
          .agg(sum(col("w")).as("__wsum"))
          .withColumn("__rn", row_number().over(w1))
          .filter(col("__rn") === 1)
          .select(col("node"), col("label").as("__nl"))
        // a node with no incoming edges keeps its current label
        val next = labels.join(winners, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__nl"), col("label")).as("label"))
        val (nextM, nextIds) = checkpointTracked(next)
        free(sc, labelIds)
        labels = nextM; labelIds = nextIds
      }
      labels
    } finally {
      free(sc, e2Ids); free(sc, nodeIds)
    }
  }

  /** The [[labelPropagation]] oracle: per-round argmax-by-weight CTEs
    * with the same (weight DESC, label ASC) tie-break. */
  def labelPropagationOracleSql(edgesSql: String, iterations: Int): String = {
    val rounds = (1 to iterations).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""l$i AS (
         |  SELECT p.node, COALESCE(w.label, p.label) AS label
         |  FROM $prev p LEFT JOIN (
         |    SELECT node, label FROM (
         |      SELECT e.dst AS node, q.label, SUM(e.w) AS wsum,
         |        row_number() OVER (PARTITION BY e.dst
         |          ORDER BY SUM(e.w) DESC, q.label) AS rn
         |      FROM e2 e JOIN $prev q ON q.node = e.src
         |      GROUP BY e.dst, q.label) t WHERE rn = 1) w
         |  ON w.node = p.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
       |e2 AS (SELECT src, dst, w FROM edges),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |  UNION SELECT DISTINCT dst FROM edges),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$rounds
       |SELECT node, label FROM l$iterations ORDER BY node""".stripMargin
  }

  /** The oracle-replay of [[pageRank]] as one ANSI SQL string: iterated
    * CTEs (one per round), DuckDB floor-division (`//`). `edgesSql` must
    * select columns `src, dst, w`. */
  def pageRankOracleSql(edgesSql: String, iterations: Int,
      dampingNum: Int = 85): String = {
    val rounds = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT n.node,
         |    ($dampingNum * COALESCE(c.contrib, 0) +
         |     ${100 - dampingNum} * (1000000000000 // nn.n)) // 100 AS rank
         |  FROM nodes n CROSS JOIN ncount nn
         |  LEFT JOIN (
         |    SELECT e.dst AS node, SUM((p.rank * e.w) // e.outw) AS contrib
         |    FROM e2 e JOIN $prev p ON p.node = e.src
         |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesSql),
       |e2 AS (SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS outw
       |  FROM edges),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |  UNION SELECT DISTINCT dst FROM edges),
       |ncount AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1000000000000 // nn.n AS rank
       |  FROM nodes CROSS JOIN ncount nn),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations
       |ORDER BY node""".stripMargin
  }
}
