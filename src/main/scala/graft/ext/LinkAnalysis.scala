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
