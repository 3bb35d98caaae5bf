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
  * Scale/plan shape (re-derived in the r9 optimization round — guide
  * §§2.4, 3.1): the edge projection is materialized ONCE (its upstream
  * plan previously recomputed for out-weights, the join, and the node
  * set), the out-weighted edge list is localCheckpoint'ed so its hash
  * partitioning on `src` survives into every round (LogicalRDD carries
  * outputPartitioning — the corpus-scale edge list is never re-shuffled
  * or re-sorted after setup), and each round's rank join carries a
  * SHUFFLE_HASH hint on the RANK side: the per-partition hash build is
  * one small table (1 row/node), the edges stream through it — no
  * per-round sort of the edge list, which is what sort-merge was paying.
  * `N` (and the seed count) is collected once as a single long — the
  * bounded-collect class already used by KMeans centroids — instead of a
  * per-round broadcast-subtree job. Lineage is cut with the tracked
  * localCheckpoint every [[CutEvery]] rounds (not every round): a
  * 3-5-round query runs as ONE lazy plan with the checkpointed inputs as
  * leaves, while long runs still get bounded plans and freed shuffle
  * blocks. Dangling nodes (no out-edges) keep only their teleport share —
  * acceptable for an authority PRIOR (mass conservation is not
  * required), and exactly mirrored by the oracle.
  */
object LinkAnalysis {

  /** Lineage-cut cadence for the iterative fixpoints: materialize the
    * rank/label table every this-many rounds so plan depth and live
    * shuffle files stay bounded at any iteration count, while short runs
    * pay no per-round copy. */
  val CutEvery = 5

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
    // one materialization of the upstream edge plan; out-weights, the
    // out-weighted join and the node set all read it instead of
    // recomputing the caller's edge derivation three times
    val (e, eIds) = checkpointTracked(
      edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w")))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // out-weight folded onto each edge once; every round joins against it
    // (hash-partitioned by src via the setup join, captured by the
    // checkpoint — rounds never re-shuffle or re-sort the edge list)
    val (e2, e2Ids) = checkpointTracked(e.join(outw, Seq("src")))
    val (nodes, nodeIds) = checkpointTracked(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    free(sc, eIds)
    try {
      // N once, as a bounded single-long collect (the oracle's CTE
      // computes the same count); SQL `div` on positives == Long division
      val n = math.max(1L, nodes.count())
      val floorRank = 1000000000000L / n
      var ranks = nodes.select(col("node"), lit(floorRank).as("rank"))
      var rankIds = Set.empty[Int]
      for (i <- 1 to iterations) {
        val contrib = e2.join(
            ranks.select(col("node").as("src"), col("rank"))
              .hint("shuffle_hash"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("(rank * w) div outw")).as("__in"))
        val next = nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            expr(s"($dampingNum * coalesce(__in, 0L) + " +
              s"${(100 - dampingNum) * floorRank}L) div 100").as("rank"))
        if (i % CutEvery == 0 || i == iterations) {
          val (nextM, nextIds) = checkpointTracked(next)
          free(sc, rankIds)
          ranks = nextM; rankIds = nextIds
        } else ranks = next
      }
      ranks
    } finally {
      // ranks is materialized (localCheckpoint) at loop exit, so its
      // lineage no longer references e2/nodes — safe to free eagerly.
      free(sc, e2Ids); free(sc, nodeIds)
    }
  }

  /** Personalized PageRank: teleport mass restricted to a SEED set —
    * the trusted-domain quality prior (authority flows FROM seeds;
    * spam clusters far from any seed starve). Same fixed-point grid as
    * [[pageRank]]; `seeds` is one `node` column, `r0 = SCALE // |S|`
    * on seeds and 0 elsewhere, and only seeds receive the teleport
    * share each round. Same setup/round plan shape as [[pageRank]]. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, iterations: Int,
      dampingNum: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1,50]")
    val sc = edges.sparkSession.sparkContext
    import Materialize.{checkpointTracked, free}
    val (e, eIds) = checkpointTracked(
      edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w")))
    val (e2, e2Ids) = checkpointTracked(
      e.join(e.groupBy(col("src")).agg(sum(col("w")).as("outw")), Seq("src")))
    val sd = seeds.select(col(seeds.columns.head).cast("string").as("node"))
      .distinct()
    val (nodes, nodeIds) = checkpointTracked(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__seed"), lit(0)).as("seed")))
    free(sc, eIds)
    try {
      val sCount = math.max(1L,
        nodes.agg(sum(col("seed")).cast("long")).head().getLong(0))
      val seedRank = 1000000000000L / sCount
      val teleport = s"(CASE WHEN seed = 1 THEN ${seedRank}L ELSE 0L END)"
      var ranks = nodes.select(col("node"), col("seed"),
        expr(s"CAST($teleport AS LONG)").as("rank"))
      var rankIds = Set.empty[Int]
      for (i <- 1 to iterations) {
        val contrib = e2.join(
            ranks.select(col("node").as("src"), col("rank"))
              .hint("shuffle_hash"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("(rank * w) div outw")).as("__in"))
        val next = nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), col("seed"),
            expr(s"($dampingNum * coalesce(__in, 0L) + " +
              s"${100 - dampingNum} * $teleport) div 100").as("rank"))
        if (i % CutEvery == 0 || i == iterations) {
          val (nextM, nextIds) = checkpointTracked(next)
          free(sc, rankIds)
          ranks = nextM; rankIds = nextIds
        } else ranks = next
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
    * Scale shape per round: one SHUFFLE_HASH join of the edge list
    * against the label table (edges stream, labels build — no edge
    * sort), one (dst, label) hash agg, then the per-node top-1 as a
    * `min(struct(-wsum, label))` AGGREGATE — the (weight DESC, label
    * ASC) tie-break as one lexicographic struct-min, replacing the r8
    * row_number window (which paid an extra full sort of the candidate
    * set per round). Lineage cut every [[CutEvery]] rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1,20]")
    val sc = edges.sparkSession.sparkContext
    import Materialize.{checkpointTracked, free}
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"), col(wCol).cast("long").as("w"))
    // hash-partition the edge list by src ONCE; the checkpoint captures
    // the partitioning, so no round re-shuffles the corpus-scale side
    val (e2, e2Ids) = checkpointTracked(e.repartition(col("src")))
    val (nodes, nodeIds) = checkpointTracked(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    try {
      var labels = nodes.select(col("node"), col("node").as("label"))
      var labelIds = Set.empty[Int]
      for (i <- 1 to iterations) {
        val winners = e2
          .join(labels.select(col("node").as("src"), col("label"))
            .hint("shuffle_hash"), Seq("src"))
          .groupBy(col("dst").as("node"), col("label"))
          .agg(sum(col("w")).as("__wsum"))
          // top-1 by (wsum DESC, label ASC) == lexicographic min of
          // (-wsum, label); one hash agg, no per-round sort
          .groupBy(col("node"))
          .agg(min(struct((-col("__wsum")).as("nw"), col("label").as("l")))
            .as("__m"))
          .select(col("node"), col("__m.l").as("__nl"))
        // a node with no incoming edges keeps its current label
        val next = labels.join(winners.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__nl"), col("label")).as("label"))
        if (i % CutEvery == 0 || i == iterations) {
          val (nextM, nextIds) = checkpointTracked(next)
          free(sc, labelIds)
          labels = nextM; labelIds = nextIds
        } else labels = next
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
