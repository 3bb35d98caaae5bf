package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster formation over near-duplicate pair lists: connected components,
  * the step that turns pairwise dedup verdicts ([[Dedup.jaccardPairs]],
  * [[Dedup.minhashLshPairs]], [[Dedup.embeddingNearDupPairs]]) into
  * "keep one document per duplicate cluster" decisions — the form every
  * training-data pipeline actually consumes (the pair list itself is
  * useless until transitively closed: A~B and B~C must collapse A,B,C
  * together even when A~C was never emitted).
  *
  * Scale design (the 100 TB contract): min-label propagation with pointer
  * jumping — each round is a hash-partitioned neighbor-min join plus a
  * label-of-label shortcut join, so labels hop along edges AND collapse
  * chains exponentially, converging in O(log(diameter)) rounds. Near-dup
  * graphs are quasi-cliques, so 2-4 rounds is typical at any corpus size.
  *
  * Iterative DataFrame algorithms have a lineage trap: round N+1's plan
  * references round N's frame more than once (the pointer-jump self-join),
  * so without truncation the logical plan — and any replay — grows
  * exponentially with rounds (plan-string generation alone OOMs around
  * round 8). Each round is therefore materialized with `localCheckpoint`,
  * which truncates lineage to the cached blocks; the PREVIOUS round's
  * blocks are freed explicitly the moment its successor is materialized,
  * so the in-flight footprint is bounded at two |V|-sized label frames
  * regardless of round count. The returned frame is backed by the final
  * round's blocks and stays valid as long as the caller holds it; Spark's
  * ContextCleaner frees those blocks when the frame is garbage-collected
  * (no cache-manager entry is ever created, so there is nothing a
  * long-lived session must remember to clear).
  */
object Clustering {

  import Materialize.{checkpointTracked, free}

  /** Connected components of the undirected graph given as a pair list.
    * Returns one row per distinct node: (`id`, `component`) where
    * `component` is the smallest node id reachable from `id`. Nodes
    * appearing in no pair are absent (callers union singletons if needed).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 30): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    // Materialize the pair projection BEFORE the symmetric union: the
    // union references it twice, and the caller's pair list is typically
    // an expensive dedup pipeline that must not execute twice.
    val (half, halfIds) = checkpointTracked(
      pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst")))
    // Symmetric closure, deduplicated and materialized once: every round
    // joins against it ON dst, so it is hash-partitioned by dst BEFORE
    // the checkpoint (LogicalRDD keeps the partitioning — rounds never
    // re-shuffle the edge list; only the |V|-sized label side moves).
    val (edges, edgeIds) = checkpointTracked(
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().repartition(col("dst")))
    free(sc, halfIds) // folded into edges; not referenced again
    try {
      // Round 0: component = min(self, direct neighbors). The symmetric
      // closure guarantees every node occurs as src.
      var (labels, labelIds) = checkpointTracked(
        edges.groupBy(col("src").as("id"))
          .agg(least(min(col("dst")), first(col("src"))).as("component")))
      var sum = checksum(labels)
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        // Neighbor-min: the smallest label among each node's neighbors.
        // SHUFFLE_HASH on the label side: per-partition hash build of the
        // small table, edges stream — no per-round sort of the edge list.
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("component"))
            .hint("shuffle_hash"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(min(col("component")).as("__nbr"))
        val propagated = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("component"), coalesce(col("__nbr"), col("component")))
              .as("component"))
        // Pointer jump: component ids are themselves node ids, so replace
        // each label with ITS label — chains collapse exponentially.
        val jumped = propagated
          .join(propagated.select(col("id").as("__cid"),
            col("component").as("__cc")),
            col("component") === col("__cid"), "left")
          .select(col("id"),
            coalesce(col("__cc"), col("component")).as("component"))
        val (next, nextIds) = checkpointTracked(jumped)
        val nextSum = checksum(next)
        free(sc, labelIds) // successor is materialized + truncated: safe
        labels = next
        labelIds = nextIds
        converged = nextSum == sum
        sum = nextSum
        round += 1
      }
      labels
    } finally free(sc, edgeIds) // label rounds are truncated: independent
  }

  /** Exact label-sum fixpoint signature: labels are monotonically
    * non-increasing per node, so the total is unchanged iff no label
    * moved. Decimal accumulator — 2^63 overflow would alias two states. */
  private def checksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")))
      .head.getDecimal(0).stripTrailingZeros

  /** Per-cluster summary over a pair list: one row per duplicate cluster
    * (component = smallest member id) with member count and largest member
    * — the frame a pipeline joins back on to drop all-but-representative.
    */
  def clusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("members"), max(col("id")).as("max_id"))
}
