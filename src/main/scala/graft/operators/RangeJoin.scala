package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval join — the scale path for `point BETWEEN lo AND hi`
  * joins. Spark's planner has no equi-keys for a pure range predicate
  * and falls back to BroadcastNestedLoopJoin: O(|points|·|ranges|)
  * comparisons, and a hard broadcast requirement on one side — the
  * classic non-equi-join cliff. Binning recovers a shuffle equi-join:
  * each point lands in exactly ONE fixed-width bucket, each range
  * explodes to every bucket it covers, the join runs on the bucket key
  * (hash shuffle, partial aggregation, AQE — all the equi-join
  * machinery), and the exact BETWEEN predicate filters residuals inside
  * the join. Each qualifying (point, range) pair is produced exactly
  * once — the point's single bucket meets each covering range's
  * exploded copy once — so no dedup pass is needed.
  *
  * Cost shape: shuffle = |points| + Σ_ranges (width/bucketWidth + 1)
  * rows. Pick `bucketWidth` near the typical range width so ranges
  * explode to O(1) buckets each; a pathological bucketWidth (≪ range
  * width) degrades gracefully into more range copies, never into a
  * nested loop. Same binning idea as Databricks' range-join hints and
  * the interval-join binning in stream processors.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `ranges` row whose
    * `[loCol, hiCol]` interval contains `pointCol` (inclusive ends).
    * All three columns must be integral (cast money/timestamps to
    * long units first). Output: point columns ++ range columns. */
  /** Exact floorDiv on longs — codegen'd IntegralDivide plus a sign
    * correction, never a double cast: `floor(x.cast(double)/w)` is only
    * exact below 2^53, so a composite int64 key (cent-scaled money ++
    * sequence) above that could floor into the wrong bucket and silently
    * drop a qualifying pair. `div` truncates toward zero; for a positive
    * width the quotient is one too high exactly when the remainder is
    * negative — subtracting that case is floorDiv with no overflow
    * (unlike `(c - pmod(c, w)) / w`, which underflows near Long.Min). */
  private def floorDivBucket(c: org.apache.spark.sql.Column,
      bucketWidth: Long): org.apache.spark.sql.Column = {
    val v = c.cast("long")
    val w = lit(bucketWidth)
    call_function("div", v, w) -
      when(v % w < 0, lit(1L)).otherwise(lit(0L))
  }

  def pointInRange(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floorDivBucket(c, bucketWidth)
    val pb = points.withColumn("__rj_b", bucketOf(col(pointCol)))
    val rb = ranges
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__rj_b",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    pb.join(rb, Seq("__rj_b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__rj_b")
  }

  /** Inner-join every `left` interval `[lLo, lHi]` to every `right`
    * interval `[rLo, rHi]` it OVERLAPS (inclusive ends: overlap ⇔
    * lLo ≤ rHi ∧ rLo ≤ lHi) — the interval×interval generalization of
    * [[pointInRange]], which stock Spark also plans as a nested loop.
    * Both sides explode to their covered buckets, the join runs on the
    * bucket key, and each qualifying pair is emitted EXACTLY ONCE: two
    * overlapping intervals co-occupy every bucket their intersection
    * touches, so the residual keeps only the bucket that contains the
    * intersection's left edge `max(lLo, rLo)` — a canonical
    * representative both sides are guaranteed to have exploded.
    * Degenerate (inverted) intervals on either side join nothing.
    * All four columns must be integral. Output: left ++ right columns. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floorDivBucket(c, bucketWidth)
    val lb = left.filter(col(lLo) <= col(lHi))
      .withColumn("__rj_b",
        explode(sequence(bucketOf(col(lLo)), bucketOf(col(lHi)))))
    val rb = right.filter(col(rLo) <= col(rHi))
      .withColumn("__rj_b",
        explode(sequence(bucketOf(col(rLo)), bucketOf(col(rHi)))))
    lb.join(rb, Seq("__rj_b"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__rj_b") === bucketOf(greatest(col(lLo), col(rLo))))
      .drop("__rj_b")
  }
}
