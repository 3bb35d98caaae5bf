package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.vecDot

/** Distributed k-means over embedding columns, with every arithmetic step
  * chosen to be ENGINE-PORTABLE (bit-identical replay by an external SQL
  * engine / the DuckDB oracle) — the clustering stage of semantic dedup
  * (SemDeDup: cluster the corpus, then compare pairs only within a
  * cluster) and of cluster-balanced data mixing.
  *
  * Portability design — no float accumulation anywhere:
  *   - vectors are first quantized with [[Similarity.quantizeInt8]]
  *     (floor-based round-half-up codes, engine-reproducible);
  *   - centroids are FIXED-POINT integers: `c_i = floor((S_i·256 + n) /
  *     (2n))` where `S_i` is the exact int64 element sum of the cluster's
  *     codes — i.e. the member mean at granularity 1/128 of a code unit,
  *     rounded half-up. Integer sums are associative, so the result is
  *     independent of partitioning/retry order;
  *   - assignment distance is `Σ_i (128·q_i − c_i)²` — every term and the
  *     total stay ≤ ~7·10¹⁰, exact in BOTH int64 and float64, so the
  *     argmin (ties broken by cluster id) is deterministic in any engine;
  *   - seeds are the k vectors with the smallest `md5(cast(id AS string))`
  *     — a portable deterministic pseudo-random draw.
  *
  * Scale shape (the 100 TB contract): per iteration one scan of the
  * (checkpointed) quantized corpus, assignment as a pure per-row
  * projection against BROADCAST-LITERAL centroids (no join, no shuffle),
  * and one `posexplode`→`groupBy(cid, dim)` partial-aggregated shuffle
  * whose reduced size is k·dim rows regardless of corpus size. The k·dim
  * int64 sums come to the driver (bounded metadata, same contract as the
  * bloom key caps in `TableStore`); nothing else ever leaves executors.
  */
object KMeans {

  /** One cluster's state: fixed-point centroid (scale 128) per dimension.
    * Public: the persistable metadata of an IVF-style ANN index (see
    * [[assignWithCentroids]] / [[probe]]). */
  final case class Centroid(cid: Int, c: Array[Long])

  private def fixedPoint(sum: Long, n: Long): Long =
    Math.floorDiv(sum * 256L + n, 2L * n)

  /** Quantize, seed, run `iters` assign→update rounds, then a final
    * assignment. Returns (`idCol`, `cluster` int, `dist` long) — `dist`
    * the exact fixed-point squared distance to the winning centroid.
    */
  def assign(df: DataFrame, k: Int = 8, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignWithCentroids(df, k, iters, idCol, vecCol)._1

  /** As [[assign]], but also returns the final centroids — the
    * persistable index metadata of an IVF-style ANN index (store them in
    * a table; [[probe]] ranks them for a query batch later without
    * re-clustering). */
  def assignWithCentroids(df: DataFrame, k: Int = 8, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Seq[Centroid]) = {
    val sc = df.sparkSession.sparkContext
    val (codes, codesIds) = Materialize.checkpointTracked(
      Similarity.quantizeInt8(df.filter(col(vecCol).isNotNull), idCol, vecCol)
        .select(col(idCol),
          transform(col("codes"), x => x.cast("double")).as("__q")))
    try {
      val cents = lloydCentroids(codes, k, iters, idCol)
      // Materialize the final assignment (3 narrow columns) BEFORE the
      // quantized codes are freed — the returned frame must not reference
      // freed blocks. Its own blocks are reclaimed when the frame is GC'd.
      val (out, _) = Materialize.checkpointTracked(
        withBest(codes, cents)
          .select(col(idCol), col("__cid").as("cluster"),
            col("__dist").cast("long").as("dist")))
      (out, cents)
    } finally Materialize.free(sc, codesIds)
  }

  /** The integer Lloyd training loop over an ALREADY-QUANTIZED codes
    * frame (`idCol`, `__q` double-cast int8 code array) — the shared core
    * of [[assignWithCentroids]] and product-quantization sub-codebook
    * training ([[ProductQuantization]], which trains it per vector
    * slice). Per iteration: assignment is a pure projection against
    * broadcast-literal centroids, then one k·dim-row partial-aggregated
    * shuffle; only the k·dim int64 sums reach the driver. */
  private[ext] def lloydCentroids(codes: DataFrame, k: Int, iters: Int,
      idCol: String): Seq[Centroid] = {
    // Seeds: k smallest md5(id) — tiny driver-side collect (k rows).
    val seeds = codes
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .select(col("__q"))
      .collect()
    var cents: Seq[Centroid] = seeds.zipWithIndex.map { case (r, i) =>
      // a seed centroid is the member mean of its 1-element cluster
      Centroid(i, r.getSeq[Double](0).map(q => fixedPoint(q.toLong, 1L)).toArray)
    }.toIndexedSeq
    var it = 0
    while (it < iters) {
      // New sums: winning cluster per row (projection, zero shuffle),
      // then per-(cid, dim) int64 sums — partial agg reduces each task's
      // contribution to k·dim rows before the only shuffle.
      val sums = withBest(codes, cents)
        .select(col("__cid"), posexplode(col("__q")).as(Seq("__d", "__x")))
        .groupBy(col("__cid"), col("__d"))
        .agg(sum(col("__x").cast("long")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      cents = cents.map { old =>
        byCid.get(old.cid) match {
          case Some(rows) =>
            val dim = old.c.length
            val s = new Array[Long](dim)
            var n = 0L
            rows.foreach { r =>
              s(r.getInt(1)) = r.getLong(2)
              n = r.getLong(3)
            }
            Centroid(old.cid, s.map(fixedPoint(_, n)))
          case None => old // empty cluster keeps its centroid (defined!)
        }
      }
      it += 1
    }
    cents
  }

  /** Query-side centroid probe of a persisted index: per input row the
    * `nprobe` nearest centroids by the SAME fixed-point distance as
    * [[assign]] (ties on cluster id) — a pure projection against
    * closure-broadcast centroid literals, no join, no shuffle. `codesCol`
    * is the double-cast int8 code array (as [[Similarity.quantizeInt8]]
    * produces). Returns the input columns plus (`cluster`,
    * `probe_rank` 1-based). */
  def probe(codes: DataFrame, cents: Seq[Centroid], nprobe: Int,
      codesCol: String): DataFrame = {
    require(nprobe >= 1 && nprobe <= cents.size,
      s"nprobe must be in [1, ${cents.size}], got $nprobe")
    val qq = vecDot(col(codesCol), col(codesCol)) * lit(16384.0)
    val cands = cents.map { cent =>
      val cLit = typedLit(cent.c.map(_.toDouble).toSeq)
      val dist = qq - lit(256.0) * vecDot(col(codesCol), cLit) +
        lit(cent.c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))
      struct(dist.as("d"), lit(cent.cid).as("cid"))
    }
    codes
      .withColumn("__probed", slice(array_sort(array(cands: _*)), 1, nprobe))
      .select(col("*"), posexplode(col("__probed")).as(Seq("__pr", "__pc")))
      .withColumn("cluster", col("__pc.cid"))
      .withColumn("probe_rank", col("__pr") + 1)
      .drop("__probed", "__pr", "__pc")
  }

  /** Adds `__cid` (winning cluster) + `__dist` columns: per-centroid
    * distance via three exact double dot products (`Σ(128q−c)² =
    * 128²·q·q − 2·128·q·c + c·c` — every term < 2^53), argmin by
    * `least(struct(dist, cid)…)` so ties break on cluster id. The
    * centroids ride along as literals — broadcast by the closure, no join.
    */
  private def withBest(codes: DataFrame, cents: Seq[Centroid]): DataFrame =
    codes
      .withColumn("__best", bestOf(col("__q"), cents))
      .withColumn("__cid", col("__best.cid"))
      .withColumn("__dist", col("__best.d"))
      .drop("__best")

  /** The argmin itself as a reusable column: `struct(d, cid)` of the
    * nearest centroid to code vector `v` (ties on cluster id via
    * `least`). Centroids ride along as literals — broadcast by the
    * closure, no join. */
  private[ext] def bestOf(v: Column, cents: Seq[Centroid]): Column = {
    val qq = vecDot(v, v) * lit(16384.0)
    val cands = cents.map { cent =>
      val cLit = typedLit(cent.c.map(_.toDouble).toSeq)
      val dist = qq - lit(256.0) * vecDot(v, cLit) +
        lit(cent.c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))
      struct(dist.as("d"), lit(cent.cid).as("cid"))
    }
    least(cands: _*)
  }

  /** SemDeDup: semantic near-duplicate removal — quantized-cosine pairs
    * WITHIN each k-means cluster, exact integer threshold test
    * (`100·dot² ≥ thrPct²·|a|²·|b|² ∧ dot > 0` — int64-exact, no float
    * rounding), each document dropped when a smaller-id cluster-mate
    * exceeds the threshold. Returns (`idCol`, `cluster`, `is_dup`).
    *
    * Scale: the all-pairs step is per-cluster (SemDeDup's point — k grows
    * with the corpus so cluster size, and the pair join, stays bounded);
    * the join is a hash equi-join on the cluster id.
    */
  def semDedup(df: DataFrame, k: Int = 8, iters: Int = 4, thrPct: Int = 90,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = Similarity.quantizeInt8(df.filter(col(vecCol).isNotNull),
        idCol, vecCol)
      .select(col(idCol), transform(col("codes"), x => x.cast("double")).as("__q"))
    val assigned = assign(df, k, iters, idCol, vecCol)
      .join(codes, Seq(idCol))
      .select(col(idCol), col("cluster"), col("__q"),
        vecDot(col("__q"), col("__q")).as("__nn"))
    val a = assigned.select(col(idCol).as("__ida"), col("cluster"),
      col("__q").as("__qa"), col("__nn").as("__na"))
    val b = assigned.select(col(idCol).as("__idb"), col("cluster"),
      col("__q").as("__qb"), col("__nn").as("__nb"))
    val t2 = lit(thrPct.toDouble * thrPct.toDouble)
    val dup = a.join(b, Seq("cluster"))
      .filter(col("__ida") < col("__idb"))
      .withColumn("__dot", vecDot(col("__qa"), col("__qb")))
      // dot ≤ 64·127² ≈ 1.03e6; dot²·10⁴ ≈ 1.07e16 and na·nb·thr² ≤ 8.6e15
      // — beyond float64's 2^53 integer range, so the exact compare runs
      // in int64 (longs), where both sides fit with 600× headroom.
      .filter(col("__dot") > 0 &&
        lit(10000L) * (col("__dot") * col("__dot")).cast("long") >=
          t2.cast("long") * (col("__na") * col("__nb")).cast("long"))
      .select(col("__idb").as("__dup")).distinct()
    assigned.join(dup, assigned(idCol) === dup("__dup"), "left")
      .select(col(idCol), col("cluster"), col("__dup").isNotNull.as("is_dup"))
  }
}
