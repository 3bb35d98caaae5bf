package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011) over an embedding column —
  * the memory-bound scale path for 100 TB similarity search: each vector
  * is stored as `m` sub-codebook ids (m bytes at k≤256) instead of
  * dim·4 float bytes, and a query ranks the whole corpus with ONE table
  * lookup + add per subspace per row, never touching the raw vectors.
  *
  * Engine-portable by construction, reusing the [[KMeans]] fixed-point
  * contract end-to-end: vectors are int8-quantized once over the FULL
  * vector ([[Similarity.quantizeInt8]] — per-vector scale, so sub-slices
  * stay comparable), each subspace trains the same integer Lloyd loop
  * ([[KMeans.lloydCentroids]] — md5-seeded, int64 sums, fixed-point
  * centroids), and the asymmetric distance is the exact integer
  * `Σ_i (128·q_i − c_i)²` per subspace, summed across subspaces in int64.
  * Every step replays bit-identically in the DuckDB oracle (q144).
  *
  * Scale shape: training = m × (iters scans + one k·subdim-row shuffle);
  * encoding = one pure projection against broadcast-literal codebooks
  * (no join, no shuffle); query ADC = per-subspace lookup tables built
  * DRIVER-side from the m·k centroid metadata (bounded, same contract as
  * the centroid collects in [[KMeans]]), applied as a literal-array
  * `element_at` projection + `orderBy(score).limit(k)` which compiles to
  * TakeOrderedAndProject — no global sort, no single-partition window.
  *
  * Reference behavior anchored: the reference's embedding-similarity
  * surface (reference/src/data_derivation sketches similarity dedup via
  * pairwise cosine); PQ is the published scale-out of that surface.
  */
object ProductQuantization {

  /** One trained subspace codebook: subspace index + its centroids (in
    * the fixed-point scale-128 domain of [[KMeans.Centroid]]). */
  final case class Codebook(sub: Int, cents: Seq[KMeans.Centroid])

  /** Train `m` sub-codebooks over the int8-quantized corpus. Returns the
    * codebooks plus the checkpointed codes frame (`idCol`, `__qf` full
    * double-cast code array) and its checkpoint ids — callers must free
    * via [[Materialize.free]] when done with the codes frame. */
  private def train(df: DataFrame, m: Int, ksub: Int, iters: Int,
      idCol: String, vecCol: String)
      : (DataFrame, Set[Int], Seq[Codebook], Int) = {
    val (codes, ids) = Materialize.checkpointTracked(
      Similarity.quantizeInt8(df.filter(col(vecCol).isNotNull), idCol, vecCol)
        .select(col(idCol),
          transform(col("codes"), x => x.cast("double")).as("__qf")))
    // dim from one row (bounded 1-row head; the array type carries no
    // static length). Sub-slicing requires dim % m == 0.
    val dim = codes.select(size(col("__qf"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subdim = dim / m
    val books = (0 until m).map { s =>
      val sub = codes.select(col(idCol),
        slice(col("__qf"), s * subdim + 1, subdim).as("__q"))
      Codebook(s, KMeans.lloydCentroids(sub, ksub, iters, idCol))
    }
    (codes, ids, books, subdim)
  }

  /** Per-subspace nearest-codebook id of the row's slice — the PQ code,
    * as a pure projection (codebooks are broadcast literals). */
  private def codeCol(full: Column, book: Codebook, subdim: Int): Column =
    KMeans.bestOf(slice(full, book.sub * subdim + 1, subdim), book.cents)("cid")

  /** Exact integer ADC entry: squared fixed-point distance between a
    * query slice (int8 codes) and one centroid — `Σ (128·q − c)²`,
    * ≤ subdim·(2·128·127)² ≈ 1.7e10, exact in int64 with huge headroom. */
  private def adcDist(q: Array[Long], c: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < q.length) {
      val d = 128L * q(i) - c(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Rank the corpus against ONE query vector (the row of `queryId`) by
    * PQ asymmetric distance. Returns (`idCol`, `pq_dist` long, `rk`) of
    * the `k` nearest non-query rows, ties on id. */
  def topK(df: DataFrame, queryId: Long, k: Int, m: Int = 4,
      ksub: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val (codes, ids, books, subdim) = train(df, m, ksub, iters, idCol, vecCol)
    try {
      // Query row: one bounded collect of a dim-length code array.
      val qRow: Row = codes.filter(col(idCol) === queryId).head()
      val qFull = qRow.getSeq[Double](1).map(_.toLong).toArray
      // Driver-side ADC lookup tables: m × ksub exact int64 distances.
      val tables: Seq[Array[Long]] = books.map { b =>
        val qSlice = qFull.slice(b.sub * subdim, (b.sub + 1) * subdim)
        b.cents.sortBy(_.cid).map(c => adcDist(qSlice, c.c)).toArray
      }
      // Score projection: per subspace, encode (argmin vs broadcast
      // codebook) then table lookup; int64 sum across subspaces.
      val score = books.zip(tables).map { case (b, t) =>
        element_at(typedLit(t.toSeq),
          codeCol(col("__qf"), b, subdim).cast("int") + 1)
      }.reduce(_ + _)
      val ranked = codes
        .filter(col(idCol) =!= queryId)
        .select(col(idCol), score.cast("long").as("pq_dist"))
        .orderBy(col("pq_dist"), col(idCol))
        .limit(k)
      // rk over the ≤k collected survivors only (post-limit window).
      import org.apache.spark.sql.expressions.Window
      val out = ranked.withColumn("rk", row_number().over(
        Window.orderBy(col("pq_dist"), col(idCol))).cast("long"))
      // Materialize before freeing the checkpointed codes the plan reads.
      val (fin, _) = Materialize.checkpointTracked(out)
      fin
    } finally Materialize.free(sc, ids)
  }
}
