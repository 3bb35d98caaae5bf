package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Vector arithmetic uses `zip_with`/`aggregate` column expressions over
  * `array<double>` — a strict left-to-right fold, so results are
  * bit-deterministic (and engine-portable), unlike a parallel reduction.
  *
  * Scale path: [[bruteForceTopK]] is the exact baseline (one broadcast of
  * the query set, no corpus shuffle — the corpus side streams through a
  * single projection). [[ivfTopK]] is the 100 TB path: k-means-style
  * centroids → inverted lists partitioned by centroid id → probe only
  * `nprobe` lists per query, cutting the scanned fraction to nprobe/nlist.
  */
object Similarity {

  /** Native codegen'd dot product (see [[graft.functions.VectorDot]]);
    * bit-identical to the sequential fold [[foldDot]]. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native codegen'd one-pass cosine; bit-identical to [[foldCosine]]. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecCosine(a, b)

  /** Reference implementations via higher-order functions — interpreted,
    * ~20× slower; kept for differential testing of the native expressions. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def foldCosine(a: Column, b: Column): Column =
    foldDot(a, b) / (sqrt(foldDot(a, a)) * sqrt(foldDot(b, b)))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Symmetric per-vector int8 quantization — the embedding-compression
    * step of a large-scale ANN deployment (4× smaller than float32: scan
    * bytes, broadcast size, and cache footprint all shrink 4×). Codes are
    * `floor(x·127/s + 0.5)` with `s = max|x|` kept alongside
    * (`dequantize ≈ codes·s/127`); the floor-based round-half-up is
    * engine-portable, so an external system (or the DuckDB oracle)
    * reproduces the codes bit-identically. Output: (`idCol`, `codes`
    * array<int>, `scale` double). */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val xd = asDouble(col(vecCol))
    val s = greatest(array_max(transform(xd, x => abs(x))),
      lit(java.lang.Double.MIN_NORMAL))
    df.select(col(idCol),
      transform(xd, x => floor(x * 127.0 / s + lit(0.5)).cast("int"))
        .as("codes"),
      s.as("scale"))
  }

  /** Exact top-k in the QUANTIZED domain: cosine is scale-invariant, so
    * the per-vector scales cancel and ranking needs only the int8 codes —
    * integer dot products (exact in doubles: |dot| ≤ dim·127² ≪ 2^53),
    * one sqrt+division at the end, fully deterministic and
    * oracle-replayable. Same scale shape as [[bruteForceTopK]] (broadcast
    * queries, corpus never shuffles) but the corpus side streams 4×
    * fewer bytes. Zero vectors (all-zero codes) rank last explicitly —
    * NaN ordering differs across engines. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def codesAsDouble(q: DataFrame, idAs: String, vecAs: String) =
      q.select(col(idCol).as(idAs),
        transform(col("codes"), x => x.cast("double")).as(vecAs))
    val c = codesAsDouble(quantizeInt8(corpus, idCol, vecCol), "vec_id", "__cv")
    val q = codesAsDouble(quantizeInt8(queries, idCol, vecCol), "query_id", "__qv")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("__dq", dot(col("__qv"), col("__cv")))
      .withColumn("__nq", dot(col("__qv"), col("__qv")))
      .withColumn("__nc", dot(col("__cv"), col("__cv")))
      .withColumn("qsim",
        when(col("__nq") === 0.0 || col("__nc") === 0.0, lit(-2.0))
          .otherwise(col("__dq") / (sqrt(col("__nq")) * sqrt(col("__nc")))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("qsim"))
  }

  /** Exact top-k by cosine for every query vector: broadcast queries ×
    * corpus projection → per-query rank. The corpus never shuffles until
    * the final (tiny) top-k aggregation. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
  }

  /** IVF (inverted-file) approximate top-k: assign corpus vectors to their
    * nearest of `nlist` centroids once, then probe the `nprobe` closest
    * lists per query. Centroids are a deterministic stride sample of the
    * corpus (a k-means iteration can refine them later without changing
    * the query path). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      refineIters: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("__cv"))
    // Deterministic pseudo-random seeds: the nlist smallest id-hashes.
    // orderBy+limit compiles to TakeOrderedAndProject — each partition
    // keeps its local top-nlist and the driver merges nlist·P candidates —
    // no global sort, no driver-side count, scales to any corpus size.
    val seeds = c.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nlist)
      .select(col("vec_id").as("cid"), col("__cv").as("__cent"))
    // Lloyd refinement: each iteration is one broadcast-assign pass + one
    // hash aggregate (element-wise mean via a posexplode/groupBy — no
    // driver-side vectors). Balances the inverted lists so probe cost is
    // even; the assignment below re-runs against the refined centroids.
    val centroids = (1 to refineIters).foldLeft(seeds) { (cents, _) =>
      val wA = Window.partitionBy(col("vec_id")).orderBy(col("__d").desc, col("cid"))
      val assignedTo = c.crossJoin(broadcast(cents))
        .withColumn("__d", cosine(col("__cv"), col("__cent")))
        .withColumn("__r", row_number().over(wA))
        .filter(col("__r") === 1)
        .select(col("cid"), col("__cv"))
      assignedTo
        .select(col("cid"), posexplode(col("__cv")).as(Seq("__pos", "__x")))
        .groupBy(col("cid"), col("__pos")).agg(avg(col("__x")).as("__m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
        .select(col("cid"), expr("transform(__pm, e -> e.__m)").as("__cent"))
    }
    // one pass: nearest centroid per corpus vector (broadcast centroids)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("__d").desc, col("cid"))
    val assigned = c.crossJoin(broadcast(centroids))
      .withColumn("__d", cosine(col("__cv"), col("__cent")))
      .withColumn("__r", row_number().over(wAssign))
      .filter(col("__r") === 1)
      .select(col("vec_id"), col("__cv"), col("cid"))
    // probe the nprobe closest lists per query
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__d").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__d", cosine(col("__qv"), col("__cent")))
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cid"))
    val scored = probes.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
  }
}
