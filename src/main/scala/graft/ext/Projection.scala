package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss signed random projection — the dimensionality-
  * reduction step in front of ANN / clustering / dedup over embeddings
  * (Achlioptas 2003: ±1 entries preserve pairwise distances in
  * expectation like Gaussian projections, at integer cost).
  *
  * Engine-portable by construction: vectors go through the SAME int8
  * quantization as the ANN family ([[Similarity.quantizeInt8]]), and the
  * projection matrix is not random at all — entry `s(j,i)` is the parity
  * of the first md5 nibble of `"j_i"` (1-based), so any engine re-derives
  * the matrix from md5 alone and every output component is an exact
  * integer sum (|out| ≤ dim·127·1 ≪ 2^31). The matrix is materialized
  * once, driver-side, as a broadcast literal — the same shape trained
  * weights would take (cf. the q104 classifier).
  *
  * Scale: one pure projection pass — no join, no shuffle, no state. The
  * outDim×inDim literal is a few KB; scoring 100 TB of embeddings is one
  * scan. */
object Projection {

  /** The deterministic ±1 matrix entry (1-based j, i). */
  def signOf(j: Int, i: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** Project quantized embeddings to `outDim` signed-sum components:
    * (idCol, proj array<long>). Null vectors are dropped (no defined
    * projection). The whole outDim×inDim multiply runs as ONE codegen'd
    * array pass ([[org.apache.spark.sql.graft.SignedProjection]]) — the
    * prior higher-order-function chain evaluated an interpreted boxed
    * lambda per matrix element and was measured ~90× slower than this at
    * sf0.1. Long sums are exact, so outputs are bit-identical to the
    * fold formulation the oracle replays. */
  def signedProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim > 0 && outDim > 0, "dimensions must be positive")
    val signs: Array[Int] =
      Array.tabulate(outDim * inDim)(k => signOf(k / inDim + 1, k % inDim + 1))
    Similarity.quantizeInt8(df.filter(col(vecCol).isNotNull), idCol, vecCol)
      .withColumn("proj", org.apache.spark.sql.graft.VectorBridge
        .signedProjection(col("codes"), signs, outDim, inDim))
      .select(col(idCol), col("proj"))
  }
}
