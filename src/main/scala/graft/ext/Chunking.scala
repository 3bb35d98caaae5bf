package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the step between a curated
  * corpus and a context-window-bounded consumer (embedding models, RAG
  * indexers, fixed-length pre-training shards). Each document becomes
  * `ceil(max(len,1) / stride)` chunks of up to `size` characters whose
  * starts are `0, stride, 2·stride, …` — consecutive chunks overlap by
  * `size - stride` characters so no span longer than the overlap is ever
  * split across a chunk boundary unseen.
  *
  * Scale design: the start offsets are generated per row with `sequence`
  * and exploded — a pure narrow projection (no shuffle, no UDF, stays in
  * whole-stage codegen), so chunking 100 TB is one map stage whose output
  * is `size/stride`× the input rows, produced streaming — never
  * materialized per document.
  */
object Chunking {

  /** One row per (document, chunk): `chunk_idx` (0-based), `chunk_start`
    * (0-based char offset), `chunk` (the text window). Empty documents
    * yield exactly one empty chunk, so every input row survives. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val starts = sequence(lit(0),
      greatest(length(col(textCol)) - 1, lit(0)), lit(stride))
    df.select(col(idCol), col(textCol), posexplode(starts)
        .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        substring(col(textCol), col("chunk_start") + 1, lit(size)).as("chunk"))
  }

  /** Distribution summary: how many documents produced `n_chunks` chunks,
    * and the total chunk characters they emitted (exact longs). */
  def chunkSummary(chunked: DataFrame, idCol: String): DataFrame =
    chunked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(length(col("chunk")).cast("long")).as("doc_chunk_chars"))
      .groupBy(col("n_chunks"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_chunk_chars")).as("total_chunk_chars"))
}
