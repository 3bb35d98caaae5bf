package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a bounded-state aggregate, not a window sort.
  *
  * The standard formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC) <= k`) shuffles EVERY input row to its group's partition and
  * sorts whole groups — at corpus scale that is a full-data shuffle whose
  * per-group sort is dominated by rows that can never reach the top k.
  * This aggregator keeps a k-bounded, sorted buffer per (group, map
  * partition); Spark's ObjectHashAggregate partial-aggregates it map-side
  * like any hash agg, so the shuffle carries AT MOST k rows per group per
  * input partition regardless of row count, and the reduce side merges
  * k-bounded buffers instead of sorting groups. For k ≪ group size (the
  * curation shape: "top 5 exemplar docs per slice over 10^10 docs") the
  * shuffled volume drops from O(rows) to O(k · groups · partitions).
  *
  * Determinism: ordering is (score DESC, id ASC) — a total order whenever
  * ids are unique, so results are engine-replayable and the DuckDB oracle
  * can express the same query as a window rank. State is a sorted Vector
  * (k ≤ 4096 enforced); insert cost into the tiny buffer is bounded by k.
  */
object TopK {

  /** One buffered candidate. `score` DESC then `id` ASC. */
  final case class Entry(score: Long, id: Long)

  private def better(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private final class TopKAgg(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] =
      if (buf.lengthCompare(k) >= 0 && !better(e, buf.last)) buf
      else {
        val (pre, post) = buf.span(better(_, e))
        ((pre :+ e) ++ post).take(k)
      }
    override def zero: Seq[Entry] = Vector.empty
    override def reduce(b: Seq[Entry], e: Entry): Seq[Entry] = insert(b, e)
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[Entry]): Seq[Entry] = r
    override def bufferEncoder = ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder = ExpressionEncoder[Seq[Entry]]()
  }

  /** The aggregate as a reusable Column function: `topKColumn(k)(score,
    * id)` yields `array<struct<score,id>>` sorted best-first. */
  def topKColumn(k: Int): (Column, Column) => Column = {
    require(k >= 1 && k <= 4096, "k in [1, 4096]")
    val f = udaf(new TopKAgg(k), ExpressionEncoder[Entry]())
    (score, id) => f(score.cast("long"), id.cast("long"))
  }

  /** Top-k rows per group by (`scoreCol` DESC, `idCol` ASC). Returns
    * (groupCols…, rank 1-based, id, score). `idCol` must be unique within
    * a group for a total (replayable) order. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val g = groupCols.map(col)
    val agg = topKColumn(k)(col(scoreCol), col(idCol))
    df.groupBy(g: _*).agg(agg.as("__top"))
      .select((g :+ posexplode(col("__top"))): _*)
      .select((g ++ Seq((col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol), col("col.score").as(scoreCol))): _*)
  }
}
