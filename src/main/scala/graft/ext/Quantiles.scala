package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles without a global sort (driver-mandated
  * analytics extension; designed Spark-first).
  *
  * `approx_percentile` trades exactness for a sketch; a naive exact form
  * sorts each group through one task. This operator is exact AND
  * scale-safe for discrete domains: compress to `(group, value, count)`
  * with one hash aggregate — the map-side combine collapses the corpus
  * to |group × distinct value| rows — then run the per-group cumulative
  * window over the COMPRESSED frame, whose size is bounded by the value
  * domain, never the row count. The discrete quantile `q = num/den` is
  * the smallest value whose cumulative count reaches `ceil(q·n)`,
  * decided with the integer cross-multiplication `cum·den ≥ n·num` — no
  * floating point anywhere, so any engine replays it bit-identically. */
object Quantiles {

  /** One row per group: the named exact quantiles of `valueCol` plus
    * `n_rows`. `pcts` are `(outputName, numerator, denominator)` exact
    * rationals in (0, 1]. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[(String, Long, Long)]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall { case (_, n, d) => n > 0 && n <= d },
      s"quantiles must be rationals in (0,1]: $pcts")
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    val cum = counts.withColumn("__cum", sum("__c").over(byVal))
      .withColumn("__n", sum("__c").over(whole))
    val aggs = pcts.map { case (nm, num, den) =>
      min(when(col("__cum") * den >= col("__n") * num, col(valueCol))).as(nm)
    } :+ max(col("__n")).as("n_rows")
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
