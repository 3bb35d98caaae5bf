package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus search primitives: a relational inverted index and conjunctive
  * top-k retrieval over it — the "find the documents about X" face of a
  * curation pipeline (inspecting what a filter kept, pulling exemplars
  * for eval, spot-checking dedup clusters).
  *
  * Scale shape: the index build is one explode + one hash aggregate
  * (linear in corpus tokens, the same cost class as token stats); a
  * query is a scan of the index FILTERED BY TERM — and because the
  * index is a table, storing it sorted/write-ordered by token turns
  * that filter into manifest-level file skipping: a 3-term query over a
  * 100 TB corpus's index touches only the files holding those terms'
  * postings. Scoring is integer term frequency (deterministic across
  * engines); ties break by document id, so top-k is a total order. */
object Search {

  /** Inverted index rows: (token, idCol, tf). */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive (AND) top-k: documents containing EVERY query term,
    * scored by summed term frequency, ties broken by ascending id. */
  def searchAll(index: DataFrame, idCol: String, terms: Seq[String],
      k: Int): DataFrame = {
    val distinct = terms.distinct
    require(distinct.nonEmpty, "need at least one term")
    index.filter(col("token").isin(distinct.map(t => t: Any): _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("token")).as("__nt"),
        sum(col("tf")).as("score"))
      .filter(col("__nt") === distinct.size)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
