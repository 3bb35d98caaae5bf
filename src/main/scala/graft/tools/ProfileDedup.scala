package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the n-gram Jaccard pipeline: times each
  * sub-stage of candidate generation + verify in isolation to locate the
  * expensive legs (not part of the driver contract). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    def toks = {
      val t = split(lower(col("text")), "\\W+")
      filter(t, x => x =!= "")
    }
    def shingle = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3)))))

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }

    time("tokens_only") { docs.select(explode(toks)).count() }
    time("docsets") { docs.select(col("doc_id"), shingle.as("__set")).count() }
    time("postings") {
      docs.select(col("doc_id").as("__id"), explode(shingle).as("__sh")).count()
    }
    def post = docs.select(col("doc_id").as("__id"), explode(shingle).as("__sh"))
    time("dfreq_groupby") { post.groupBy("__sh").count().count() }
    def byDoc = Window.partitionBy(col("__id"))
    // current shape: groupBy dfreq + join + two windows
    def prefixJoin = {
      val dfreq = post.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
      post.join(dfreq, "__sh")
        .withColumn("__psz", count(lit(1)).over(byDoc))
        .withColumn("__rn", row_number().over(byDoc.orderBy(col("__df"), col("__sh"))))
        .filter(col("__rn") <= ceil(lit(0.2) * col("__psz")) + lit(1))
    }
    // window shape: df via window over __sh, no join
    def prefixWin = {
      post.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__sh"))))
        .withColumn("__psz", count(lit(1)).over(byDoc))
        .withColumn("__rn", row_number().over(byDoc.orderBy(col("__df"), col("__sh"))))
        .filter(col("__rn") <= ceil(lit(0.2) * col("__psz")) + lit(1))
    }
    time("prefix_join") { prefixJoin.count() }
    time("prefix_win") { prefixWin.count() }
    def cand(prefix: DataFrame) = {
      val pa = prefix.select(col("__id").as("id_a"), col("__sh"))
      val pb = prefix.select(col("__id").as("id_b"), col("__sh"))
      pa.join(pb, Seq("__sh")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
    }
    time("cand_join") { cand(prefixJoin).count() }
    time("cand_win") { cand(prefixWin).count() }
    time("full_q31") {
      graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8).count()
    }
    spark.stop()
  }
}
