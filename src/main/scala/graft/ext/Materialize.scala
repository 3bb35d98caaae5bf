package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation helper for iterative / multi-consumer plans
  * ([[Clustering]], [[Packing]]): `localCheckpoint` a frame eagerly and
  * report exactly which persisted RDD ids the checkpoint created, so the
  * caller can free those blocks the moment they stop being needed.
  * Blocks backing a RETURNED frame are left to Spark's ContextCleaner
  * (freed when the frame is garbage-collected; no cache-manager entry is
  * created, so nothing requires a manual clearCache). */
private[ext] object Materialize {

  def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint()
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  def free(sc: SparkContext, ids: Set[Int]): Unit =
    ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
}
