package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-job profiler for one SparkEntry query: runs the query in a
  * Bench-identical session and prints every Spark job's wall time, task
  * count and description, so the time budget of multi-job queries
  * (streaming replays, iterative fixpoints, bounded collects) can be read
  * job by job instead of guessed (optimization guide §1/§7).
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName> [sfDir] [reps]
  */
object ProfileQuery {

  private final class JobLog extends SparkListener {
    case class J(start: Long, desc: String, var end: Long = 0L)
    val jobs = new ConcurrentHashMap[Int, J]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobs.put(e.jobId, J(e.time, desc))
      ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.end = e.time)
    }
    def reset(): Unit = jobs.clear()
    def dump(): Unit = {
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      val tot = js.map { case (_, j) => j.end - j.start }.sum
      println(f"[profile] ${js.size} jobs, sum ${tot / 1e3}%.2f s")
      js.foreach { case (id, j) =>
        val d = (j.end - j.start) / 1e3
        if (d >= 0.05)
          println(f"[profile]   job $id%4d ${d}%7.2f s  ${j.desc.take(90)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "33554432"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "90s")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      // warmup at the smallest scale, as the bench does
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[profile] warmup failed: $e") }
      spark.catalog.clearCache()
      (1 to reps).foreach { i =>
        log.reset()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[profile] $q run$i: $t%.2f s ($n rows)")
        log.dump()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
