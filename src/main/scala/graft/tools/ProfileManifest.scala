package graft.tools

import graft.core.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manifest-scaling probe: what does ONE small append cost on a table
  * that already holds many files? With a flat inline manifest every
  * commit re-serializes the whole file list — O(files) bytes and time
  * per append, O(commits × files) metadata on disk. With file-list
  * segmentation ([[TableStore]] `fileSegments`) an append writes the
  * new entries plus an occasional rolled segment — amortized O(new)
  * regardless of table size.
  *
  * Usage: `sbt "runMain graft.tools.ProfileManifest [filesPerCommit
  * commits appends]"` (defaults 512 16 48 → an 8192-file table).
  * Prints one line per mode: total manifest bytes written by the
  * appends, mean/max append wall-millis, and resulting `_manifests`
  * dir bytes. */
object ProfileManifest {
  def main(args: Array[String]): Unit = {
    val filesPerCommit = args.lift(0).map(_.toInt).getOrElse(512)
    val commits = args.lift(1).map(_.toInt).getOrElse(16)
    val appends = args.lift(2).map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def dirBytes(p: java.io.File): Long =
      Option(p.listFiles).map(_.map(f =>
        if (f.isDirectory) dirBytes(f) else f.length()).sum).getOrElse(0L)

    Seq(("inline", Int.MaxValue.toString), ("segmented", "1024"))
      .foreach { case (mode, roll) =>
        spark.conf.set("spark.graft.manifest.segmentRollThreshold", roll)
        val wh = java.nio.file.Files.createTempDirectory(s"pm_$mode").toString
        val store = new TableStore(spark, wh)
        // build the many-file table: `commits` waves of tiny files
        (1 to commits).foreach { i =>
          val df = (1 to filesPerCommit).map(j => (i.toLong * 100000 + j, j))
            .toDF("id", "v").repartition(filesPerCommit)
          if (i == 1) store.commit("t", df, "create") else store.append("t", df)
        }
        val maniDir = new java.io.File(wh, "t/_manifests")
        val before = dirBytes(maniDir)
        val times = (1 to appends).map { i =>
          val df = Seq((900000000L + i, i)).toDF("id", "v").coalesce(1)
          val t0 = System.nanoTime()
          store.append("t", df)
          (System.nanoTime() - t0) / 1e6
        }
        val written = dirBytes(maniDir) - before
        val files = store.manifests("t").maxBy(_.version).files.size
        println(f"$mode%-9s files=$files%6d  appendManifestBytes=$written%12d" +
          f"  perAppendKB=${written / 1024.0 / appends}%9.1f" +
          f"  meanMs=${times.sum / times.size}%8.1f  maxMs=${times.max}%8.1f")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(wh))
      }
    spark.stop()
  }
}
