package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary media column (`content`) + typed metadata. */
case class MediaFile(
  media_id: Long,
  kind: String,            // image | audio | video
  content: Array[Byte],    // opaque payload — never interpreted by Spark
  width: Int, height: Int, // image/video metadata (0 when n/a)
  duration_ms: Long)       // audio/video metadata (0 when n/a)

/** Decoded per-media features. */
case class MediaFeatures(
  media_id: Long,
  kind: String,
  feature: Array[Float],   // embedding-like feature vector
  n_frames: Int,           // frames sampled (video), 1 otherwise
  thumb_w: Int, thumb_h: Int)

/** Multimodal-column plumbing: binary payloads with typed metadata, decoded
  * and featurized per partition.
  *
  * The Spark-side architecture is the real deliverable here: media bytes
  * ride as an opaque `binary` column next to typed metadata; decode /
  * feature-extract / resize / frame-sample run inside
  * `Dataset.mapPartitions` (the JVM analogue of `mapInPandas`: one
  * iterator per partition, so the decoder amortizes init per batch and
  * memory is bounded by partition size — use [[repartitionForDecode]] to
  * size partitions before heavy decodes at scale).
  *
  * THE DECODER ITSELF IS A STUB: no image/audio codecs exist in this
  * environment, so [[stubDecode]] derives a deterministic fake feature
  * vector from the payload bytes. Swapping in a real codec touches only
  * that one function — schema, partitioning, and batch shape stay as-is.
  */
object Multimodal {

  /** Fabricate a media table from the documents fixture (text bytes as
    * payload) — the fixtures ship no binary table, the plumbing is real. */
  def ingestFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1920 + 1).cast("int"))
        .otherwise(0).as("width"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1080 + 1).cast("int"))
        .otherwise(0).as("height"),
      when(col("doc_id") % 3 =!= 0, col("n_chars") * 100).otherwise(0L)
        .as("duration_ms")
    ).as[MediaFile]
  }

  /** Bound per-task memory before a heavy decode: at 100 TB the payload
    * column dominates, so cap rows per partition rather than bytes.
    *
    * Sizes from the optimizer's plan statistics — no extra Spark job. A
    * `count()` here would be a full pass over the payload pipeline per
    * call (at 100 TB, a second read of the dataset just to pick a
    * partition count). When the planner has no row-count estimate, fall
    * back to sizeInBytes over a conservative mean payload size; non-file
    * relations can report the sizeInBytes sentinel (effectively
    * Long.MaxValue), so the partition count is clamped to
    * [1, maxPartitions] before the Int cast — an unclamped `.toInt` wraps
    * negative and `repartition` throws. */
  def repartitionForDecode[T](ds: Dataset[T], rowsPerPartition: Long,
      estimatedRowBytes: Long = 1L << 20,
      maxPartitions: Int = 1 << 16): Dataset[T] = {
    val stats = ds.queryExecution.optimizedPlan.stats
    val rows = stats.rowCount.map(_.toLong).getOrElse(
      stats.sizeInBytes.toLong / math.max(1L, estimatedRowBytes))
    val n = math.min(maxPartitions.toLong,
      math.max(1L, rows / math.max(1L, rowsPerPartition))).toInt
    ds.repartition(n)
  }

  /** STUB decoder: deterministic fake features from payload bytes.
    * Replace with a real codec (JNI/ffmpeg/ImageIO) — signature and batch
    * shape are final. */
  private[ext] def stubDecode(m: MediaFile, dim: Int): MediaFeatures = {
    // ??? <- real codec goes here; deterministic fake below keeps the
    // pipeline testable without native libraries.
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    m.content.foreach(b => h = h * 31 + b)
    val feat = Array.tabulate(dim) { i =>
      val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
      ((x % 1000L).toFloat / 1000.0f)
    }
    val frames = if (m.kind == "video") math.max(1, (m.duration_ms / 1000L).toInt) else 1
    MediaFeatures(m.media_id, m.kind, feat, frames,
      thumb_w = if (m.width > 0) math.max(1, m.width / 8) else 0,
      thumb_h = if (m.height > 0) math.max(1, m.height / 8) else 0)
  }

  /** Decode + featurize, one decoder instance per partition. */
  def decodeAndFeaturize(ds: Dataset[MediaFile], dim: Int = 16)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would happen here (codec handles, etc.)
      it.map(m => stubDecode(m, dim))
    }
  }

  /** Frame-sample metadata transform: how many frames a sampler would pull
    * at `everyMs` — pure column arithmetic, no decode. */
  def frameSamplePlan(ds: Dataset[MediaFile], everyMs: Long): DataFrame =
    ds.toDF().withColumn("planned_frames",
      when(col("duration_ms") > 0, (col("duration_ms") / everyMs).cast("int") + 1)
        .otherwise(lit(1)))
}
