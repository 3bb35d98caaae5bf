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
  * IMAGES AND AUDIO DECODE FOR REAL: image payloads go through the JDK's
  * bundled `javax.imageio` readers (PNG/JPEG/GIF/BMP ship with every JDK)
  * and thumbnail dimensions come from the DECODED raster; audio payloads
  * go through `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU ship with
  * every JDK) and frame counts/features come from the DECODED PCM stream.
  * No external codec jars either way. Video decoding has no JDK codec, so
  * [[stubDecode]] stays as the documented deterministic fallback for it
  * (and for exotic image/audio formats no JDK reader claims) — swapping
  * in ffmpeg/JNI touches only that one function; schema, partitioning,
  * and batch shape are final.
  */
object Multimodal {

  /** Fabricate a media table from the documents fixture — the fixtures
    * ship no binary table, the plumbing is real. Image-kind rows carry a
    * REAL PNG payload (encoded executor-side with the JDK PNG writer,
    * dimensions derived from the doc metadata); audio-kind rows carry a
    * REAL WAV payload (JDK AudioSystem writer, one PCM frame per doc
    * char); video rows carry the text bytes as an opaque payload. */
  def ingestFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 64 + 1).cast("int"))
        .otherwise(0).as("width"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 48 + 1).cast("int"))
        .otherwise(0).as("height"),
      when(col("doc_id") % 3 =!= 0, col("n_chars") * 100).otherwise(0L)
        .as("duration_ms")
    ).as[MediaFile]
      .mapPartitions(_.map { m =>
        if (m.kind == "image")
          m.copy(content = encodePng(m.width, m.height, m.media_id))
        else if (m.kind == "audio")
          m.copy(content = encodeWav((m.duration_ms / 100L).toInt, m.media_id))
        else m
      })
  }

  /** Deterministic PCM-16 mono WAV encoded with the JDK's AudioSystem
    * writer — real bytes, so the decode side is a genuine parse round
    * trip (mirrors [[encodePng]]). 10 Hz keeps payloads byte-cheap while
    * exercising the full header + stream path. */
  private[ext] def encodeWav(nSamples: Int, seed: Long): Array[Byte] = {
    val n = math.max(1, nSamples)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL) >>> 16)
        .toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(10.0f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Decode an audio payload via the JDK's bundled readers (WAV/AIFF/AU);
    * None when no reader claims the format (→ [[stubDecode]] fallback). */
  private[ext] def decodeAudio(bytes: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] =
    try Some(javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => None
    }

  /** Real audio decode: parse the container with AudioSystem, frame count
    * from the DECODED stream (not the metadata columns), features from a
    * rolling hash of sampled PCM bytes. Falls back to [[stubDecode]]
    * when no JDK reader claims the bytes. */
  private[ext] def audioDecode(m: MediaFile, dim: Int): MediaFeatures =
    decodeAudio(m.content) match {
      case Some(stream) =>
        try {
          val frames = stream.getFrameLength.toInt
          val frameBytes = math.max(1, stream.getFormat.getFrameSize)
          val pcm = stream.readAllBytes()
          var hh = 1125899906842597L
          val step = math.max(1, pcm.length / 2048) // ≤2048 sampled bytes
          var i = 0
          while (i < pcm.length) { hh = hh * 31 + pcm(i); i += step }
          val feat = Array.tabulate(dim) { j =>
            val x = hh ^ (j.toLong * 0x9E3779B97F4A7C15L)
            ((x % 1000L).toFloat / 1000.0f)
          }
          MediaFeatures(m.media_id, m.kind, feat,
            n_frames = math.max(1, if (frames >= 0) frames
              else pcm.length / frameBytes),
            thumb_w = 0, thumb_h = 0)
        } finally stream.close()
      case None => stubDecode(m, dim)
    }

  /** Deterministic solid-tint PNG encoded with the JDK's ImageIO writer —
    * real bytes, so the decode side is a genuine parse round trip. */
  private[ext] def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    java.util.Arrays.fill(buf, (seed * 0x9E3779B97F4A7C15L).toInt & 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode an image payload via the JDK's bundled readers; None when no
    * reader claims the format (exotic codecs → [[stubDecode]] fallback). */
  private[ext] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

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

  /** Real image decode: parse the payload with ImageIO, thumbnail from the
    * DECODED raster dimensions, feature vector hashed from sampled decoded
    * pixels (deterministic). Falls back to [[stubDecode]] when no JDK
    * reader claims the bytes. */
  private[ext] def imageDecode(m: MediaFile, dim: Int): MediaFeatures =
    decodeImage(m.content) match {
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        var hh = 1125899906842597L
        val n = w * h
        val step = math.max(1, n / 1024) // ≤1024 sampled pixels per image
        var i = 0
        while (i < n) { hh = hh * 31 + img.getRGB(i % w, i / w); i += step }
        val feat = Array.tabulate(dim) { j =>
          val x = hh ^ (j.toLong * 0x9E3779B97F4A7C15L)
          ((x % 1000L).toFloat / 1000.0f)
        }
        MediaFeatures(m.media_id, m.kind, feat, n_frames = 1,
          thumb_w = math.max(1, w / 8), thumb_h = math.max(1, h / 8))
      case None => stubDecode(m, dim)
    }

  /** STUB decoder for formats with no JDK codec (video; exotic
    * image/audio): deterministic fake features from payload bytes.
    * Replace with a real codec (JNI/ffmpeg) — signature and batch shape
    * are final. */
  private[ext] def stubDecode(m: MediaFile, dim: Int): MediaFeatures = {
    // ??? <- real audio/video codec goes here; deterministic fake below
    // keeps the pipeline testable without native libraries.
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

  /** Decode + featurize, one decoder instance per partition: images
    * through the real ImageIO parse, audio through the real AudioSystem
    * parse, video through the stub. */
  def decodeAndFeaturize(ds: Dataset[MediaFile], dim: Int = 16)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would happen here (codec handles, etc.)
      it.map { m =>
        if (m.kind == "image") imageDecode(m, dim)
        else if (m.kind == "audio") audioDecode(m, dim)
        else stubDecode(m, dim)
      }
    }
  }

  /** Frame-sample metadata transform: how many frames a sampler would pull
    * at `everyMs` — pure column arithmetic, no decode. */
  def frameSamplePlan(ds: Dataset[MediaFile], everyMs: Long): DataFrame =
    ds.toDF().withColumn("planned_frames",
      when(col("duration_ms") > 0, (col("duration_ms") / everyMs).cast("int") + 1)
        .otherwise(lit(1)))

  /** Patterned 8×8 grayscale PNG fixture with PLANTED near-dup families:
    * image rows (doc_id % 3 = 0) get pixel `c ∈ [0,64)` of value
    * `base(f,c) = (f·73 + c)·131 mod 256` for family `f = doc_id % 30`,
    * with ONE member-specific cell `(doc_id/30) % 64` shifted by
    * `+96 mod 256` — so members of a family decode to rasters differing
    * in one cell (a few average-hash bits) while families differ in ~half
    * the bits. Integer formula end to end: an oracle replays every pixel,
    * hash bit, and pair without decoding a byte, while the Spark side
    * round-trips REAL PNG bytes through ImageIO. */
  def patternedImages(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(lit(""), "UTF-8").as("content"),
        lit(8).as("width"), lit(8).as("height"), lit(0L).as("duration_ms"))
      .as[MediaFile]
      .mapPartitions(_.map { m =>
        val f = (m.media_id % 30L).toInt
        val perturbed = ((m.media_id / 30L) % 64L).toInt
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var c = 0
        while (c < 64) {
          val base = ((f * 73 + c) * 131) % 256
          val g = if (c == perturbed) (base + 96) % 256 else base
          img.setRGB(c % 8, c / 8, (g << 16) | (g << 8) | g)
          c += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        m.copy(content = baos.toByteArray)
      })
  }

  /** Shared average-hash step: bit `c` set iff cell `c`'s sum clears the
    * whole-signal mean, decided by the integer cross-multiplication
    * `cellSum·64 > totalSum` — no division, engine-replayable. The same
    * 64-bit hash layer serves every modality; only the cell-sum
    * extraction differs (pixel blocks, PCM windows). */
  private def aHashFromCellSums(sums: Array[Long]): Long = {
    val total = sums.sum
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (sums(c) * 64L > total) hash |= (1L << c)
      c += 1
    }
    hash
  }

  /** 64-bit average hash from the DECODED raster: block-mean the image to
    * an 8×8 grid (requires width/height multiples of 8 so every block has
    * the same pixel count), bit `c` set iff cell `c`'s luminance sum
    * clears the image mean — decided by the integer cross-multiplication
    * `cellSum·64 > totalSum`, no division, so any engine replays the hash
    * exactly. Luminance is the blue channel (the fixture writes gray).
    * One pass per image inside mapPartitions; output is (media_id, ahash). */
  def imageAHash(ds: Dataset[MediaFile])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      decodeImage(m.content).flatMap { img =>
        val w = img.getWidth; val h = img.getHeight
        if (w % 8 != 0 || h % 8 != 0) None
        else {
          val bw = w / 8; val bh = h / 8
          val sums = new Array[Long](64)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sums((y / bh) * 8 + (x / bw)) += (img.getRGB(x, y) & 0xFF).toLong
              x += 1
            }
            y += 1
          }
          Some((m.media_id, aHashFromCellSums(sums)))
        }
      }
    }).toDF("media_id", "ahash")
  }

  /** Patterned PCM-16 WAV fixture with PLANTED near-dup families — the
    * audio twin of [[patternedImages]]: audio rows (doc_id % 3 = 1) get
    * 64 samples whose unsigned top byte follows the SAME integer formula
    * (`(f·73 + c)·131 mod 256`, family `f = doc_id % 30`, one
    * member-specific window shifted `+96 mod 256`), stored as the exact
    * sample `(u − 128)·256` so the byte round-trips through the real
    * AudioSystem WAV encode/decode losslessly. */
  def patternedAudio(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").as("media_id"), lit("audio").as("kind"),
        encode(lit(""), "UTF-8").as("content"),
        lit(0).as("width"), lit(0).as("height"), lit(6400L).as("duration_ms"))
      .as[MediaFile]
      .mapPartitions(_.map { m =>
        val f = (m.media_id % 30L).toInt
        val perturbed = ((m.media_id / 30L) % 64L).toInt
        val pcm = new Array[Byte](64 * 2)
        var c = 0
        while (c < 64) {
          val base = ((f * 73 + c) * 131) % 256
          val u = if (c == perturbed) (base + 96) % 256 else base
          val s = ((u - 128) * 256).toShort
          pcm(2 * c) = (s & 0xff).toByte
          pcm(2 * c + 1) = ((s >> 8) & 0xff).toByte
          c += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(10.0f, 16, 1, true, false)
        val in = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, 64L)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(in,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        m.copy(content = baos.toByteArray)
      })
  }

  /** 64-bit average hash from the DECODED PCM stream — the audio face of
    * [[imageAHash]]: the signal splits into 64 equal windows (frame count
    * must be a multiple of 64), each sample contributes its unsigned top
    * byte `(s >> 8) + 128`, and the window sums feed the same
    * `cellSum·64 > totalSum` bit rule. Real AudioSystem parse per
    * payload inside mapPartitions; output is (media_id, ahash), ready for
    * [[aHashNearDupPairs]] — the banded Hamming layer is modality-blind. */
  def audioAHash(ds: Dataset[MediaFile])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      decodeAudio(m.content).flatMap { stream =>
        try {
          val fmt = stream.getFormat
          val pcm = stream.readAllBytes()
          val n = pcm.length / 2
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              fmt.isBigEndian || n == 0 || n % 64 != 0) None
          else {
            val win = n / 64
            val sums = new Array[Long](64)
            var i = 0
            while (i < n) {
              val s = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF))
                .toShort
              sums(i / win) += ((s >> 8) + 128).toLong
              i += 1
            }
            Some((m.media_id, aHashFromCellSums(sums)))
          }
        } finally stream.close()
      }
    }).toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs by banded Hamming search over the 64-bit
    * average hash: the hash splits into four 16-bit bands; a pair landing
    * in the same bucket of ANY band is a candidate (an equi-join per band
    * — the SimHash trick on image bits), then `bit_count(xor)` verifies
    * the true distance. `maxHamming < 4` makes recall EXACT by
    * pigeonhole: ≤3 differing bits cannot touch all four bands, so every
    * qualifying pair shares at least one clean band. Candidate volume is
    * bounded by bucket co-occupancy, never the image-pair square. */
  def aHashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", hashCol: String = "ahash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "4x16 banding guarantees full recall only for maxHamming < 4")
    val bands = (0 until 4).map { j =>
      hashes.select(col(idCol), col(hashCol), lit(j).as("__band"),
        expr(s"shiftrightunsigned($hashCol, ${16 * j}) & 65535").as("__key"))
    }.reduce(_ unionByName _)
    val a = bands.select(col("__band"), col("__key"),
      col(idCol).as("id_a"), col(hashCol).as("__ha"))
    val b = bands.select(col("__band"), col("__key"),
      col(idCol).as("id_b"), col(hashCol).as("__hb"))
    a.join(b, Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
