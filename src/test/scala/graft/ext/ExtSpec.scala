package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs: DataFrame = graft.Tables.load(spark, sfDir, "documents")
  private def embs: DataFrame = graft.Tables.load(spark, sfDir, "embeddings")

  test("nearDupIdsAgainst flags exactly the docs clearing the integer jaccard gate") {
    // corpus doc 1 shingles {a b c, b c d, c d e}; batch doc 10 identical
    // (jaccard 1), doc 11 shares 2 of 4 union (0.5), doc 12 disjoint
    val corpus = Seq((1L, "a b c d e")).toDF("id", "text")
    val batch = Seq((10L, "a b c d e"), (11L, "a b c d x"), (12L, "zz yy qq rr"))
      .toDF("id", "text")
    val ck = Dedup.shingleKeySets(corpus, "id", "text")
    val cs = ck.groupBy("id").agg(count(lit(1)).as("n_keys"))
    val bk = Dedup.shingleKeySets(batch, "id", "text")
    val bs = bk.groupBy("id").agg(count(lit(1)).as("n_keys"))
    def flagged(num: Long, den: Long): Set[Long] =
      Dedup.nearDupIdsAgainst(bk, ck, bs, cs, "id", num, den)
        .as[Long].collect().toSet
    assert(flagged(4L, 5L) == Set(10L))      // jaccard >= 0.8
    assert(flagged(1L, 2L) == Set(10L, 11L)) // 0.5 boundary is inclusive
    assert(flagged(1L, 1L) == Set(10L))      // only exact content at 1.0
  }

  test("exact dedup keeps the lowest id per duplicated content") {
    val df = Seq(
      (1L, "Hello,  WORLD!"), (2L, "hello world"), (3L, "different text here")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L)) // 1 and 2 normalize identically; keep 1
  }

  test("jaccardPairs finds planted near-identical docs and is symmetric-safe") {
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // identical
      (3L, "a b c d e f g x"),                          // near-dup of 1/2
      (4L, "totally different words here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashLshPairs ⊆ exact jaccardPairs on fixture docs") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-exact pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty, "LSH should recover at least one planted near-dup")
  }

  test("simhash: identical docs share a signature; hamming is 0 for them") {
    val df = Seq((1L, "spark merge join table"), (2L, "spark merge join table"),
      (3L, "completely other content stream")).toDF("doc_id", "text")
    val sigs = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding LSH near-dup ⊆ brute-force near-dup on fixture embeddings") {
    val v = transform(col("embedding"), x => x.cast("double"))
    val a = embs.select(col("vec_id").as("id_a"), v.as("__va"))
    val b = embs.select(col("vec_id").as("id_b"), v.as("__vb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute), s"LSH invented pairs: ${lsh -- brute}")
  }

  test("duplicate-collapsed text families equal the direct formulations") {
    import spark.implicits._
    // 3 exact copies of every fixture doc plus pathological rows (null,
    // empty, punctuation-only, one-word), themselves duplicated — the
    // within-group eligibility rules must reproduce the direct pipelines'
    // empty/short-doc behavior exactly.
    val base = docs.select(col("doc_id"), col("text"))
    val n = base.count()
    val edge = Seq(
      (900001L, null.asInstanceOf[String]), (900002L, ""), (900003L, "!!! ???"),
      (900004L, "word"), (900011L, null.asInstanceOf[String]), (900012L, ""),
      (900013L, "!!! ???"), (900014L, "word")).toDF("doc_id", "text")
    val dup = base.union(base.withColumn("doc_id", col("doc_id") + lit(n)))
      .union(base.withColumn("doc_id", col("doc_id") + lit(2 * n)))
      .union(edge)

    def pairsOf(d: DataFrame): Set[(Long, Long)] =
      d.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet

    val jDirect = pairsOf(Dedup.jaccardPairsDirect(dup, "doc_id", "text", 3, 0.8, Long.MaxValue))
    val jColl = pairsOf(Dedup.jaccardPairs(dup, "doc_id", "text", 3, 0.8))
    assert(jColl == jDirect,
      s"jaccard missing=${jDirect -- jColl} invented=${jColl -- jDirect}")

    val mDirect = pairsOf(Dedup.minhashLshPairsDirect(dup, "doc_id", "text", 3, 32, 8, 0.8, false))
    val mColl = pairsOf(Dedup.minhashLshPairs(dup, "doc_id", "text", 3, 32, 8, 0.8))
    assert(mColl == mDirect,
      s"minhash missing=${mDirect -- mColl} invented=${mColl -- mDirect}")

    val sDirect = pairsOf(Dedup.simhashPairsDirect(dup, "doc_id", "text", 3, false))
    val sColl = pairsOf(Dedup.simhashPairs(dup, "doc_id", "text", 3))
    assert(sColl == sDirect,
      s"simhash missing=${sDirect -- sColl} invented=${sColl -- sDirect}")
  }

  test("duplicate-collapsed LSH equals the direct formulation on a dup-heavy corpus") {
    // 3 exact copies of every vector (key-offset ids) — the crawl-corpus
    // shape the collapse exists for. Both the pair list and the weighted
    // count must equal a direct no-collapse computation.
    val v = transform(col("embedding"), x => x.cast("double"))
    val n = embs.count()
    val dup = embs.union(embs.withColumn("vec_id", col("vec_id") + lit(n)))
      .union(embs.withColumn("vec_id", col("vec_id") + lit(2 * n)))
    // direct (pre-collapse) formulation, inline: bucket self-join + verify
    val flat = Dedup.hyperplanes().flatten.flatten.toArray
    val bucketed = dup.select(col("vec_id").as("__id"),
      posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
        v, flat, 16, 4, 64)).as(Seq("__t", "__b")))
    val cand = bucketed.select(col("__id").as("id_a"), col("__t"), col("__b"))
      .join(bucketed.select(col("__id").as("id_b"), col("__t"), col("__b")),
        Seq("__t", "__b"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    val va = dup.select(col("vec_id").as("id_a"), v.as("__va"))
    val vb = dup.select(col("vec_id").as("id_b"), v.as("__vb"))
    val directPairs = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    val collapsed = Dedup.embeddingNearDupPairs(dup, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(collapsed == directPairs,
      s"missing=${directPairs -- collapsed} invented=${collapsed -- directPairs}")

    val candList = Dedup.embeddingLshCandidates(dup, "vec_id", "embedding")
      .as[(Long, Long)].collect().toSet
    val directCand = cand.as[(Long, Long)].collect().toSet
    assert(candList == directCand,
      s"cand missing=${directCand -- candList} invented=${candList -- directCand}")

    val weighted = Dedup.embeddingLshCandidatesWeighted(dup, "vec_id", "embedding")
    val wReps = weighted.select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(wReps.length == wReps.toSet.size, "weighted rows must be unique pairs")
    val vwa = dup.select(col("vec_id").as("id_a"), v.as("__va"))
    val vwb = dup.select(col("vec_id").as("id_b"), v.as("__vb"))
    val wCount = weighted.join(vwa, Seq("id_a")).join(vwb, Seq("id_b"))
      .filter(Similarity.cosine(col("__va"), col("__vb")) >= 0.4)
      .agg(sum(col("weight"))).as[Long].head()
    assert(wCount == directPairs.size,
      s"weighted count $wCount != direct ${directPairs.size}")
  }

  test("bruteForceTopK returns k neighbors per query, self excluded, ranked") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val out = Similarity.bruteForceTopK(embs, queries, k = 5)
    val grouped = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(grouped.values.forall(_ == 5))
    assert(out.filter(col("query_id") === col("vec_id")).count() == 0)
    // sims are non-increasing within each query
    val bad = out.withColumn("prev", lag(col("sim"), 1).over(
      org.apache.spark.sql.expressions.Window.partitionBy("query_id").orderBy("rk")))
      .filter(col("prev").isNotNull && col("sim") > col("prev")).count()
    assert(bad == 0)
  }

  test("ivfTopK recall vs exact top-k is reasonable on fixture embeddings") {
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(embs, queries, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embs, queries, 5, nlist = 8, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall too low: $recall") // nprobe/nlist=0.5 scan
  }

  test("langId picks the language with the best stopword overlap") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze mit den"),
      (3L, "le chat et la maison dans les rues"),
      (4L, "los gatos y las casas por la ciudad como")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("g"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es"))
  }

  test("quality features: clean mid-length text scores above noisy text") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on for a while"),
      (2L, "@@@@ ### $$$$$ %%% ^^^^ &&&& **** (((( )))) !!!! ????")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFeatures(df)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
  }

  test("fingerprint is invariant to case/whitespace/punctuation jitter") {
    val df = Seq((1L, "Spark  merge, JOIN!"), (2L, "spark merge join"))
      .toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("multimodal decode keeps ids/kinds and emits fixed-dim features") {
    implicit val s: SparkSession = spark
    val media = Multimodal.ingestFromDocuments(docs)
    val feats = Multimodal.decodeAndFeaturize(media, dim = 16)
    assert(feats.count() == docs.count())
    val bad = feats.filter(size(col("feature")) =!= 16).count()
    assert(bad == 0)
    val kinds = feats.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    // decode is deterministic: same input → same features
    val f1 = Multimodal.decodeAndFeaturize(media, 16)
      .filter(col("media_id") === 1).select("feature").as[Array[Float]].head()
    val f2 = Multimodal.decodeAndFeaturize(media, 16)
      .filter(col("media_id") === 1).select("feature").as[Array[Float]].head()
    assert(f1.sameElements(f2))
  }

  test("image payloads PNG-round-trip: thumbs come from the decoded raster") {
    implicit val s: SparkSession = spark
    // encode→decode round trip off-Spark: real ImageIO parse, exact dims
    val bytes = Multimodal.encodePng(33, 21, seed = 7L)
    assert(bytes.length > 8 &&
      (bytes(1) & 0xFF) == 'P' && (bytes(2) & 0xFF) == 'N' && (bytes(3) & 0xFF) == 'G')
    val img = Multimodal.decodeImage(bytes).get
    assert(img.getWidth == 33 && img.getHeight == 21)
    // undecodable payloads fall back to the stub, not an error
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    // through Spark: every image row's thumb equals decoded-width/8 — the
    // metadata width agrees with the encoded payload by construction, so a
    // decoder that ignored the payload would be caught by a corrupt-width
    // fixture below
    val media = Multimodal.ingestFromDocuments(docs)
    val feats = Multimodal.decodeAndFeaturize(media, dim = 16).toDF()
    val imgRows = media.toDF().filter(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"))
      .join(feats.filter(col("kind") === "image"), Seq("media_id"))
    assert(imgRows.filter(col("thumb_w") =!=
      greatest(lit(1), (col("width") / 8).cast("int"))).count() == 0)
    // decoded dims win over (corrupt) metadata: payload says 33×21
    val lying = spark.createDataset(Seq(
      MediaFile(1L, "image", bytes, width = 999, height = 999, duration_ms = 0L)))
    val f = Multimodal.decodeAndFeaturize(lying, 16).head()
    assert(f.thumb_w == 33 / 8 && f.thumb_h == 21 / 8)
  }

  test("image aHash from real decode matches the pixel formula; banded recall exact") {
    implicit val s: SparkSession = spark
    val dd = spark.range(0, 90).toDF("doc_id")
    val hashes = Multimodal.imageAHash(Multimodal.patternedImages(dd))
    val got = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 30) // doc_id % 3 == 0
    // the hash of the DECODED PNG equals the pure integer formula
    def formulaHash(id: Long): Long = {
      val f = (id % 30).toInt; val pc = ((id / 30) % 64).toInt
      val g = Array.tabulate(64) { c =>
        val base = ((f * 73 + c) * 131) % 256
        if (c == pc) (base + 96) % 256 else base
      }
      val total = g.map(_.toLong).sum
      (0 until 64).foldLeft(0L)((h, c) =>
        if (g(c) * 64L > total) h | (1L << c) else h)
    }
    got.foreach { case (id, hsh) => assert(hsh == formulaHash(id), s"id $id") }
    // banded search returns EXACTLY the brute-force ≤3-bit pair set
    val pairs = Multimodal.aHashNearDupPairs(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ids = got.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      hm = java.lang.Long.bitCount(got(a) ^ got(b)) if hm <= 3
    } yield (a, b, hm)).toSet
    assert(pairs == brute)
    assert(pairs.nonEmpty, "planted families should yield near-dup pairs")
  }

  test("audio aHash from real WAV decode matches the image-pattern formula") {
    implicit val s: SparkSession = spark
    val dd = spark.range(0, 90).toDF("doc_id")
    val hashes = Multimodal.audioAHash(Multimodal.patternedAudio(dd))
    val got = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 30) // doc_id % 3 == 1
    def formulaHash(id: Long): Long = {
      val f = (id % 30).toInt; val pc = ((id / 30) % 64).toInt
      val g = Array.tabulate(64) { c =>
        val base = ((f * 73 + c) * 131) % 256
        if (c == pc) (base + 96) % 256 else base
      }
      val total = g.map(_.toLong).sum
      (0 until 64).foldLeft(0L)((h, c) =>
        if (g(c) * 64L > total) h | (1L << c) else h)
    }
    got.foreach { case (id, hsh) => assert(hsh == formulaHash(id), s"id $id") }
    // the modality-blind band layer pairs audio hashes just the same
    assert(Multimodal.aHashNearDupPairs(hashes, 3).count() > 0)
  }

  test("audio payloads WAV-round-trip: frames come from the decoded stream") {
    implicit val s: SparkSession = spark
    // encode→decode round trip off-Spark: real AudioSystem parse
    val bytes = Multimodal.encodeWav(37, seed = 5L)
    assert(bytes.length > 44 &&
      new String(bytes.take(4), "US-ASCII") == "RIFF")
    val stream = Multimodal.decodeAudio(bytes).get
    assert(stream.getFrameLength == 37L &&
      stream.getFormat.getSampleSizeInBits == 16)
    stream.close()
    // undecodable payloads fall back to the stub, not an error
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    // decoded frame count wins over (corrupt) metadata
    val lying = spark.createDataset(Seq(
      MediaFile(1L, "audio", bytes, width = 0, height = 0,
        duration_ms = 999999L)))
    val f = Multimodal.decodeAndFeaturize(lying, 16).head()
    assert(f.n_frames == 37)
  }

  test("fused hyperplane buckets equal the per-plane sign formulation") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 50).selectExpr("id AS vec_id",
      "transform(sequence(1, 64), i -> sin(cast(id * 131 + i AS DOUBLE))) AS embedding")
    val planes = Dedup.hyperplanes()
    val flat = planes.flatten.flatten.toArray
    val v = transform(col("embedding"), x => x.cast("double"))
    val fused = docs.select(col("vec_id"),
      posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
        v, flat, 16, 4, 64)).as(Seq("t", "b")))
      .as[(Long, Int, Long)].collect().toSet
    val perPlane = docs.select(col("vec_id"),
      explode(array(planes.zipWithIndex.map { case (tbl, ti) =>
        struct(lit(ti).as("t"),
          tbl.zipWithIndex.map { case (p, pi) =>
            when(Similarity.dot(v, lit(p.toArray)) >= 0, 1L << pi).otherwise(0L)
          }.reduce(_ + _).as("b"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t"), col("tb.b"))
      .as[(Long, Int, Long)].collect().toSet
    assert(fused == perPlane)
  }

  test("native codegen'd dot/cosine are bit-identical to the fold versions") {
    val v = transform(col("embedding"), x => x.cast("double"))
    val a = embs.select(col("vec_id").as("id_a"), v.as("va"))
    val b = embs.select(col("vec_id").as("id_b"), v.as("vb"))
    val pairs = a.crossJoin(b).filter(col("id_a") < col("id_b")).limit(500)
    val diff = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("nd"),
      Similarity.foldDot(col("va"), col("vb")).as("fd"),
      Similarity.cosine(col("va"), col("vb")).as("nc"),
      Similarity.foldCosine(col("va"), col("vb")).as("fc"))
      .filter(col("nd") =!= col("fd") || col("nc") =!= col("fc")).count()
    assert(diff == 0, "native expressions must match the fold formulation exactly")
  }

  test("repartitionForDecode bounds rows per partition without an extra job") {
    implicit val s: SparkSession = spark
    val rows = Multimodal.ingestFromDocuments(docs).collect().toSeq
    val local = spark.createDataset(rows) // LocalRelation: planner knows rowCount
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val sized = Multimodal.repartitionForDecode(local, rowsPerPartition = 10)
      Thread.sleep(300) // drain async listener events
      assert(jobs == 0, "sizing the decode partitions must not launch a Spark job")
      val parts = sized.rdd.glom().map(_.length).collect()
      assert(parts.length >= rows.length / 10 - 1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("repartitionForDecode estimates from bytes when row count is unknown") {
    implicit val s: SparkSession = spark
    val media = Multimodal.ingestFromDocuments(docs) // parquet scan: no rowCount stat
    val meanRowBytes = math.max(1L,
      media.queryExecution.optimizedPlan.stats.sizeInBytes.toLong / docs.count())
    val parts = Multimodal
      .repartitionForDecode(media, rowsPerPartition = 10, estimatedRowBytes = meanRowBytes)
      .rdd.getNumPartitions
    assert(parts >= 1 && parts <= docs.count())
  }

  test("redact replaces every PII occurrence, is idempotent, counts match") {
    val df = Seq(
      (1L, "mail a.b@x.io and c@y.org, ip 10.1.2.3, call 555-123-4567"),
      (2L, "clean text, version 1.2 dots 1.2.3 are not ips"),
      (3L, "edge: 999.999.999.999 still redacts (syntactic), 12-34-5678 not a phone")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      Redaction.emailCount(col("text")).as("e"),
      Redaction.ipv4Count(col("text")).as("i"),
      Redaction.phoneCount(col("text")).as("p"),
      Redaction.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "mail [EMAIL] and [EMAIL], ip [IP], call [PHONE]")
    assert(out(2L) == ((0, 0, 0, "clean text, version 1.2 dots 1.2.3 are not ips")))
    assert(out(3L)._2 == 1 && out(3L)._3 == 0)
    // Idempotence: redacting redacted text is a no-op.
    val twice = df.select(Redaction.redact(Redaction.redact(col("text"))).as("r2"),
      Redaction.redact(col("text")).as("r1"))
      .filter(col("r1") =!= col("r2")).count()
    assert(twice == 0)
  }

  test("urlDomains extracts every host, in order, duplicates kept") {
    val df = Seq(
      (1L, "see https://a.example.com/x and http://b.io then https://a.example.com again"),
      (2L, "no urls here")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Redaction.urlDomains(col("text")).as("d"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a.example.com", "b.io", "a.example.com"))
    assert(got(2L) == Seq.empty)
  }

  test("chunk covers the text with the declared overlap; empty docs survive") {
    val text = "x" * 500 // starts 0,180,360 → chunks 240,240,140
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val rows = Chunking.chunk(df, "doc_id", "text", size = 240, stride = 180)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(rows.map(_._1).count(_ == 1L) == 3)
    assert(rows.filter(_._1 == 1L).map(_._3.length) == Seq(240, 240, 140))
    // overlap: chunk k's first (size-stride) chars == chunk k-1's last
    val c = rows.filter(_._1 == 1L).map(_._3)
    assert(c(0).takeRight(60) == c(1).take(60))
    assert(rows.filter(_._1 == 2L) == Seq((2L, 0, ""))) // empty doc → one empty chunk
  }

  test("int8 quantization: codes bounded, dequantize error bounded, top-k recall high") {
    val q = Similarity.quantizeInt8(embs)
    // codes in [-127,127]; scale = max|x|
    val bad = q.select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(bad == 0)
    // per-element dequantization error <= scale/254 + eps (half a step)
    val err = q.join(embs, Seq("vec_id"))
      .select(greatest(zip_with(col("codes"), col("embedding"),
        (c, x) => abs(c * col("scale") / 127.0 - x.cast("double"))).getItem(0),
        lit(0.0)).as("e0"), col("scale"))
    // (element 0 suffices as a smoke bound; full bound checked below via recall)
    assert(err.filter(col("e0") > col("scale") / 254.0 * 1.0001).count() == 0)
    val queries = embs.filter(col("vec_id") % 100 === 0)
    val qt = Similarity.quantizedTopK(embs, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ft = Similarity.bruteForceTopK(embs, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (qt intersect ft).size.toDouble / ft.size
    assert(recall >= 0.8, s"quantized recall@10 too low: $recall")
  }

  test("deterministicShuffle is a permutation: balanced shards, stable across partitionings") {
    val df = docs.select(col("doc_id"))
    val a = graft.curation.Sampling.deterministicShuffle(df, "doc_id", 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Long)].collect().toSet
    val b = graft.curation.Sampling.deterministicShuffle(df.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Long)].collect().toSet
    assert(a == b, "shard assignment must not depend on input partitioning")
    val n = df.count()
    val sizes = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.max - sizes.values.min <= 1, s"round-robin must balance: $sizes")
    // positions within each shard are 0..size-1 (a true permutation)
    sizes.foreach { case (sh, sz) =>
      assert(a.filter(_._2 == sh).map(_._3).toSeq.sorted == (0L until sz).toSeq)
    }
    assert(a.size == n)
  }
}
