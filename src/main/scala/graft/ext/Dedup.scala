package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB contract):
  *  - Nothing here ever builds an O(N²) plan. Candidate generation is
  *    always an equi-join on a short key (shingle, LSH band bucket, SimHash
  *    chunk, hyperplane bucket), i.e. one hash shuffle; only in-bucket
  *    pairs are verified exactly.
  *  - Hot keys are the skew hazard: [[jaccardPairs]] takes `maxShingleDf`
  *    to drop stop-shingles whose buckets would explode (the standard
  *    suffix-filtering trick); AQE skew-join splitting covers the rest.
  *  - All similarity arithmetic is exact-integer counts or deterministic
  *    double division, so results are reproducible across engines.
  */
object Dedup {

  /** Distinct word n-gram shingles of the normalized token stream.
    * Tail-truncating window exactly like the oracle's list slicing, so
    * documents shorter than `n` still produce one (short) shingle.
    * Implemented as a one-pass codegen'd kernel: the composed
    * `transform(sequence…, slice…)` form re-evaluated the tokenizer once
    * per shingle position (HOF lambdas get no subexpression elimination) —
    * O(tokens²) per document and the dominant cost of the whole dedup
    * family ([[org.apache.spark.sql.graft.TextKernels]]). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextBridge.shingleArray(text, n)

  /** Exact dedup: keep the lowest id per normalized-content fingerprint.
    * One hash aggregate — the cheapest possible dedup at any scale. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-doc shingle set + size, computed NARROWLY per row — `shingles`
    * already returns the distinct array, so no explode/groupBy shuffle is
    * ever needed to reconstitute a document's set. Keeping this narrow is
    * what lets the dedup pipelines run persist-free: re-deriving a set
    * from the parquet row is a stateless projection, so consumers simply
    * recompute it instead of pinning postings in the block manager (which
    * at 100 TB means cache churn, eviction storms, and a leak hazard for
    * long-lived sessions). */
  private def docSets(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("__id"), shingles(col(textCol), n).as("__set"))
      .withColumn("__sz", size(col("__set")).cast("long"))

  /** (id, shingle) posting list, distinct (narrow explode of [[docSets]]). */
  private def postings(df: DataFrame, idCol: String, textCol: String, n: Int) =
    docSets(df, idCol, textCol, n)
      .select(col("__id"), explode(col("__set")).as("__sh"))

  /** Per-doc shingle set + size from a (possibly filtered) posting list —
    * only needed when postings were externally filtered (maxShingleDf), so
    * the per-row array would over-count; one aggregate otherwise avoided. */
  private def shingleSets(post: DataFrame) =
    post.groupBy(col("__id"))
      .agg(collect_set(col("__sh")).as("__set"), count(lit(1)).as("__sz"))

  /** Exact Jaccard verdict for candidate (id_a, id_b) pairs: join each side's
    * full shingle set once per UNIQUE candidate and intersect the arrays.
    * Candidates are a tiny fraction of the corpus, so this is the cheap leg. */
  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(sets.select(col("__id").as("id_a"), col("__set").as("__seta"),
        col("__sz").as("__sza")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__set").as("__setb"),
        col("__sz").as("__szb")), "id_b")
      .withColumn("__inter", size(array_intersect(col("__seta"), col("__setb")))
        .cast("long"))
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("__sza") + col("__szb") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** All pairs with n-gram Jaccard ≥ `threshold`, via exactness-preserving
    * prefix filtering (Chaudhuri et al. SSJoin / Xiao et al. PPJoin).
    *
    * Order every document's shingles by global document frequency (rarest
    * first, ties by shingle text — a total order shared by all docs). Any
    * pair with J(A,B) ≥ t must share a shingle within each side's first
    * ⌈(1−t)·|set|⌉+1 shingles, so the candidate self-join runs ONLY on
    * those prefixes: stop-shingles ("of the and"…) have high df, land at
    * the back of every prefix order, and never enter the join — the hot
    * bucket that made the naive shingle join quadratic is gone while the
    * result stays exactly equal. Candidates are then verified exactly
    * against the full shingle sets.
    *
    * `maxShingleDf` additionally drops shingles with document frequency
    * above the cap before anything else (approximate mode; kept for
    * pipelines that want a hard skew ceiling on adversarial corpora). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    // Persist-free by design: the tokenize+shingle projection is narrow
    // and stateless, so each consumer (document frequencies, prefix
    // selection, exact verify) recomputes it instead of pinning postings
    // in the block manager. At 100 TB the postings are ~3× the corpus —
    // caching them means eviction churn and spill; recomputing is an
    // embarrassingly parallel map that AQE/exchange-reuse already
    // deduplicates where plans share a shuffle. It also keeps the API
    // leak-free: no hidden cached blocks survive the call.
    val post = postings(df, idCol, textCol, n)
    val filtered =
      if (maxShingleDf == Long.MaxValue) post
      else {
        val hot = post.groupBy(col("__sh")).count()
          .filter(col("count") > maxShingleDf).select(col("__sh"))
        post.join(hot, Seq("__sh"), "left_anti")
      }
    // Document frequency via a window over __sh instead of a groupBy +
    // join-back: one pass over the postings feeds straight into the
    // per-document windows (shuffle __sh → shuffle __id), so the posting
    // projection has a single consumer chain and nothing needs caching.
    val byDoc = Window.partitionBy(col("__id"))
    val prefix = filtered
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__sh"))))
      .withColumn("__psz", count(lit(1)).over(byDoc))
      .withColumn("__rn", row_number().over(
        byDoc.orderBy(col("__df"), col("__sh"))))
      .filter(col("__rn") <=
        ceil((lit(1.0) - lit(threshold)) * col("__psz")) + lit(1))
    val pa = prefix.select(col("__id").as("id_a"), col("__sh"))
    val pb = prefix.select(col("__id").as("id_b"), col("__sh"))
    val cand = pa.join(pb, Seq("__sh")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val sets =
      if (maxShingleDf == Long.MaxValue) docSets(df, idCol, textCol, n)
      else shingleSets(filtered)
    verifyJaccard(cand, sets, threshold)
  }

  /** Modulus of the portable affine MinHash family (prime < 2^30, so
    * `a·x + b` stays far from 64-bit overflow in any engine). */
  val MinhashPrime: Long = 1073741789L

  /** Seeded (a, b) pairs of the portable affine family h_i(x) = (a_i·x +
    * b_i) mod p — shared with oracle SQL generation. */
  def minhashAffineConsts(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(1234)
    Seq.fill(numHashes)((1L + rnd.nextInt((MinhashPrime - 1).toInt).toLong,
      rnd.nextInt(MinhashPrime.toInt).toLong))
  }

  /** 28-bit shingle key from the first 7 hex nibbles of md5(shingle) —
    * computable identically in any engine with md5/ascii/substr. */
  private def md5Key28(sh: Column): Column = {
    val hx = md5(sh)
    (0 until 7).map { k =>
      val a = ascii(substring(hx, k + 1, 1))
      (when(a >= 97, a - 87).otherwise(a - 48)).cast("long") * (1L << (4 * k))
    }.reduce(_ + _)
  }

  /** MinHash signatures over a posting list: for each of `numHashes` seeded
    * hash functions, the minimum hash over the document's shingle set.
    * `portable = true` uses ONE md5 per shingle (a 28-bit key) and derives
    * the `numHashes` values with seeded affine maps mod a prime —
    * bit-identical across engines, so results can be oracle-checked in any
    * SQL engine with md5, at ~1/numHashes of the all-md5 hashing cost. */
  private def signaturesFromPostings(post: DataFrame, numHashes: Int,
      portable: Boolean): DataFrame = {
    val keyed =
      if (portable) post.withColumn("__x", md5Key28(col("__sh")))
      else post
    val consts = minhashAffineConsts(numHashes)
    val mins = (0 until numHashes).map { i =>
      val h: Column =
        if (portable) {
          val (a, b) = consts(i)
          (lit(a) * col("__x") + lit(b)) % MinhashPrime
        } else hash(col("__sh"), lit(i)).cast("long")
      min(h).as(s"__h$i")
    }
    keyed.groupBy(col("__id")).agg(mins.head, mins.tail: _*)
      .select(col("__id"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("__sig"))
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the minimum hash over the document's shingle set. One aggregate. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, portable: Boolean = false): DataFrame =
    signaturesFromPostings(postings(df, idCol, textCol, n), numHashes, portable)

  /** MinHash+LSH near-dup pairs: signatures → `bands` band buckets →
    * equi-join on (band, band hash) → candidates → exact Jaccard verify.
    * Approximate-recall candidate generation, exact final verdict. The
    * verify intersects the two full shingle sets per unique candidate pair
    * directly (no second pair self-join, no posting-list recompute). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    // Persist-free (see jaccardPairs): signatures and the exact verify
    // each re-derive shingles narrowly; nothing is pinned in the cache.
    val post = postings(df, idCol, textCol, n)
    val sig = signaturesFromPostings(post, numHashes, portable)
    val bandHash: Column => Column =
      if (portable) sl => md5(concat_ws(",", transform(sl, x => x.cast("string"))))
      else sl => hash(sl).cast("string")
    val banded = sig.select(col("__id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        j => struct(j.as("band"),
          bandHash(slice(col("__sig"), j * lit(rows) + 1, lit(rows))).as("bh")))).as("b"))
      .select(col("__id"), col("b.band").as("__band"), col("b.bh").as("__bh"))
    val l = banded.select(col("__id").as("id_a"), col("__band"), col("__bh"))
    val r = banded.select(col("__id").as("id_b"), col("__band"), col("__bh"))
    val cand = l.join(r, Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    verifyJaccard(cand, docSets(df, idCol, textCol, n), threshold)
  }

  /** Number of signature bits: 64 with the native xxhash64 token hash,
    * 60 in portable mode (15 md5 hex nibbles — keeps the signature
    * positive so `>>` behaves identically across engines). */
  private def simhashBits(portable: Boolean) = if (portable) 60 else 64

  /** SimHash over token hashes: per bit, sign of Σ(±1) across the
    * document's tokens. Implemented as one conditional sum per bit in ONE
    * hash aggregate (map-side combinable — no per-doc state on the driver).
    * `portable = true` derives token-hash bits from md5 hex nibbles
    * (decoded with `ascii`), reproducible in any SQL engine with md5. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame = {
    val bits = simhashBits(portable)
    val tok = df.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(col(textCol))).as("__t"))
    val (hashed, bitOf): (DataFrame, Int => Column) =
      if (portable) {
        // nibble k = value of hex digit k of md5(token); bit b lives in
        // nibble b/4 at position b%4
        val withHex = tok.withColumn("__hx", md5(col("__t")))
        val nibs = (0 until 15).map { k =>
          val a = ascii(substring(col("__hx"), k + 1, 1))
          when(a >= 97, a - 87).otherwise(a - 48).as(s"__n$k")
        }
        (withHex.select(col("__id") +: nibs: _*),
          b => shiftright(col(s"__n${b / 4}"), b % 4).bitwiseAND(1))
      } else {
        (tok.withColumn("__h", xxhash64(col("__t"))),
          b => shiftrightunsigned(col("__h"), b).bitwiseAND(1))
      }
    val bitSums = (0 until bits).map { b =>
      sum(when(bitOf(b) === 1, 1).otherwise(-1)).as(s"__b$b")
    }
    val agg = hashed.groupBy(col("__id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"__b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("__id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, found by
    * banding the signature into four chunks (pigeonhole: any pair within
    * Hamming ≤ 3 shares at least one exact chunk; for larger budgets
    * recall is approximate) and verifying with `bit_count(a^b)`. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, portable: Boolean = false): DataFrame = {
    val chunkBits = simhashBits(portable) / 4
    val mask = (1L << chunkBits) - 1
    val sig = simhash(df, idCol, textCol, portable)
    val chunked = sig.select(col("__id"), col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("c"),
          shiftrightunsigned(col("simhash"), j * chunkBits).bitwiseAND(mask).as("v"))): _*))
        .as("ch"))
      .select(col("__id"), col("simhash"), col("ch.c").as("__c"), col("ch.v").as("__v"))
    val l = chunked.select(col("__id").as("id_a"), col("simhash").as("__sa"),
      col("__c"), col("__v"))
    val r = chunked.select(col("__id").as("id_b"), col("simhash").as("__sb"),
      col("__c"), col("__v"))
    l.join(r, Seq("__c", "__v")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs with cosine ≥ `threshold`, exact O(N²/buckets)
    * via random-hyperplane LSH candidate generation + exact verify.
    * `tables × planesPerTable` sign-bit buckets; a 0.5-cosine pair collides
    * in ≥1 of 16 four-plane tables w.p. ≈0.99. Hyperplanes are generated
    * from a fixed seed so runs are reproducible. */
  /** The fixed seeded hyperplane family used by [[embeddingNearDupPairs]].
    * Components are rounded to 6 decimals so they can be embedded as SQL
    * literals that parse to bit-identical doubles in any engine (an
    * oracle replicating the bucketing needs the exact same planes). */
  def hyperplanes(tables: Int = 16, planesPerTable: Int = 4,
      dim: Int = 64): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(tables)(Seq.fill(planesPerTable)(Seq.fill(dim)(
      math.rint(rnd.nextGaussian() * 1e6) / 1e6)))
  }

  /** Hyperplane-LSH candidate pairs (no verify): ids sharing a sign-bucket
    * in at least one of the `tables` hash tables. All `tables ×
    * planesPerTable` sign tests run in ONE codegen'd array pass
    * ([[graft.functions.VectorFunctions.hyperplaneBuckets]]); buckets
    * carry only (id, table, bucket-int) — the `dim`-sized vectors never
    * enter the candidate shuffle. */
  def embeddingLshCandidates(df: DataFrame, idCol: String, vecCol: String,
      tables: Int = 16, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val flat = hyperplanes(tables, planesPerTable, dim).flatten.flatten.toArray
    val v = transform(col(vecCol), x => x.cast("double"))
    val bucketed = df.select(col(idCol).as("__id"),
      posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
        v, flat, tables, planesPerTable, dim)).as(Seq("__t", "__b")))
    val l = bucketed.select(col("__id").as("id_a"), col("__t"), col("__b"))
    val r = bucketed.select(col("__id").as("id_b"), col("__t"), col("__b"))
    l.join(r, Seq("__t", "__b")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, planesPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val cand = embeddingLshCandidates(df, idCol, vecCol, tables, planesPerTable, dim)
    val va = df.select(col(idCol).as("id_a"), v.as("__va"))
    val vb = df.select(col(idCol).as("id_b"), v.as("__vb"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("__va"), col("__vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
