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

  /** Per-document DISTINCT shingle keys `(idCol, key)` — the persistable
    * form of a document's n-gram set (key = md5 of the shingle). A table
    * of these rows, clustered by `key`, is the STATE an incremental
    * near-dup ingest maintains: arriving batches join it by key instead
    * of rescanning corpus text. */
  def shingleKeySets(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(shingles(col(textCol), n))).as("__sh"))
      .select(col(idCol), md5(col("__sh")).as("key"))

  /** Ids in `batchKeys` that are near-duplicates of an already-admitted
    * document, decided ENTIRELY from persisted key/size tables — no
    * corpus text is read. A batch doc is flagged when some admitted doc
    * shares enough distinct shingles that Jaccard ≥ num/den, tested with
    * the integer cross-multiplication `inter·den ≥ (nb+no−inter)·num`
    * (no floats — any engine replays the verdict exactly).
    *
    * Inputs: `batchKeys`/`corpusKeys` as (idCol, key) rows,
    * `batchSizes`/`corpusSizes` as (idCol, n_keys). Scale shape: one
    * equi-join on `key` (the persisted table is key-clustered, so a
    * batch's keys prune to their files), one (batch-doc, partner)
    * aggregate bounded by shared-key co-occupancy; at web scale the
    * hot-shingle tail is capped the same way [[jaccardPairsDirect]] caps
    * `maxShingleDf` — kept exact here so the oracle replays verbatim. */
  def nearDupIdsAgainst(batchKeys: DataFrame, corpusKeys: DataFrame,
      batchSizes: DataFrame, corpusSizes: DataFrame, idCol: String,
      num: Long, den: Long): DataFrame = {
    require(num > 0 && den >= num, "threshold must be a rational in (0, 1]")
    val ck = corpusKeys.select(col(idCol).as("__oid"), col("key"))
    val cs = corpusSizes.select(col(idCol).as("__oid"),
      col("n_keys").as("__no"))
    val bs = batchSizes.select(col(idCol), col("n_keys").as("__nb"))
    batchKeys.join(ck, Seq("key"))
      .groupBy(col(idCol), col("__oid"))
      .agg(count(lit(1)).as("__i"))
      .join(bs, Seq(idCol))
      .join(cs, Seq("__oid"))
      .filter(col("__i") * den >= (col("__nb") + col("__no") - col("__i")) * num)
      .select(col(idCol)).distinct()
  }

  /** Exact dedup: keep the lowest id per normalized-content fingerprint.
    * One hash aggregate — the cheapest possible dedup at any scale. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-content collapse shared by the near-dup pair families: one
    * row per distinct text (rep = min id), plus the (key, member-id) map.
    * Web-scale corpora are duplicate-heavy (often most of the corpus);
    * running candidate generation on k copies multiplies every candidate
    * bucket by k and the in-bucket self-join by k² — for zero information,
    * since identical texts shingle/hash/band identically. Pipelines run on
    * the unique texts and member pairs are expanded afterwards in
    * output-sized equi-joins. The md5 key is 128-bit over the exact text
    * (plus a null flag), so grouping is content-exact. */
  private def contentGroups(df: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val keyed = df.select(col(idCol).as("__id"), col(textCol).as("__text"),
      concat(md5(coalesce(col(textCol), lit(""))),
        when(col(textCol).isNull, lit("N")).otherwise(lit("V"))).as("__k"))
    val groups = keyed.groupBy(col("__k")).agg(min(col("__id")).as("__rid"),
      first(col("__text")).as("__text"), count(lit(1)).as("__n"))
    (groups, keyed.select(col("__k"), col("__id")))
  }

  /** Expand rep-level pairs to member-level pairs (all members of A ×
    * all members of B; score columns are copied — identical texts have
    * identical scores), and add within-group pairs for `eligibleGroups`
    * (keys whose texts the direct formulation would have paired with
    * themselves) with the given self-score columns. */
  private def expandMemberPairs(repPairs: DataFrame, groups: DataFrame,
      members: DataFrame, scoreCols: Seq[String],
      eligibleGroups: DataFrame, selfScores: Seq[Column]): DataFrame = {
    val repKey = groups.select(col("__rid"), col("__k"))
    val cross = repPairs
      .join(repKey.select(col("__rid").as("id_a"), col("__k").as("__ka")), Seq("id_a"))
      .join(repKey.select(col("__rid").as("id_b"), col("__k").as("__kb")), Seq("id_b"))
      .join(members.select(col("__k").as("__ka"), col("__id").as("__ma")), Seq("__ka"))
      .join(members.select(col("__k").as("__kb"), col("__id").as("__mb")), Seq("__kb"))
      .select(least(col("__ma"), col("__mb")).as("id_a") +:
        greatest(col("__ma"), col("__mb")).as("id_b") +: scoreCols.map(col): _*)
    val m = members.join(eligibleGroups.select(col("__k")), Seq("__k"))
    val same = m.select(col("__k"), col("__id").as("id_a"))
      .join(m.select(col("__k"), col("__id").as("id_b")), Seq("__k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a") +: col("id_b") +:
        selfScores.zip(scoreCols).map { case (c, nm) => c.as(nm) }: _*)
    cross.unionByName(same)
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
    // Approximate mode's df cap is defined over the whole corpus (copies
    // included), so only the exact mode collapses duplicates.
    if (maxShingleDf != Long.MaxValue)
      return jaccardPairsDirect(df, idCol, textCol, n, threshold, maxShingleDf)
    val (groups, members) = contentGroups(df, idCol, textCol)
    val uniq = groups.select(col("__rid").as(idCol), col("__text").as(textCol))
    val repPairs = jaccardPairsDirect(uniq, idCol, textCol, n, threshold, maxShingleDf)
    // a text pairs with its own copies iff it shingles at all (same kernel
    // as the direct path, so empty/short-doc semantics match exactly);
    // identical sets have Jaccard exactly 1.0
    val eligible = groups.filter(col("__n") > 1)
      .filter(size(shingles(col("__text"), n)) > 0)
    expandMemberPairs(repPairs, groups, members, Seq("jaccard"),
      eligible, Seq(lit(1.0)))
  }

  /** Near-dup clusters as (id, component) per document, component = the
    * smallest doc id transitively reachable through n-gram-Jaccard ≥
    * `threshold` (including exact copies).
    *
    * Equivalent to `Clustering.connectedComponents(jaccardPairs(...))`
    * but NEVER materializes member-level pairs: a group of k exact copies
    * contributes k(k−1)/2 pairs to the expanded list (a 100-copy crawl
    * text → 4 950 edges saying nothing beyond "same content"), which made
    * the expanded graph quadratic in the duplication factor. Components
    * are computed on the UNIQUE-content graph (one node per distinct
    * text, rep = smallest member id), then members attach to their rep's
    * component in output-sized equi-joins. The ids agree exactly: the
    * smallest member of a component is the smallest rep, because each rep
    * IS its group's minimum. */
  def nearDupComponents(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val (groups, members) = contentGroups(df, idCol, textCol)
    val uniq = groups.select(col("__rid").as(idCol), col("__text").as(textCol))
    val repPairs = jaccardPairsDirect(uniq, idCol, textCol, n, threshold,
      Long.MaxValue).select(col("id_a"), col("id_b"))
    val repComp = Clustering.connectedComponents(repPairs, "id_a", "id_b")
      .select(col("id").as("__rid"), col("component"))
    // Multi-copy groups whose text shingles cluster with (at least) their
    // own copies even when no other text is near — same eligibility rule
    // as jaccardPairs' self-pairs, so the node set matches exactly.
    val selfOnly = groups.filter(col("__n") > 1)
      .filter(size(shingles(col("__text"), n)) > 0)
      .select(col("__rid"))
      .join(repComp.select(col("__rid")), Seq("__rid"), "left_anti")
      .select(col("__rid"), col("__rid").as("component"))
    val allComp = repComp.unionByName(selfOnly)
    members.join(groups.select(col("__k"), col("__rid")), Seq("__k"))
      .join(allComp, Seq("__rid"))
      .select(col("__id").as(idCol), col("component"))
  }

  /** Member-level Jaccard pairs AND per-doc components from ONE candidate
    * pass. `jaccardPairs` and `nearDupComponents` share their entire
    * expensive machinery (content collapse → prefix-filtered candidate
    * self-join → exact verify on the unique texts); a consumer needing
    * both — the leakage-safe split plus its no-straddle audit (q189) —
    * previously ran that machinery once per call. Here the rep-level
    * verified pair set is computed once and localCheckpoint'ed (it is
    * output-sized: verified near-dup pairs of UNIQUE texts, tiny next to
    * the corpus — nothing corpus-sized is ever pinned), then expanded to
    * member pairs and closed into components. Returns exactly
    * (`jaccardPairs(df,...)`, `nearDupComponents(df,...)`). */
  def jaccardPairsAndComponents(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): (DataFrame, DataFrame) = {
    val (groups, members) = contentGroups(df, idCol, textCol)
    val uniq = groups.select(col("__rid").as(idCol), col("__text").as(textCol))
    val repPairs = jaccardPairsDirect(uniq, idCol, textCol, n, threshold,
      Long.MaxValue).localCheckpoint()
    val eligible = groups.filter(col("__n") > 1)
      .filter(size(shingles(col("__text"), n)) > 0)
    val pairs = expandMemberPairs(repPairs, groups, members, Seq("jaccard"),
      eligible, Seq(lit(1.0)))
    val repComp = Clustering.connectedComponents(
        repPairs.select(col("id_a"), col("id_b")), "id_a", "id_b")
      .select(col("id").as("__rid"), col("component"))
    val selfOnly = eligible.select(col("__rid"))
      .join(repComp.select(col("__rid")), Seq("__rid"), "left_anti")
      .select(col("__rid"), col("__rid").as("component"))
    val allComp = repComp.unionByName(selfOnly)
    val comp = members.join(groups.select(col("__k"), col("__rid")), Seq("__k"))
      .join(allComp, Seq("__rid"))
      .select(col("__id").as(idCol), col("component"))
    (pairs, comp)
  }

  private[ext] def jaccardPairsDirect(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Long): DataFrame = {
    // Persist-free by design: the tokenize+shingle projection is narrow
    // and stateless, so each consumer (document frequencies, prefix
    // selection, exact verify) recomputes it instead of pinning postings
    // in the block manager. At 100 TB the postings are ~3× the corpus —
    // caching them means eviction churn and spill; recomputing is an
    // embarrassingly parallel map that AQE/exchange-reuse already
    // deduplicates where plans share a shuffle. It also keeps the API
    // leak-free: no hidden cached blocks survive the call.
    // Postings carry the per-doc set size from the shingle array itself
    // (docSets computes it per row BEFORE the explode), so the exact path
    // needs no per-document count window — one less sort of the posting
    // list (opt guide §1.2). Only the df-capped approximate path, where
    // filtering invalidates the carried size, recounts with a window.
    val post = docSets(df, idCol, textCol, n)
      .select(col("__id"), col("__sz"), explode(col("__set")).as("__sh"))
    val byDoc = Window.partitionBy(col("__id"))
    val filtered =
      if (maxShingleDf == Long.MaxValue) post.withColumnRenamed("__sz", "__psz")
      else {
        val hot = post.groupBy(col("__sh")).count()
          .filter(col("count") > maxShingleDf).select(col("__sh"))
        post.join(hot, Seq("__sh"), "left_anti")
          .drop("__sz")
          .withColumn("__psz", count(lit(1)).over(byDoc))
      }
    // Document frequency via a window over __sh instead of a groupBy +
    // join-back: one pass over the postings feeds straight into the
    // per-document window (shuffle __sh → shuffle __id), so the posting
    // projection has a single consumer chain and nothing needs caching.
    val prefix = filtered
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__sh"))))
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
  private[ext] def md5Key28(sh: Column): Column = md5Key28FromHex(md5(sh))

  /** The nibble-parse half of [[md5Key28]], over an ALREADY-COMPUTED md5
    * hex string. Callers inside higher-order-function lambdas (which run
    * INTERPRETED — no codegen common-subexpression elimination) must hash
    * once and parse from hex, or each of the 7 nibble terms re-evaluates
    * the md5: a measured 7× kernel cost on the per-token scoring paths
    * (Dsir/QualityModel). Codegen'd projection paths are indifferent —
    * CSE already dedups the hash there. */
  private[ext] def md5Key28FromHex(hx: Column): Column =
    (0 until 7).map { k =>
      val a = ascii(substring(hx, k + 1, 1))
      (when(a >= 97, a - 87).otherwise(a - 48)).cast("long") * (1L << (4 * k))
    }.reduce(_ + _)

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
    val (groups, members) = contentGroups(df, idCol, textCol)
    val uniq = groups.select(col("__rid").as(idCol), col("__text").as(textCol))
    val repPairs =
      minhashLshPairsDirect(uniq, idCol, textCol, n, numHashes, bands, threshold, portable)
    // identical texts share all bands (always candidates) and verify at
    // Jaccard exactly 1.0 — provided they shingle at all (a doc with no
    // postings gets no signature in the direct path)
    val eligible = groups.filter(col("__n") > 1)
      .filter(size(shingles(col("__text"), n)) > 0)
    expandMemberPairs(repPairs, groups, members, Seq("jaccard"),
      eligible, Seq(lit(1.0)))
  }

  private[ext] def minhashLshPairsDirect(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int,
      threshold: Double, portable: Boolean): DataFrame = {
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
    val (groups, members) = contentGroups(df, idCol, textCol)
    val uniq = groups.select(col("__rid").as(idCol), col("__text").as(textCol))
    val repPairs = simhashPairsDirect(uniq, idCol, textCol, maxHamming, portable)
    // identical texts have identical signatures (Hamming 0); a doc gets a
    // signature in the direct path iff it has at least one token
    val eligible = groups.filter(col("__n") > 1)
      .filter(size(TextAnalysis.tokens(col("__text"))) > 0)
    expandMemberPairs(repPairs, groups, members, Seq("hamming"),
      eligible, Seq(lit(0L)))
  }

  private[ext] def simhashPairsDirect(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, portable: Boolean): DataFrame = {
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

  /** Exact-content grouping key for a double vector. `concat_ws` silently
    * SKIPS null elements, so [1.0,null,2.0], [1.0,2.0,null] and [1.0,2.0]
    * would all collide into one group — nulls are rendered explicitly
    * ("N") so only truly identical vectors share a key. */
  private def vecKey(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(concat_ws(",",
      transform(v, x => coalesce(x.cast("string"), lit("N")))))

  /** Hyperplane-LSH candidate pairs (no verify): ids sharing a sign-bucket
    * in at least one of the `tables` hash tables. All `tables ×
    * planesPerTable` sign tests run in ONE codegen'd array pass
    * ([[graft.functions.VectorFunctions.hyperplaneBuckets]]); buckets
    * carry only (id, table, bucket-int) — the `dim`-sized vectors never
    * enter the candidate shuffle. */
  def embeddingLshCandidates(df: DataFrame, idCol: String, vecCol: String,
      tables: Int = 16, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    // Same exact-duplicate collapse as [[embeddingNearDupPairs]]: identical
    // vectors land in identical buckets, so candidacy among k copies is
    // total and cross-content candidacy is decided by one representative.
    // Bucket self-join + distinct run on unique vectors; member pairs are
    // expanded afterwards in output-sized equi-joins. The returned pair
    // set is identical to the uncollapsed formulation — without the k² ×
    // 16-table blowup inside the candidate shuffle when the corpus is
    // duplicate-heavy.
    val flat = hyperplanes(tables, planesPerTable, dim).flatten.flatten.toArray
    val v = transform(col(vecCol), x => x.cast("double"))
    val keyed = df.select(col(idCol).as("__id"), v.as("__v"), vecKey(v).as("__k"))
    val reps = keyed.groupBy(col("__k")).agg(first(col("__v")).as("__v"))
    val bucketed = reps.select(col("__k"),
      posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
        col("__v"), flat, tables, planesPerTable, dim)).as(Seq("__t", "__b")))
    val l = bucketed.select(col("__k").as("__ka"), col("__t"), col("__b"))
    val r = bucketed.select(col("__k").as("__kb"), col("__t"), col("__b"))
    val repCand = l.join(r, Seq("__t", "__b")).filter(col("__ka") < col("__kb"))
      .select(col("__ka"), col("__kb")).distinct()
    val members = keyed.select(col("__k"), col("__id"))
    val cross = repCand
      .join(members.select(col("__k").as("__ka"), col("__id").as("__ma")), Seq("__ka"))
      .join(members.select(col("__k").as("__kb"), col("__id").as("__mb")), Seq("__kb"))
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"))
    // Within-group pairs only for groups that actually bucket: a vector
    // that produces no LSH buckets (null/empty) generated no candidacy in
    // the direct formulation, so its exact copies must not pair either.
    val same = members.select(col("__k"), col("__id").as("id_a"))
      .join(members.select(col("__k"), col("__id").as("id_b")), Seq("__k"))
      .filter(col("id_a") < col("id_b"))
      .join(bucketed.select(col("__k")).distinct(), Seq("__k"), "left_semi")
      .select(col("id_a"), col("id_b"))
    cross.unionByName(same)
  }

  /** Duplicate-collapsed candidate pairs with multiplicities, for
    * aggregate consumers (counts, stats) that never need the member-level
    * pair list: each row is a pair of group REPRESENTATIVES (min id per
    * exact-content group) with `weight` = how many member pairs it stands
    * for — nA×nB across groups, k(k-1)/2 within a group (emitted as
    * id_a = id_b). Verifying cosine on reps and summing weights gives
    * exactly the count the expanded formulation would — identical vectors
    * have identical cosines, so re-verifying each of the k² copies of a
    * pair is pure waste. On duplicate-heavy corpora this keeps the whole
    * plan at unique-content size; [[embeddingLshCandidates]] (the full
    * pair list) is inherently output-quadratic in group size instead. */
  def embeddingLshCandidatesWeighted(df: DataFrame, idCol: String,
      vecCol: String, tables: Int = 16, planesPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    val flat = hyperplanes(tables, planesPerTable, dim).flatten.flatten.toArray
    val v = transform(col(vecCol), x => x.cast("double"))
    val keyed = df.select(col(idCol).as("__id"), v.as("__v"), vecKey(v).as("__k"))
    val groups = keyed.groupBy(col("__k"))
      .agg(min(col("__id")).as("__rid"), first(col("__v")).as("__v"),
        count(lit(1)).as("__n"))
    val bucketed = groups.select(col("__rid"), col("__n"),
      posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
        col("__v"), flat, tables, planesPerTable, dim)).as(Seq("__t", "__b")))
    val l = bucketed.select(col("__rid").as("id_a"), col("__n").as("__na"),
      col("__t"), col("__b"))
    val r = bucketed.select(col("__rid").as("id_b"), col("__n").as("__nb"),
      col("__t"), col("__b"))
    val cross = l.join(r, Seq("__t", "__b")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), (col("__na") * col("__nb")).as("weight"))
      .distinct()
    // No-bucket groups (null/empty vectors) never candidate in the direct
    // formulation — their copies must not self-pair here either.
    val same = groups.filter(col("__n") > 1)
      .join(bucketed.select(col("__rid")).distinct(), Seq("__rid"), "left_semi")
      .select(col("__rid").as("id_a"), col("__rid").as("id_b"),
        ((col("__n") * (col("__n") - 1)) / 2).cast("long").as("weight"))
    cross.unionByName(same)
  }

  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, planesPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    // Exact-duplicate vectors are collapsed to one representative BEFORE
    // LSH. Identical vectors land in identical buckets, so without the
    // collapse every group of k copies multiplies each of its buckets'
    // membership by k and the within-bucket candidate join by k² — on a
    // corpus that is 90% exact dups (common in web-scale crawls) that is
    // a ~100× blowup of the candidate shuffle for zero information. With
    // it, candidate generation + cosine verify run on unique vectors only,
    // and member pairs are expanded afterwards by two output-sized
    // equi-joins (the pair list itself is inherently quadratic in group
    // size; the expansion is, too, but nothing else is).
    // Grouping key: md5 over the exact decimal rendering of the doubles —
    // content-exact, 128-bit (no birthday risk at engine scale).
    val v = transform(col(vecCol), x => x.cast("double"))
    val keyed = df.select(col(idCol).as("__id"), v.as("__v"), vecKey(v).as("__k"))
    val reps = keyed.groupBy(col("__k"))
      .agg(min(col("__id")).as("__rid"), first(col("__v")).as("__v"))

    // representative-level LSH: same plan shape as before the collapse
    val flat = hyperplanes(tables, planesPerTable, dim).flatten.flatten.toArray
    val bucketed = reps.select(col("__rid"), col("__k"),
      posexplode(graft.functions.VectorFunctions.hyperplaneBuckets(
        col("__v"), flat, tables, planesPerTable, dim)).as(Seq("__t", "__b")))
    val l = bucketed.select(col("__rid").as("__ra"), col("__t"), col("__b"))
    val r = bucketed.select(col("__rid").as("__rb"), col("__t"), col("__b"))
    val cand = l.join(r, Seq("__t", "__b")).filter(col("__ra") < col("__rb"))
      .select(col("__ra"), col("__rb")).distinct()
    val va = reps.select(col("__rid").as("__ra"), col("__k").as("__ka"), col("__v").as("__va"))
    val vb = reps.select(col("__rid").as("__rb"), col("__k").as("__kb"), col("__v").as("__vb"))
    val repPairs = cand.join(va, Seq("__ra")).join(vb, Seq("__rb"))
      .select(col("__ka"), col("__kb"),
        Similarity.cosine(col("__va"), col("__vb")).as("cosine"))
      .filter(col("cosine") >= threshold)

    // cross-group expansion: every member of A × every member of B
    val members = keyed.select(col("__k"), col("__id"))
    val cross = repPairs
      .join(members.select(col("__k").as("__ka"), col("__id").as("__ma")), Seq("__ka"))
      .join(members.select(col("__k").as("__kb"), col("__id").as("__mb")), Seq("__kb"))
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"), col("cosine"))

    // within-group pairs: identical vectors always share all buckets, so
    // the pre-collapse formulation always surfaced them; cosine(v,v) is
    // computed (not assumed 1.0) so zero-norm vectors still drop out
    val ga = keyed.select(col("__k"), col("__id").as("id_a"), col("__v"))
    val gb = keyed.select(col("__k"), col("__id").as("id_b"))
    val same = ga.join(gb, Seq("__k")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("__v"), col("__v")).as("cosine"))
      .filter(col("cosine") >= threshold)

    cross.unionByName(same)
  }
}
