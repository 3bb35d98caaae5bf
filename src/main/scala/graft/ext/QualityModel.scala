package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText-shaped scoring
  * pass of a curation pipeline (hash each token into a fixed weight
  * table, sum the weights, threshold), with every step integer-exact so
  * any engine reproduces the same scores bit-for-bit.
  *
  * A real deployment would load trained weights; here the weight table is
  * a fixed affine map over the bucket index (a stand-in a test oracle can
  * replay), but the SHAPE is the production one: token → 28-bit md5 hash
  * → bucket (mod [[Buckets]]) → weight lookup → per-document sum. The
  * whole thing is a codegen'd projection over the token array
  * (`aggregate(transform(...))`) — no explode, no join, no shuffle of the
  * corpus; scoring 100 TB is one scan. Swapping in trained weights means
  * replacing the affine map with an `element_at` over a broadcast literal
  * array — same plan shape.
  *
  * All arithmetic stays far below 2^53: hash < 2^28, bucket < 2^10,
  * `WeightA·bucket + WeightC` < 2^51, weights in ±2046, so a document
  * would need ~2^41 tokens to overflow the long sum. */
object QualityModel {

  val Buckets = 1024L
  val WeightA = 1103515245L
  val WeightC = 12345L
  val WeightMod = 4093L

  /** Signed integer weight of one token: bucket = md5₂₈(token) mod 1024,
    * weight = ((A·bucket + C) mod 4093) − 2046 ∈ [−2046, 2046]. */
  def tokenWeight(t: Column): Column = {
    val b = Dedup.md5Key28(t) % Buckets
    (b * WeightA + WeightC) % WeightMod - (WeightMod - 1) / 2
  }

  /** Integer document score: Σ tokenWeight over the normalized word
    * tokens of `text` (null text scores 0, same as empty). Pure
    * projection, shuffle-free. The aggregate lambda runs interpreted, so
    * each token is md5-hashed ONCE (`transform` to hex first) and the
    * bucket parsed from the hex — [[Dedup.md5Key28FromHex]]; same value,
    * 7× fewer hashes than hashing inside the fold. */
  def score(text: Column): Column = {
    val hexes = transform(
      coalesce(TextAnalysis.tokens(text), array().cast("array<string>")),
      t => md5(t))
    aggregate(hexes, lit(0L), (acc, h) => {
      val b = Dedup.md5Key28FromHex(h) % Buckets
      acc + ((b * WeightA + WeightC) % WeightMod - (WeightMod - 1) / 2)
    })
  }

  /** Classifier decision at the conventional 0 threshold. */
  def keep(text: Column): Column = score(text) >= 0L
}
