package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine TRAINED quality classifier: a full-batch integer perceptron
  * over hashed-unigram count features — the fastText-style linear
  * text-classifier shape (Joulin et al. 2017, "Bag of Tricks for
  * Efficient Text Classification"), trained with Rosenblatt's batch
  * update instead of SGD so the whole procedure is deterministic and
  * engine-replayable: every step is an exact int64 sum over an
  * UNORDERED set (misclassified documents), so partitioning, task
  * order, and engine never change a single weight. [[QualityModel]]
  * scores with FIXED hand-set weights and [[Dsir]] trains count-ratio
  * importance weights; this closes the triptych — a discriminative
  * model trained in-query against arbitrary labels.
  *
  * Features: token-count vector over [[QualityModel.Buckets]] hashed
  * buckets (the portable 28-bit md5 bucketing every scoring operator
  * here shares) plus a constant bias feature at index B. Labels y ∈
  * {+1, −1}. Each iteration: margin_d = w·x_d (one codegen'd
  * `aggregate` projection against the LITERAL weight array — no join),
  * misclassified = y_d·margin_d ≤ 0, then w += Σ_mis y_d·x_d (one
  * explode + groupBy(bucket) whose partial aggregation bounds every
  * task's state at B+1 rows before the only shuffle; ≤ B+1 rows reach
  * the driver — the same bounded-collect contract as the [[KMeans]]
  * centroids and [[Dsir]] weights).
  *
  * Scale shape (100 TB): T iterations = T corpus scans, each one
  * projection + one B-bounded shuffle; weights never exceed
  * T·Σ|tokens| in magnitude (int64-safe), and scoring after training
  * is a single shuffle-free projection. */
object Perceptron {

  import QualityModel.Buckets

  /** Bias feature index (one past the hashed buckets). */
  val Bias: Long = Buckets

  private def hexes(textCol: Column): Column =
    transform(coalesce(TextAnalysis.tokens(textCol),
      array().cast("array<string>")), t => md5(t))

  /** w·x_d + bias under literal weights — one interpreted-lambda pass,
    * each token md5-hashed once. */
  def margin(textCol: Column, w: Array[Long]): Column = {
    require(w.length == Buckets.toInt + 1, s"need ${Buckets + 1} weights")
    val wLit = typedLit(w.toSeq)
    aggregate(hexes(textCol), lit(w(Bias.toInt)),
      (acc, h) => acc + element_at(wLit,
        (Dedup.md5Key28FromHex(h) % Buckets).cast("int") + 1))
  }

  /** Featurized corpus: one row per document with `__y` (the ±1 label)
    * and `__bk` — the bucket-id array of its tokens PLUS the bias index.
    * Tokenize + md5 + bucket is the expensive per-document kernel; a
    * T-iteration training run re-derived it 2T times (margin filter +
    * update explode per round). Computing it once and training on the
    * integer arrays leaves each round a pure array pass (opt guide §1.2:
    * "don't compute things twice"); callers that keep the frame across
    * rounds should `localCheckpoint()` it. */
  def featurize(docs: DataFrame, textCol: String, label: Column): DataFrame =
    docs.select(when(label, 1L).otherwise(-1L).as("__y"),
      concat(
        transform(hexes(col(textCol)), h => Dedup.md5Key28FromHex(h) % Buckets),
        array(lit(Bias))).as("__bk"))

  /** w·x + bias over a [[featurize]]d row (the bias index rides in
    * `__bk`, so the fold starts at 0). */
  def marginOnFeatures(w: Array[Long]): Column = {
    require(w.length == Buckets.toInt + 1, s"need ${Buckets + 1} weights")
    val wLit = typedLit(w.toSeq)
    aggregate(col("__bk"), lit(0L),
      (acc, b) => acc + element_at(wLit, b.cast("int") + 1))
  }

  /** Train `iterations` full-batch rounds from w = 0 over a
    * [[featurize]]d frame. Identical arithmetic to training on raw text:
    * the bias index inside `__bk` contributes w(Bias) to every margin
    * and 1 to every update, exactly as the explicit bias term did. */
  def trainOnFeatures(feat: DataFrame, iterations: Int): Array[Long] = {
    require(iterations >= 1, "at least one iteration")
    val w = Array.fill(Buckets.toInt + 1)(0L)
    for (_ <- 1 to iterations) {
      val m = marginOnFeatures(w)
      // y·margin ≤ 0 — the batch perceptron's misclassified set (margin
      // 0 counts as wrong for BOTH classes, so the first round updates
      // on every document: w1 = Σ y·x, the class-difference direction)
      val mis = feat.filter(col("__y") * m <= 0L)
        .select(col("__y"), explode(col("__bk")).as("__b"))
        .groupBy(col("__b")).agg(sum(col("__y")).as("__d"))
        .collect()
      mis.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
    }
    w
  }

  /** Train `iterations` full-batch rounds from w = 0. `label` is the
    * positive-class boolean. Returns the B+1 weights (bias last). */
  def train(docs: DataFrame, textCol: String, label: Column,
      iterations: Int): Array[Long] =
    trainOnFeatures(featurize(docs, textCol, label), iterations)

  /** Score + prediction columns for trained weights. */
  def predict(textCol: Column, w: Array[Long]): (Column, Column) = {
    val m = margin(textCol, w)
    (m, m > 0L)
  }
}
