package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (driver-mandated extension; no reference counterpart — designed
  * Spark-first per SURVEY.md §7 "ext/").
  *
  * Everything here is built from `org.apache.spark.sql.functions` column
  * expressions — no UDFs — so the whole pipeline stays inside whole-stage
  * codegen and distributes trivially: each operator is a per-row projection
  * (no shuffle), which at 100 TB means a pure map stage over the parquet
  * scan with full predicate/column pushdown preserved.
  */
object TextAnalysis {

  /** Tiny per-language stopword seed sets for the lang-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "au"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "por", "con", "para", "como"))

  /** Normalized word tokens: lowercase, split on non-word runs, drop empties.
    * (The BPE-ish regex tokenizer is the same expression with a richer
    * pattern — see [[bpeishTokens]].) */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => t =!= "")

  /** Subword-ish tokenization: splits camelCase/digits boundaries too,
    * approximating a BPE pre-tokenizer's word splitting. */
  def bpeishTokens(text: Column): Column =
    filter(split(regexp_replace(text, "([a-z])([A-Z])", "$1 $2"),
      "[^A-Za-z0-9]+|(?<=[0-9])(?=[A-Za-z])|(?<=[A-Za-z])(?=[0-9])"),
      t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens (with duplicates) that are stopwords of `lang`. */
  def stopwordTokenCount(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(Stopwords(lang))))

  /** Count of DISTINCT stopwords of `lang` present (set overlap). */
  def stopwordOverlap(toks: Column, lang: String): Column =
    size(array_intersect(toks, lit(Stopwords(lang).toArray)))

  /** N-gram-heuristic language ID: distinct-stopword overlap per language,
    * argmax with a fixed en>de>fr>es tie-break (deterministic). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val s = Seq("en", "de", "fr", "es").map(l => l -> stopwordOverlap(t, l)).toMap
    when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), "en")
      .when(s("de") >= s("fr") && s("de") >= s("es"), "de")
      .when(s("fr") >= s("es"), "fr")
      .otherwise("es")
  }

  /** Fraction of characters outside [a-z0-9 ] after lowercasing — a
    * punctuation/noise proxy. Deterministic double (two exact int lengths):
    * deleting the clean class leaves exactly the noise characters. */
  def noiseRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
      .cast("double") / greatest(length(text), lit(1))

  /** Mean token length as exact-integer sum / count (order-independent). */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
      .cast("double") / greatest(size(toks), lit(1))

  /** Quality features + composite score in one projection:
    * token count, mean token length, stopword-token ratio, noise ratio.
    * Score favors mid-length docs with natural stopword density. */
  def qualityFeatures(df: org.apache.spark.sql.DataFrame, textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val noiseChars = length(regexp_replace(lower(col(textCol)), "[a-z0-9 ]", ""))
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("avg_token_len", avgTokenLen(t))
      .withColumn("stopword_ratio",
        stopwordTokenCount(t, "en").cast("double") / greatest(nTok, lit(1)))
      .withColumn("noise_ratio",
        noiseChars.cast("double") / greatest(length(col(textCol)), lit(1)))
      .withColumn("quality_score",
        when(nTok < 5, 0.0).otherwise(
          lit(1.0)
            - abs(col("avg_token_len") - 5.0) / 10.0
            - col("noise_ratio")
            + when(col("stopword_ratio").between(0.05, 0.6), 0.25).otherwise(0.0)))
  }

  /** Content fingerprint: md5 of the normalized token stream — stable under
    * whitespace/case/punctuation jitter (the "rolling hash" normalization
    * step of document fingerprinting; per-shingle rolling hashes for
    * near-dup detection live in [[Dedup.shingles]] + hash). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))
}
