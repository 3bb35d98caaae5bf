package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CCNet-style text normalization ahead of dedup (driver-mandated
  * LLM-pipeline extension; no reference counterpart — designed
  * Spark-first per SURVEY.md §7 "ext/").
  *
  * Deduplication over raw bytes misses trivially-reformatted copies —
  * CCNet (Wenzek et al. 2020) normalizes before hashing: lowercase,
  * digits folded to a single class, punctuation stripped, whitespace
  * collapsed. The normalized form is the DEDUP KEY only; the kept
  * document keeps its original bytes.
  *
  * Every step is a codegen'd `functions._` projection — no UDF, no
  * shuffle — so normalizing 100 TB is one map stage fused into the scan.
  * Regexes are in the Java-regex ∩ RE2 common subset (character classes
  * only), so the DuckDB oracle replays them verbatim (same dialect rule
  * as [[Redaction]]).
  */
object Normalize {

  /** Lowercase → digits→0 → non-alphanumerics→space → collapse runs →
    * trim. Idempotent (each stage's output is a fixpoint of the stages
    * before it). */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(text), "[0-9]", "0"),
        "[^a-z0-9 ]", " "),
      "  +", " "))

  /** Dedup fingerprint of the normalized form. */
  def normalizedFingerprint(text: Column): Column = md5(normalize(text))
}
