package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for the training-data pipeline surface
  * ([EXT] X4, SURVEY §2.11): token counting, quality scoring, language
  * ID, document fingerprinting. Everything here is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs) so the expressions stay
  * inside whole-stage codegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count as BIGINT (matches DuckDB `len(regexp_split_to_array)`). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish sub-word split: alternating letter-runs / digit-runs /
    * single punctuation marks — the usual pre-tokenizer regex shape.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text)).cast("long")

  /** Mean characters per whitespace token (double; exact int division). */
  def charsPerToken(text: Column): Column =
    length(text).cast("double") / tokenCount(text)

  /** Fraction of characters in `cls` (a regex char class, e.g. "[0-9]"). */
  def charClassRatio(text: Column, cls: String): Column =
    (length(text) - length(regexp_replace(text, cls, ""))).cast("double") /
      length(text)

  /** Default English-ish stopword set used by the quality score. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "for", "on")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords))).cast("double") /
      tokenCount(text)

  /** Composite quality score in [0,1]: penalizes very short docs, digit
    * and punctuation soup; rewards a natural stopword rate. Heuristic —
    * weights are the interesting knob, the plumbing is the deliverable.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val digitPen = charClassRatio(text, "[0-9]")
    val punctPen = charClassRatio(text, "[\\.,;:!\\?'\"\\(\\)-]")
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    greatest(lit(0.0),
      lenScore * lit(0.4) + stopScore * lit(0.4) -
        digitPen * lit(0.5) - punctPen * lit(0.3) + lit(0.2))
  }

  /** Language-ID by stopword/character heuristics (n-gram-free variant:
    * per-language marker-word hit counts + CJK/Cyrillic character
    * checks). Emits one of en/de/fr/es/it/pt/nl/zh/ru/unknown; ties pick
    * the earlier language (en first). Decision ladder is deterministic,
    * so the x_lang_id DuckDB oracle replays it exactly. Implemented as a
    * one-pass kernel ([[Kernels.langId]]) — the expression form paid 7
    * interpreted higher-order `filter` scans per row.
    */
  def langId(text: Column): Column = Kernels.langIdCol(text)

  /** Polynomial rolling-hash fingerprint over the character stream:
    * `h := (h*131 + code(c)) mod 1e9+7`. Stays in a 64-bit range at every
    * step (h < 1e9+7, so h*131 + c < 2^37), so the same fold is
    * expressible in DuckDB (`list_reduce`) for an exact oracle.
    */
  def fingerprint(text: Column): Column = Kernels.fingerprintCol(text)

  /** Word n-gram shingles (for Jaccard / MinHash dedup): the kernel
    * semantics — DISTINCT shingles, empty for docs under `n` tokens —
    * shared with every dedup operator and the DuckDB oracles.
    */
  def wordShingles(text: Column, n: Int): Column = Kernels.shinglesCol(text, n)
}
