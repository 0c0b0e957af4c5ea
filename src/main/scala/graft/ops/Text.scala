package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines —
  * SURVEY.md §2.J / north star: language-ID heuristics, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything is built-in-function composition (codegen'd, no UDFs).
  * Cross-engine hashing rule: md5 hex (identical in Spark and DuckDB);
  * 8-hex-char prefixes parsed to bigint (`conv` / `CAST('0x…')`) give
  * portable 32-bit word hashes for fingerprints and sketches.
  */
object Text {

  /** Whitespace tokenization — the H3 generator shape. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable 32-bit hash of a string: first 8 hex chars of md5.
    * Used by fingerprints/simhash so the DuckDB oracle can reproduce
    * the exact value (`CAST('0x' || substring(md5(s),1,8) AS BIGINT)`).
    */
  def md5Int(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("bigint")

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — a cheap proxy for subword token counts
    * when budgeting LLM training data.
    */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("bigint")

  /** A tiny function-word list for the language-ID heuristic. */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "for")

  /** Fraction of tokens that are English function words — the n-gram
    * language-ID heuristic's scoring half. Exact integer ratio divided
    * in double: deterministic.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(enStopwords: _*)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** Quality-score feature bundle (length / punctuation / stopword
    * ratios). Scores are simple deterministic ratios; the point at
    * 100 TB is that every feature is one codegen'd expression over the
    * text column — a single scan computes them all.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("bigint")
    val nWords = size(tokens(text)).cast("bigint")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "avg_word_len" -> (nChars - (nWords - 1)).cast("double") / nWords.cast("double"),
      "punct_ratio" -> length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / nChars.cast("double"),
      "stopword_ratio" -> stopwordRatio(text)
    )
  }

  /** Polynomial rolling-hash document fingerprint over word hashes,
    * mod 1e9+7: order-sensitive (unlike a bag-of-words hash) so
    * reordered near-dups get distinct fingerprints, while whitespace
    * normalization maps to the same one. Sequential fold over the token
    * array — deterministic, and bounded: acc < p keeps `acc*31 + h`
    * far inside Long range.
    */
  val fingerprintMod = 1000000007L
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => (acc * 31L + md5Int(w)) % fingerprintMod)
}
