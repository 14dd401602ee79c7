package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text analysis operators for training-data pipelines (builder-brief
  * pillar): language-ID heuristics, quality scoring, token counting,
  * document fingerprinting. All narrow per-row projections — no shuffle,
  * fully codegen'd, trivially scalable.
  *
  * Everything is md5/ratio-based so a DuckDB oracle reproduces the values
  * exactly (integer counts, deterministic double divisions).
  */
object TextAnalysis {

  /** Default English stopword list for the language-ID heuristic. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
        "was", "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Fraction of whitespace tokens present in `stopwords` — the classic
    * cheap language-ID signal (0.0 for empty docs).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = TextFunctions.whitespaceTokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks)
    )
  }

  /** Whitespace token count (long). */
  def tokenCount(text: Column): Column =
    size(TextFunctions.whitespaceTokens(text)).cast("long")

  /** BPE-ish word-piece count: maximal runs of letters, digits, or single
    * other non-space chars — a cheap proxy for subword token counts.
    * Pattern is RE2/Java-compatible for oracle parity.
    */
  def wordPieceCount(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long"))

  /** Punctuation character ratio (0.0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("[!-/:-@\\[-`{-~]")).cast("double") / length(text)
    )

  /** Mean token byte length (0.0 for token-less docs) — quality signal. */
  def meanTokenLength(text: Column): Column = {
    val toks = TextFunctions.whitespaceTokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + octet_length(t)).cast("double") / size(toks)
    )
  }

  /** Document fingerprint: the `k` lexicographically-smallest md5 hashes of
    * the distinct lowercase char n-gram shingles, joined with ','. A
    * winnowing-style content signature: stable under word reordering at
    * the shingle level, cheap to compare, exactly reproducible.
    * Null for docs shorter than the shingle width.
    */
  def fingerprint(text: Column, shingleN: Int = 4, k: Int = 8): Column = {
    val sh = array_distinct(TextFunctions.charShingles(lower(text), shingleN))
    when(size(sh) === 0, lit(null).cast("string")).otherwise(
      array_join(slice(array_sort(transform(sh, g => md5(g))), 1, k), ",")
    )
  }
}
