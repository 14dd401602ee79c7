package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the engine, built from Catalyst
  * higher-order functions so everything stays inside whole-stage codegen
  * (no UDFs in the hot path).
  *
  * Semantics mirror the reference kernels:
  *   - byte bigrams with multiplicity (/root/reference/src/heurFuzz.py:23-32)
  *   - asymmetric containment coverage: for each query bigram (multiset),
  *     +1 if present ANYWHERE in the ref bigrams — the `break` at
  *     /root/reference/src/heurFuzz.py:43 exits only the inner search, ref
  *     bigrams are not consumed. Divided by the query's bigram count.
  *   - Python-`str.strip()` trimming (all whitespace, not just spaces).
  */
object TextFunctions {

  /** Python str.strip(): Spark `trim` only strips ' ', so use a regex.
    * (?U) = UNICODE_CHARACTER_CLASS so \s matches all Unicode whitespace
    * ( ,  , ...) like Python's str.strip, not just ASCII.
    */
  def pyStrip(c: Column): Column = regexp_replace(c, "(?U)^\\s+|\\s+$", "")

  /** UTF-8 byte length of a string column (reference counts bytes, not
    * chars — /root/reference/src/heurFuzz.py:72-79).
    */
  def byteLength(c: Column): Column = octet_length(c)

  /** Overlapping byte bigrams of a string column as array<binary>,
    * multiplicity preserved. Empty/1-byte strings yield an empty array
    * (the reference crashes / UB there — documented divergence, SURVEY §7.4).
    */
  def byteBigrams(c: Column): Column = {
    val b = encode(c, "UTF-8")
    when(
      octet_length(b) >= 2,
      transform(sequence(lit(1), octet_length(b) - 1), i => substring(b, i, lit(2)))
    ).otherwise(array().cast("array<binary>"))
  }

  /** Character n-gram shingles (multiplicity preserved). */
  def charShingles(c: Column, n: Int): Column =
    when(
      length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)), i => substring(c, i, lit(n)))
    ).otherwise(array().cast("array<string>"))

  /** Asymmetric bigram containment coverage of `queryBigrams` in
    * `refBigrams`: fraction of query bigrams (with multiplicity) present
    * anywhere in the ref's bigram list. 0 query bigrams -> 0.0.
    */
  def bigramCoverage(queryBigrams: Column, refBigrams: Column): Column =
    when(size(queryBigrams) === 0, lit(0.0)).otherwise(
      size(filter(queryBigrams, g => array_contains(refBigrams, g)))
        .cast("double") / size(queryBigrams)
    )

  /** Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = size(array_union(da, db)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** One MinHash value: min over shingles of md5(seed || shingle).
    * md5 is available verbatim in DuckDB, so the oracle can reproduce the
    * signature bit-for-bit (no engine-specific hash functions).
    * Empty shingle set -> null (array_min of [] would silently be null
    * anyway; made explicit + documented: callers must filter or
    * null-propagate docs shorter than the shingle width).
    */
  def minhash(shingles: Column, seed: Int): Column =
    when(size(array_distinct(shingles)) === 0, lit(null).cast("string"))
      .otherwise(array_min(transform(array_distinct(shingles), g => md5(concat(lit(seed.toString), g)))))

  /** Full MinHash signature as array<string> of length `numHashes`. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i => minhash(shingles, i)): _*)

  /** Whitespace tokens of trimmed text (empty string -> empty array).
    * (?U) for Unicode-whitespace parity with Python str.split().
    */
  def whitespaceTokens(c: Column): Column = {
    val t = pyStrip(c)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "(?U)\\s+"))
  }
}
