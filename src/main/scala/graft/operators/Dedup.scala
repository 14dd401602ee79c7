package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale text corpora (builder-brief
  * pillar; the reference's only dedup is the set()-based ETL helper,
  * /root/reference/src/example_helpers/parse_inputs.py:27-35).
  *
  * Scale design (100 TB):
  *   - exact dedup is a hash groupBy — one shuffle on the content hash,
  *     map-side partial aggregation, no driver state.
  *   - near-dup is MinHash-LSH: signatures are computed per-row (narrow),
  *     candidate pairs come from an equi-join on (band, band key) — only
  *     rows sharing a band bucket ever meet, so the O(n^2) all-pairs
  *     compare never materializes. Jaccard verify runs only on candidates.
  *   - all hashes are md5-derived so a DuckDB oracle can reproduce results
  *     bit-for-bit (no engine-private hash functions).
  */
object Dedup {

  /** Distinct lowercase char n-gram shingles of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(TextFunctions.charShingles(lower(text), n))

  /** Exact duplicate groups: md5 content hash -> group size + kept id
    * (keep-one = min id; deterministic).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))

  /** MinHash-LSH candidate pairs: signature of `numHashes` md5 minhashes,
    * banded `rowsPerBand` hashes per band; pairs sharing any band bucket.
    * Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * The band join shuffles on the band key only — at 100 TB this is the
    * standard signature-join plan (no cross join anywhere).
    */
  def lshCandidates(
      docs: DataFrame,
      idCol: String,
      shCol: String,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame =
    lshCandidatesFromSig(docs, idCol, TextFunctions.minhashSignature(col(shCol), numHashes),
      numHashes, rowsPerBand)

  /** As `lshCandidates` but with a caller-supplied signature expression
    * (e.g. built from pre-hashed shingles via minhashSignatureFromBases).
    */
  def lshCandidatesFromSig(
      docs: DataFrame,
      idCol: String,
      sig: org.apache.spark.sql.Column,
      numHashes: Int,
      rowsPerBand: Int
  ): DataFrame = {
    val numBands = numHashes / rowsPerBand
    // band key = concat of the band's hashes; null signature (empty shingle
    // set) rows drop out — they cannot be near-dups of anything.
    val banded = docs
      .select(col(idCol), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(
        col(idCol),
        posexplode(
          array((0 until numBands).map(b =>
            concat_ws("|", (0 until rowsPerBand).map(r =>
              col("sig")(b * rowsPerBand + r).cast("string")): _*)
          ): _*)
        ).as(Seq("band", "key"))
      )
    banded
      .as("a")
      .join(banded.as("b"), Seq("band", "key"))
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with exact Jaccard over
    * the hashed shingle sets, kept at >= `threshold`.
    *
    * Shingles are reduced to 31-bit md5-based longs ONCE; banding and the
    * Jaccard verify both run on the long arrays (one md5 per shingle
    * total, integer set-intersection in the verify — several times
    * cheaper than string-array intersection, and the shuffle rows shrink
    * accordingly). Hash collisions merge shingles deterministically at
    * ~n/2^31 rate; the oracle mirrors the same hashing so results match
    * exactly. |A u B| comes from |A|+|B|-|A n B| — no union array is built.
    */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 4,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.4
  ): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val withH = docs.select(
      col(idCol),
      array_distinct(
        transform(
          TextFunctions.charShingles(lower(col(textCol)), shingleN),
          g => TextFunctions.shingleBaseHash(g)
        )
      ).as("hs")
    )
    // Carry the hash arrays through the band join: the shingle hashing is
    // computed once per join side instead of re-derived by separate
    // candidate + two dimension joins (a 3x recompute diamond), and the
    // Jaccard verify runs inline on the join output before the distinct,
    // so only (id_a, id_b, jacc) rows ever shuffle afterwards.
    val sig = TextFunctions.minhashSignatureFromBases(col("hs"), numHashes)
    val banded = withH
      .select(col(idCol), col("hs"), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(
        col(idCol), col("hs"),
        posexplode(
          array((0 until numBands).map(b =>
            concat_ws("|", (0 until rowsPerBand).map(r =>
              col("sig")(b * rowsPerBand + r).cast("string")): _*)
          ): _*)
        ).as(Seq("band", "key"))
      )
    // true self-join with the rename AFTER the join: both sides canonicalize
    // to the identical plan, so ReuseExchange materializes the banded
    // shuffle ONCE instead of recomputing shingles+hashes per side
    val inter = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
    banded.alias("a")
      .join(
        banded.alias("b"),
        col(s"a.band") === col(s"b.band") && col(s"a.key") === col(s"b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col("a.hs").as("hs_a"),
        col(s"b.$idCol").as("id_b"), col("b.hs").as("hs_b"))
      .withColumn("jacc", inter / (size(col("hs_a")) + size(col("hs_b")) - inter))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "jacc")
      .distinct()
  }

  /** SimHash over whitespace tokens: each token hashes to `bits` bits (md5
    * prefix), each bit position accumulates +1/-1 across tokens (with
    * multiplicity = frequency weighting), the sign becomes the output bit.
    * Tokens hash via the first 15 md5 hex chars (60 bits) so the value fits
    * a signed long in both Spark (conv) and DuckDB (hex cast).
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    val tokens = TextFunctions.whitespaceTokens(lower(text))
    val hashes = transform(tokens, t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until bits).map { b =>
      aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1)
      )
    }
    bitSums.zipWithIndex
      .map { case (s, b) => when(s > 0, lit(1L << b)).otherwise(0L) }
      .reduce(_ + _)
  }

  /** N-gram Jaccard all-pairs similarity over a (small or pre-bucketed)
    * set: exact pairwise Jaccard, id_a < id_b, kept at >= threshold.
    * This is the verify-stage primitive — at scale feed it LSH buckets,
    * never a whole corpus.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double
  ): DataFrame = {
    val withSh = docs.select(col(idCol), shingleSet(col(textCol), shingleN).as("sh"))
    withSh
      .select(col(idCol).as("id_a"), col("sh").as("sh_a"))
      .crossJoin(withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b")))
      .where(col("id_a") < col("id_b"))
      .withColumn("jacc", TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "jacc")
  }
}
