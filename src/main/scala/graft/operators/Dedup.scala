package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import org.apache.spark.sql.graft.Md5Long60

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
  *   - hashes whose VALUES shape the result (minhash/LSH candidate
  *     buckets, simhash bits, exact-dup group keys) are md5-derived so a
  *     DuckDB oracle reproduces them bit-for-bit; operators whose output
  *     is hash-independent (the exact prefix-filtered Jaccard join) use
  *     Spark's cheaper codegen'd xxhash64 instead.
  */
object Dedup {

  /** Distinct lowercase char n-gram shingles of a text column. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(TextFunctions.charShingles(lower(text), n))

  /** The containment family's shingle-hash derivation — sorted distinct
    * md5-long hashes of the char n-gram shingles. ONE definition on
    * purpose: the bottom-k screen's probe side, its corpus-side posting
    * list, and the audit's truth pass must stay bit-identical (sort
    * order IS the bottom-k sample), so they all call this instead of
    * inlining the expression.
    */
  def hashedShingles(text: Column, n: Int): Column =
    array_sort(array_distinct(transform(
      shingleSet(text, n), g => Md5Long60.column(g))))

  /** Exact duplicate groups: md5 content hash -> group size + kept id
    * (keep-one = min id; deterministic).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))

  /** Repeated-span statistics (the signal behind exact-substring dedup,
    * Lee et al. "Deduplicating Training Data Makes Language Models
    * Better", ACL'22: spans appearing verbatim in more than one document
    * are memorization fuel and get cut). Per document: how many of its
    * distinct `n`-char spans also occur in ANOTHER document, and the
    * duplicated fraction.
    *
    * Returns (doc id, n_shingles, n_dup, dup_ratio), one row per input
    * document (docs shorter than `n` chars report 0 / 0 / 0.0).
    *
    * Scale shape: explode distinct spans (narrow) -> one hash groupBy on
    * the span counting DISTINCT docs -> left-semi back onto the exploded
    * spans -> per-doc count. Two shuffles, both map-side combined; no
    * pairwise product anywhere (the suffix-array approach the paper uses
    * single-node becomes this shuffle shape distributed). Spans travel as
    * xxhash64 keys — 8 bytes through the shuffles instead of an n-char
    * string (the q33/ngramJaccardPairs convention: the output carries no
    * hash values, and a 64-bit collision is negligible next to the
    * 3x-smaller exchange). The span arrays checkpoint once so the
    * explode's two consumers don't recompute the shingling.
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spans = docs.select(col(idCol).as("doc_id"),
        transform(shingleSet(col(textCol), n), g => xxhash64(g)).as("shs"))
      .localCheckpoint(false)
    val ex = spans.select(col("doc_id"), explode(col("shs")).as("sh"))
    // distinct-per-doc spans, so count(*) per span == #docs containing it
    val dup = ex.groupBy("sh").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("sh")
    val perDoc = ex.join(dup, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    spans.select(col("doc_id"), size(col("shs")).cast("long").as("n_shingles"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
      .withColumn("dup_ratio",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_shingles")))
  }

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
    val hashedSig = hashedSignatures(docs, idCol, textCol, shingleN, numHashes)
    val banded = bandExplode(hashedSig, idCol, numBands, rowsPerBand)
    // true self-join with the rename AFTER the join: both sides canonicalize
    // to the identical plan, so ReuseExchange materializes the banded
    // shuffle ONCE instead of recomputing shingles+hashes per side
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
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

  /** Per-doc (id, sorted distinct shingle hashes, minhash signature),
    * checkpointed — the shared first stage of every MinHash operator.
    *
    * Shingle hashes are sorted ascending so verifies can use the
    * merge-scan intersect expression (no per-row hash sets); minhash is
    * order-blind. Lazily checkpointed: band projections reference `sig`
    * once per signature slot and `hs` rides into join sides — without a
    * materialization barrier CollapseProject inlines the md5-per-shingle
    * hashing (HOFs never codegen, so no subexpression elimination) into
    * every reference. One small (id, hs, sig) row per doc materializes
    * instead. Rows with an empty shingle set drop out (null signature) —
    * they cannot be near-dups of anything.
    */
  private def hashedSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int
  ): DataFrame = {
    val hs = array_sort(
      array_distinct(
        transform(
          TextFunctions.charShingles(lower(col(textCol)), shingleN),
          g => TextFunctions.shingleBaseHash(g)
        )
      )
    )
    docs
      .select(col(idCol), hs.as("hs"))
      .select(col(idCol), col("hs"),
        TextFunctions.minhashSignatureFromBases(col("hs"), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .localCheckpoint(false)
  }

  /** Explode a signature frame into one (id, carried cols, band, key) row
    * per band; the (band, key) pair is the LSH equi-join key.
    */
  private def bandExplode(
      hashedSig: DataFrame,
      idCol: String,
      numBands: Int,
      rowsPerBand: Int,
      carry: Seq[String] = Seq("hs")
  ): DataFrame =
    hashedSig.select(
      col(idCol) +: carry.map(col) :+
        posexplode(
          array((0 until numBands).map(b =>
            concat_ws("|", (0 until rowsPerBand).map(r =>
              col("sig")(b * rowsPerBand + r).cast("string")): _*)
          ): _*)
        ).as(Seq("band", "key")): _*
    )

  /** Incremental near-dup filter: an INCOMING batch screened against an
    * EXISTING corpus (the production shape of web-crawl dedup — each new
    * crawl snapshot is deduplicated against everything already kept, not
    * against itself). Returns one row per incoming doc:
    * (id, n_dups = count of corpus docs with Jaccard >= threshold among
    * LSH candidates, kept = 1 if n_dups = 0 else 0).
    *
    * Scale shape: both sides reduce to (id, hs, sig) signature rows; the
    * candidate stage is an equi-join on (band, key) between the incoming
    * bands and the corpus bands — the incoming side is a new batch (small
    * relative to the corpus), so the shuffle is dominated by the corpus
    * band table, which at 100 TB would be a PERSISTED signature table
    * maintained across snapshots rather than recomputed (the operator
    * takes DataFrames, so callers feed the stored table directly; this
    * convenience overload derives it from raw text). Verify runs inline
    * on the join output, so only (in_id, corp_id) survivor pairs shuffle
    * into the per-doc count. No self-join, no cross join.
    */
  def incrementalNearDupFilter(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 4,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.4
  ): DataFrame =
    incrementalNearDupFilterOnBands(incoming,
      signatureBands(corpus, idCol, textCol, shingleN, numHashes, rowsPerBand),
      idCol, textCol, shingleN, numHashes, rowsPerBand, threshold)

  /** The (id, hs, band, key) LSH band table of a document frame — the
    * PERSISTABLE signature-index shape. At 100 TB this table is written
    * ONCE per ingest, bucketed by the (band, key) join key, and every
    * later snapshot's incremental dedup reads it back shuffle-free
    * (q132 exercises the full round trip; BucketedJoinSpec pins the
    * corpus-side no-exchange plan).
    */
  def signatureBands(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 4,
      numHashes: Int = 8,
      rowsPerBand: Int = 4
  ): DataFrame =
    bandExplode(hashedSignatures(docs, idCol, textCol, shingleN, numHashes),
      idCol, numHashes / rowsPerBand, rowsPerBand)

  /** As `incrementalNearDupFilter`, but the corpus side is a pre-built
    * band table in `signatureBands` shape — the persisted-signature-table
    * entry point: feed it `spark.table("sig_table")` where the table was
    * written bucketed by (band, key) and the candidate equi-join runs with
    * no exchange on the (huge) corpus side; only the incoming batch's
    * bands shuffle into the bucket layout.
    */
  def incrementalNearDupFilterOnBands(
      incoming: DataFrame,
      corpusBands: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 4,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.4
  ): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val inBands = bandExplode(
      hashedSignatures(incoming, idCol, textCol, shingleN, numHashes),
      idCol, numBands, rowsPerBand)
    val corpBands = corpusBands
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
    val dupCounts = inBands.alias("a")
      .join(corpBands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(
        col(s"a.$idCol").as("in_id"), col("a.hs").as("hs_a"),
        col(s"b.$idCol").as("corp_id"), col("b.hs").as("hs_b"))
      .withColumn("jacc", inter / (size(col("hs_a")) + size(col("hs_b")) - inter))
      .filter(col("jacc") >= threshold)
      // a pair can collide in several bands — count each corpus doc once
      .select("in_id", "corp_id")
      .distinct()
      .groupBy("in_id")
      .agg(count(lit(1)).as("n_dups"))
    incoming.select(col(idCol))
      .join(dupCounts, col(idCol) === col("in_id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
      .withColumn("kept", when(col("n_dups") === 0, 1L).otherwise(0L))
  }

  /** Incremental HAMMING-space near-dup screen — the perceptual-hash
    * twin of `incrementalNearDupFilterOnBands`: for each incoming item,
    * how many CORPUS items sit within `maxHamming` of its signature
    * (dHash/simhash), found via the pigeonhole band equi-join
    * (maxHamming+1 contiguous bands are a lossless index for the ball,
    * so recall is exact) + exact bit_count verify — no incoming x
    * corpus all-pairs anywhere in the plan. At 100 TB the corpus side
    * is the persisted bucketed band table ingest maintains (the q132
    * layout applies verbatim: one (band, key) bucketed table, incoming
    * shuffles into it, corpus never moves). Output per incoming row:
    * (idCol, n_dup, kept).
    */
  def incrementalHammingScreen(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      shCol: String,
      bits: Int,
      maxHamming: Int
  ): DataFrame = {
    val nb = maxHamming + 1
    val inc = hammingBands(incoming, idCol, shCol, bits, nb)
    val corp = hammingBands(corpus, idCol, shCol, bits, nb)
      .withColumnRenamed(idCol, "c_id").withColumnRenamed(shCol, "c_sh")
    val hits = inc.join(corp, Seq("band", "key"))
      // a pair can collide in several bands — count each neighbor once
      .select(col(idCol), col(shCol), col("c_id"), col("c_sh")).distinct()
      .filter(bit_count(col(shCol).bitwiseXOR(col("c_sh"))).cast("long") <= maxHamming)
      .groupBy(idCol).agg(count(lit(1)).as("n_dup"))
    incoming.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("kept", col("n_dup") === 0)
  }

  /** As `nearDuplicates`, but the WHOLE corpus arrives as a pre-built
    * band table in `signatureBands` shape — the full-corpus twin of
    * `incrementalNearDupFilterOnBands`. The candidate stage is a SELF
    * join on (band, key): feed it `spark.table("sig_table")` where the
    * table was written `bucketBy(band, key)` + `sortBy` and the join
    * plans with NO exchange (and no re-sort) on EITHER side — at 100 TB
    * the signature table is maintained once by ingest and every
    * pair-generation consumer (dedup sweeps, leakage checks) reads it
    * back shuffle-free instead of re-hashing the corpus. The exact
    * Jaccard verify runs off the `hs` arrays the table already carries.
    */
  def nearDupPairsOnBands(
      bands: DataFrame,
      idCol: String,
      threshold: Double = 0.4
  ): DataFrame = {
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
    bands.alias("a")
      .join(
        bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col("a.hs").as("hs_a"),
        col(s"b.$idCol").as("id_b"), col("b.hs").as("hs_b"))
      .withColumn("jacc", inter / (size(col("hs_a")) + size(col("hs_b")) - inter))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "jacc")
      .distinct()
  }

  /** LSH banding-parameter AUDIT: for each (numBands, rowsPerBand)
    * config over ONE shared signature table, the candidate-pair count
    * (the shuffle-cost knob) and how many true near-dup pairs it
    * captures (the recall knob) — the tuning table a team reads before
    * committing a banding to a 100 TB dedup run. Truth = exact-Jaccard
    * pairs among the (numHashes, 1) candidates of a corpus-scaled doc
    * sample: the most permissive banding, whose candidate set provably
    * contains every coarser config's over the same docs (a full-band
    * collision implies each of its rows' minhash values collide
    * individually). One band self-join per config; the tiny truth set
    * broadcasts into each config's flag join.
    */
  def lshTuningAudit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      configs: Seq[(Int, Int)],
      threshold: Double,
      sampleTarget: Long = 1000L
  ): DataFrame = {
    // sample FIRST: only sampled docs ever need signatures — the full-
    // corpus md5 minhash pass would otherwise dominate the bounded
    // audit. The checkpoint is a PLAN BARRIER, not just reuse:
    // without it PushProjectionThroughJoin moves the shingle/minhash
    // projection below the broadcast-m join + filter and hashes the
    // ENTIRE corpus (measured 63 s vs 0.3 s at the 10x corpus).
    val docsS = Sampling.oneInM(docs, idCol, sampleTarget,
        spreadTo = docs.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint(false)
    val sig = hashedSignatures(docsS, idCol, textCol, shingleN, numHashes)
    def candidates(src: DataFrame, bands: Int, rows: Int): DataFrame = {
      val b = bandExplode(src, idCol, bands, rows, carry = Seq.empty)
      b.alias("a")
        .join(b.alias("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
        .distinct()
    }
    // band buckets on a dense corpus hold ~N/m docs, so EVERY config's
    // pair volume is ~N^2-ish — corpus-wide, the (8,1) truth measured
    // 1065 s and even the (4,2) count alone 433 s at the 10x headroom
    // corpus. The ENTIRE audit therefore runs on a corpus-scaled 1-in-m
    // doc sample (m = max(1, N div sampleTarget), the trainSample8
    // shape: ~sampleTarget docs at ANY corpus size, broadcast 1-row m,
    // identity at oracle scales). Counts and recall are sample
    // estimates — exactly what a pre-flight banding decision needs, at
    // a bounded O(target^2) worst-case cost.
    val sigS = sig
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
    val truth = candidates(sigS, numHashes, 1)
      .join(sig.select(col(idCol).as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sig.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("jacc", inter / (size(col("hs_a")) + size(col("hs_b")) - inter))
      .filter(col("jacc") >= threshold)
      .select(col("id_a"), col("id_b"), lit(1L).as("t"))
      .localCheckpoint(false) // audited against every config's candidates
    val totals = truth.agg(count(lit(1)).as("n_true_total"))
    configs.map { case (bands, rpb) =>
      candidates(sigS, bands, rpb)
        .join(broadcast(truth), Seq("id_a", "id_b"), "left")
        .agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("n_true_found"))
        .select(lit(bands.toLong).as("bands"), lit(rpb.toLong).as("rows_per_band"),
          col("n_candidates"), col("n_true_found"))
        .crossJoin(broadcast(totals))
        .withColumn("recall",
          expr("CAST(n_true_found AS DOUBLE) / nullif(n_true_total, 0)"))
    }.reduce(_.unionAll(_))
  }

  /** As `nearDuplicates`, but each pair also carries the MINHASH ESTIMATE
    * of its Jaccard (fraction of agreeing signature slots) next to the
    * exact value — the estimator-quality surface: at 100 TB the verify
    * step is the expensive half of LSH dedup, and whether the signature
    * estimate can REPLACE the exact intersect (skipping the shingle-array
    * shuffle entirely) is decided by exactly this pair of columns.
    * Returns distinct (id_a, id_b, est_jacc, jacc) for candidate pairs
    * with exact Jaccard >= threshold.
    */
  def nearDuplicatesWithEstimate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 4,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.4
  ): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val hashedSig = hashedSignatures(docs, idCol, textCol, shingleN, numHashes)
    // carry the full signature through the join alongside the shingle
    // hashes: agreement count is a zip over two 8-slot arrays — cheap next
    // to the merge-scan intersect it rides with
    val banded = bandExplode(hashedSig, idCol, numBands, rowsPerBand, carry = Seq("hs", "sig"))
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
    val agree = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    banded.alias("a")
      .join(
        banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col("a.hs").as("hs_a"), col("a.sig").as("sig_a"),
        col(s"b.$idCol").as("id_b"), col("b.hs").as("hs_b"), col("b.sig").as("sig_b"))
      .withColumn("est_jacc", agree.cast("double") / numHashes)
      .withColumn("jacc", inter / (size(col("hs_a")) + size(col("hs_b")) - inter))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "est_jacc", "jacc")
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
    val hashes = transform(tokens, t => Md5Long60.column(t))
    // ONE fold over the token hashes: the accumulator is an array of `bits`
    // counters and each token updates every position via zip_with — vs the
    // old 16 independent aggregate() folds, which re-walked the token list
    // per bit (16x the work; 25 s at sf0.1 for a narrow projection).
    val bitSums = aggregate(
      hashes,
      array((0 until bits).map(_ => lit(0L)): _*),
      (acc, h) =>
        zip_with(
          acc,
          array((0 until bits).map(b => shiftright(h, b).bitwiseAND(1) * 2 - 1): _*),
          (a, d) => a + d
        )
    )
    val weights = array((0 until bits).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(bitSums, weights, (s, w) => when(s > 0, w).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x
    )
  }

  /** N-gram Jaccard similarity pairs, EXACT (same result set as an
    * all-pairs compare for threshold > 0) but sub-quadratic: the classic
    * AllPairs prefix filter (Bayardo et al., WWW'07).
    *
    * Each doc's distinct shingles are sorted under ONE global order —
    * ascending document frequency, ties by shingle value — so the prefix
    * holds the doc's RAREST shingles. A pair with Jaccard >= t must share
    * >= ceil(t*|A|) shingles, so its intersection necessarily hits the
    * first |A| - ceil(t*|A|) + 1 shingles of BOTH sides — an equi-join on
    * prefix shingles finds every qualifying pair without a cross join,
    * and rare-first ordering keeps each join bucket small (a
    * lexicographic prefix puts stopword-like common shingles in most
    * prefixes and re-creates the quadratic blowup on shared-vocabulary
    * corpora). A length filter (t*|A| <= |B| <= |A|/t) prunes impossible
    * pairs at the join, duplicates collapse map-side in the pair groupBy,
    * and exact Jaccard verifies inline.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0, "prefix filtering requires a positive threshold")
    // xxhash64 shingle hashes: every downstream shuffle/intersect runs
    // on longs instead of strings. Unlike the LSH path (whose CANDIDATE
    // set depends on the hash values, so the oracle must reproduce them
    // via md5), the prefix filter is exact — it finds every pair with
    // jacc >= t regardless of hash function — and the output columns
    // (id_a, id_b, jacc) only depend on set sizes, which any
    // collision-free hash preserves. That frees this operator to use the
    // cheapest codegen'd hash Spark has instead of md5+hex+conv (~4x
    // less per-shingle CPU, the dominant cost here).
    // value-sorted for the merge-scan intersect at verify time (the
    // rare-first ordering the prefix stage needs is built separately)
    // lazily checkpointed: `hashed` is referenced FOUR times in the DAG
    // (document-frequency count, rare-first reorder, and both verify-side
    // array re-joins) — without the checkpoint every branch would redo
    // the per-shingle hashing, the dominant CPU cost. Lazy (not
    // eager) so building the plan stays action-free; the first action
    // materializes it once into the block manager.
    val hashed = docs
      .select(
        col(idCol),
        array_sort(
          array_distinct(
            transform(shingleSet(col(textCol), shingleN), g => xxhash64(g))
          )
        ).as("hs")
      )
      .withColumn("nsh", size(col("hs")))
      .filter(col("nsh") > 0)
      .localCheckpoint(false)
    val ex = hashed.select(col(idCol), col("nsh"), explode(col("hs")).as("h"))
    val freq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    // each doc's shingles re-assembled rare-first; (df, h) is a total
    // order shared by every doc, which is all the prefix theorem needs
    val ordered = ex
      .join(freq, Seq("h"))
      // pinned keyed repartition before the CPU-heavy per-doc reorder —
      // AQE's byte-based coalescing otherwise folds it into one task
      // (see containmentPairs; the groupBy reuses this partitioning)
      .repartition(col(idCol))
      .groupBy(col(idCol), col("nsh"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sg"))
    val prefixLen = (col("nsh") - ceil(lit(threshold) * col("nsh")) + 1).cast("int")
    // checkpointed for the same reason: the candidate stage self-joins
    // `prefixes`, which would otherwise recompute the df-join + reorder
    // on both sides
    val prefixes = ordered.select(
      col(idCol), col("nsh"),
      posexplode(slice(transform(col("sg"), x => x("h")), lit(1), prefixLen)).as(Seq("pos", "h"))
    ).localCheckpoint(false)
    // candidate generation stays NARROW (ids + sizes + positions only) —
    // the shingle arrays re-join after the pair aggregation, so
    // prefix-match multiplicity never replicates an array through a
    // shuffle. PPJoin positional filter (Xiao et al., WWW'08): a pair
    // with jacc >= t needs |A∩B| >= t/(1+t)·(|A|+|B|); its globally
    // smallest shared shingle sits at 0-based positions (pa, pb) in BOTH
    // rare-first lists (same global order), so the achievable overlap is
    // at most 1 + min(|A|-pa-1, |B|-pb-1) — pairs whose bound falls short
    // never reach the array verify. The 1e-9 slack keeps the double-math
    // comparison conservative.
    val alpha = lit(threshold / (1.0 + threshold)) * (col("nsh_a") + col("nsh_b"))
    val ubound = lit(1) + least(col("nsh_a") - col("pa") - 1, col("nsh_b") - col("pb") - 1)
    // SHUFFLE_HASH (round 17, guide §3.1): stale checkpoint stats under
    // the posexplode made the planner sort both multi-million-row sides
    // by h for a sort-merge join; a per-partition hash build skips the
    // sorts, and the self-join's identical child subplans still share
    // one exchange
    val cands = prefixes.alias("a").hint("shuffle_hash")
      .join(
        prefixes.alias("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") < col(s"b.$idCol")
          && col("a.nsh") * lit(threshold) <= col("b.nsh")
          && col("b.nsh") * lit(threshold) <= col("a.nsh")
      )
      .select(
        col(s"a.$idCol").as("id_a"), col("a.nsh").as("nsh_a"), col("a.pos").as("pos_a"),
        col(s"b.$idCol").as("id_b"), col("b.nsh").as("nsh_b"), col("b.pos").as("pos_b")
      )
      .groupBy("id_a", "id_b", "nsh_a", "nsh_b")
      .agg(min(col("pos_a")).as("pa"), min(col("pos_b")).as("pb"))
      .filter(ubound.cast("double") + 1e-9 >= alpha)
      .select("id_a", "id_b")
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
    cands
      .join(hashed.select(col(idCol).as("id_a"), col("hs").as("hs_a"), col("nsh").as("nsh_a")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("hs").as("hs_b"), col("nsh").as("nsh_b")), Seq("id_b"))
      .withColumn("jacc", inter / (col("nsh_a") + col("nsh_b") - inter))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "jacc")
  }

  /** ASYMMETRIC shingle-containment join: directed pairs (a, b) with
    * |A ∩ B| / |A| >= t — "most of A's shingles appear in B". Jaccard
    * (ngramJaccardPairs) misses exactly the pairs this catches: a quote,
    * an excerpt, or a doc embedded in a much larger one has high
    * containment but low Jaccard (the size filter t·|A| <= |B| <= |A|/t
    * prunes them BY DESIGN there). Containment is the dedup relation for
    * partial-copy detection (Broder's "roughly contained", SEQUENCES'97).
    *
    * Sub-quadratic by the one-sided prefix filter: |A ∩ B| >= ceil(t·|A|)
    * forces the intersection to hit A's first |A| - ceil(t·|A|) + 1
    * shingles under any total order shared by both sides (else the
    * intersection fits inside A's last ceil(t·|A|) - 1 positions — too
    * small). So only A's rare-first prefix joins, against B's FULL
    * rare-first list (B is unbounded above — that is the point), with
    * the size filter |B| >= t·|A| (intersection can't exceed |B|) and
    * the PPJoin positional bound 1 + min(|A|-pa-1, |B|-pb-1) >= t·|A|
    * (both lists share the global (df, h) order, so the first shared
    * shingle's positions cap the achievable overlap). Exact intersect
    * verifies inline; like ngramJaccardPairs the result is
    * hash-independent, so shingles ride the codegen'd xxhash64.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0, "prefix filtering requires a positive threshold")
    val hashed = docs
      .select(
        col(idCol),
        array_sort(
          array_distinct(
            transform(shingleSet(col(textCol), shingleN), g => xxhash64(g))
          )
        ).as("hs")
      )
      .withColumn("nsh", size(col("hs")))
      .filter(col("nsh") > 0)
      .localCheckpoint(false)
    val ex = hashed.select(col(idCol), col("nsh"), explode(col("hs")).as("h"))
    val freq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    // rare-first reorder under the shared (df, h) total order, kept as a
    // plain array; checkpointed because BOTH join sides slice from it.
    // (round 17: a pinned repartition(id) before this reorder and a
    // SHUFFLE_HASH hint on the candidate join were both tried and
    // MEASURED SLOWER here — paired 4-run bench 9.23 -> 9.81 s and
    // 9.23 -> 16.77 s respectively: the stats-driven broadcast of the
    // full posting side is what makes this exact-truth baseline fast at
    // audit scale, and the reorder is not on its warm critical path.
    // ngramJaccardPairs keeps both changes, where they measured faster.)
    val ordered = ex
      .join(freq, Seq("h"))
      .groupBy(col(idCol), col("nsh"))
      .agg(transform(sort_array(collect_list(struct(col("df"), col("h")))), x => x("h")).as("sg"))
      .localCheckpoint(false)
    val prefixLen = (col("nsh") - ceil(lit(threshold) * col("nsh")) + 1).cast("int")
    val prefixes = ordered.select(
      col(idCol), col("nsh"),
      posexplode(slice(col("sg"), lit(1), prefixLen)).as(Seq("pos", "h")))
    val full = ordered.select(
      col(idCol), col("nsh"),
      posexplode(col("sg")).as(Seq("pos", "h")))
    // candidates stay NARROW (ids/sizes/positions); arrays re-join after
    // the pair aggregation so prefix multiplicity never shuffles an array
    val needed = ceil(lit(threshold) * col("nsh_a"))
    val ubound = lit(1) + least(col("nsh_a") - col("pa") - 1, col("nsh_b") - col("pb") - 1)
    val cands = prefixes.alias("a")
      .join(
        full.alias("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") =!= col(s"b.$idCol")
          && col("b.nsh") >= lit(threshold) * col("a.nsh")
      )
      .select(
        col(s"a.$idCol").as("id_a"), col("a.nsh").as("nsh_a"), col("a.pos").as("pos_a"),
        col(s"b.$idCol").as("id_b"), col("b.nsh").as("nsh_b"), col("b.pos").as("pos_b")
      )
      .groupBy("id_a", "id_b", "nsh_a", "nsh_b")
      .agg(min(col("pos_a")).as("pa"), min(col("pos_b")).as("pb"))
      .filter(ubound.cast("double") + 1e-9 >= needed)
      .select("id_a", "id_b")
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs_a"), col("hs_b")).cast("double")
    cands
      .join(hashed.select(col(idCol).as("id_a"), col("hs").as("hs_a"), col("nsh").as("nsh_a")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("containment", inter / col("nsh_a"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Bottom-k sketch SCREEN for the containment join, with its audit —
    * the q147/q154/q170 shape applied to q173. containmentPairs' exact
    * one-sided prefix still explodes (1-t)·|A|+1 shingles per doc; the
    * bottom-k screen joins a CONSTANT k hashes per doc instead: under a
    * uniform hash, A's k smallest shingle hashes are a uniform random
    * k-subset of A, so the fraction of them found anywhere in B is an
    * unbiased estimate of |A∩B|/|A| (Broder's bottom-k containment,
    * SEQUENCES'97 — the Mash-screen estimator). Pairs pass the screen at
    * m >= ceil(screenFrac·k) with screenFrac < threshold so recall is
    * traded explicitly, never silently.
    *
    * Output: one row per k — (k, n_truth, n_candidates, n_hit, recall,
    * precision) against the EXACT containmentPairs truth at `threshold`.
    * All counts BIGINT; the two ratios are single exact IEEE divides.
    * Hashes are md5-derived (positive 60-bit, ascending sort = uniform
    * sample) so a SQL oracle reproduces the sample bit-for-bit; when
    * k >= |A| the sample IS A and the screen equals exact containment
    * >= screenFrac (the spec pins this degenerate-exactness property).
    *
    * AUDIT-SCALE bound: the audit certifies a screen CONFIG, not the
    * corpus, so the whole audit — sketch side, postings, AND the exact
    * containmentPairs truth — runs on a corpus-scaled 1-in-m id spread
    * (m = max(1, N div sampleTarget)). The exact containment join is
    * precisely the scale casualty the screen exists to avoid; it must
    * never itself run at corpus scale. m = 1 at oracle scales, so the
    * audited numbers there are the unsampled ones.
    */
  def containmentScreenAudit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      ks: Seq[Int],
      screenFrac: Double,
      sampleTarget: Long
  ): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "sample sizes must be positive")
    require(screenFrac > 0 && screenFrac <= threshold,
      "screen must not be stricter than the audited threshold")
    require(sampleTarget >= 1, "audit sample target must be positive")
    // checkpoint the SAMPLE itself, not just frames derived from it:
    // containmentPairs fans its input into several self-join legs, and
    // without the barrier each leg re-executes the corpus scan +
    // sampling subtree (measured: the h10 audit spent ~6x its bounded
    // cost re-scanning the corpus it had already sampled away)
    val sampledDocs = Sampling.oneInM(docs, idCol, sampleTarget,
        spreadTo = docs.sparkSession.sparkContext.defaultParallelism)
      .drop("m").localCheckpoint(false)
    val hashed = sampledDocs
      .select(
        col(idCol),
        hashedShingles(col(textCol), shingleN).as("hs"))
      .withColumn("nsh", size(col("hs")))
      .filter(col("nsh") > 0)
      .localCheckpoint(false) // feeds the sample side, the postings, and the truth
    val full = hashed.select(col(idCol).as("id_b"), explode(col("hs")).as("h"))
    val sampled = hashed
      .select(col(idCol).as("id_a"), col("hs"), col("nsh"),
        explode(array(ks.map(lit(_)): _*)).as("k"))
      .select(col("id_a"), col("k"), least(col("k"), col("nsh")).as("ka"),
        explode(slice(col("hs"), lit(1), least(col("k"), col("nsh")))).as("h"))
    val m = sampled.join(full, Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("k", "id_a", "id_b", "ka").agg(count(lit(1)).as("m"))
    val cands = m.filter(col("m") >= ceil(lit(screenFrac) * col("ka")))
    val truth = containmentPairs(sampledDocs, idCol, textCol, shingleN, threshold)
      .select(col("id_a"), col("id_b"), lit(1L).as("is_true"))
      .localCheckpoint(false) // probed by the hit join AND the n_truth agg
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val perK = cands.join(truth, Seq("id_a", "id_b"), "left")
      .groupBy("k")
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("is_true"), lit(0L))).as("n_hit"))
    // every swept k reports, even one whose screen passes NOTHING — a
    // badly-tuned config must show n_candidates = 0, not vanish
    val ksDf = docs.sparkSession.range(1)
      .select(explode(array(ks.map(lit(_)): _*)).as("k"))
    ksDf.join(perK, Seq("k"), "left")
      .crossJoin(broadcast(nTruth))
      .select(col("k").cast("long").as("k"), col("n_truth"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        // nullif: a corpus can have an EMPTY exact truth set (no pair
        // reaches the threshold — e.g. a Zipf vocabulary at t=0.7);
        // recall is undefined there, not a divide-by-zero crash —
        // and a zero-candidate screen has undefined precision
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          nullif(col("n_truth"), lit(0L))).as("recall"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          nullif(coalesce(col("n_candidates"), lit(0L)), lit(0L))).as("precision"))
  }

  /** Incremental CONTAINMENT screen — the ingest-time question
    * containmentPairs answers in batch: is this NEW document an excerpt
    * / partial copy of something already in the corpus (>= t of its
    * shingles inside one existing doc)? Returns every incoming id with
    * its container count; kept = no container. The containment twin of
    * incrementalHammingScreen / incrementalNearDupFilter, and the shape
    * decontamination-on-arrival runs: corpus-side self-pairs are NEVER
    * generated (the quadratic bulk of a batch containmentPairs run).
    *
    * Same one-sided prefix filter: only the incoming doc's rare-first
    * prefix joins, against the corpus's FULL posting list. Both sides
    * order by (corpus df, h) — a total order shared by construction;
    * incoming-only shingles take df 0 (rarest, so they front-load the
    * prefix — exactly right: a shingle absent from the corpus can only
    * appear in prefixes, never postings, and prunes for free). Docs with
    * no shingles (shorter than the shingle width) have no containment
    * evidence and are kept. At 100 TB the corpus posting list is the
    * persisted term index; incoming shuffles into it, the corpus never
    * moves.
    */
  def incrementalContainmentScreen(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double
  ): DataFrame = {
    require(threshold > 0, "prefix filtering requires a positive threshold")
    def hashedOf(df: DataFrame): DataFrame = df
      .select(
        col(idCol),
        array_sort(
          array_distinct(
            transform(shingleSet(col(textCol), shingleN), g => xxhash64(g))
          )
        ).as("hs")
      )
      .withColumn("nsh", size(col("hs")))
    val hi = hashedOf(incoming).localCheckpoint(false) // prefix side + output spine
    val hc = hashedOf(corpus).filter(col("nsh") > 0).localCheckpoint(false)
    val exC = hc.select(col(idCol), col("nsh"), explode(col("hs")).as("h"))
    val freq = exC.groupBy("h").agg(count(lit(1)).as("df"))
    def rareFirst(ex: DataFrame, joinType: String): DataFrame = ex
      .join(freq, Seq("h"), joinType)
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy(col(idCol), col("nsh"))
      .agg(transform(sort_array(collect_list(struct(col("df"), col("h")))), x => x("h")).as("sg"))
    val prefixLen = (col("nsh") - ceil(lit(threshold) * col("nsh")) + 1).cast("int")
    val prefA = rareFirst(
        hi.filter(col("nsh") > 0)
          .select(col(idCol), col("nsh"), explode(col("hs")).as("h")), "left")
      .select(col(idCol), col("nsh"),
        posexplode(slice(col("sg"), lit(1), prefixLen)).as(Seq("pos", "h")))
    val fullB = rareFirst(exC, "inner")
      .select(col(idCol).as("c_id"), col("nsh").as("c_nsh"),
        posexplode(col("sg")).as(Seq("c_pos", "h")))
    val needed = ceil(lit(threshold) * col("nsh"))
    val ubound = lit(1) + least(col("nsh") - col("pa") - 1, col("c_nsh") - col("pb") - 1)
    val cands = prefA
      .join(fullB, Seq("h"))
      .filter(col("c_nsh") >= lit(threshold) * col("nsh"))
      .groupBy(col(idCol), col("c_id"), col("nsh"), col("c_nsh"))
      .agg(min(col("pos")).as("pa"), min(col("c_pos")).as("pb"))
      .filter(ubound.cast("double") + 1e-9 >= needed)
      .select(col(idCol), col("c_id"))
    val inter = org.apache.spark.sql.graft.LongArrayIntersectSize
      .column(col("hs"), col("c_hs")).cast("double")
    val hits = cands
      .join(hi.select(col(idCol), col("hs"), col("nsh")), Seq(idCol))
      .join(hc.select(col(idCol).as("c_id"), col("hs").as("c_hs")), Seq("c_id"))
      .filter(inter / col("nsh") >= threshold)
      .groupBy(idCol).agg(count(lit(1)).as("n_containers"))
    hi.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_containers"), lit(0L)).as("n_containers"))
      .withColumn("kept", col("n_containers") === 0)
  }

  /** Bottom-k containment SCREEN with a document-frequency stop cut —
    * the constant-cost-per-doc SERVING form of the sketch q183 audits
    * (Broder's bottom-k containment estimate, SEQUENCES'97 / the Mash
    * screen), plus the q159 df trick applied to shingles.
    *
    * incrementalContainmentScreen's exact prefix filter still probes
    * (1-t)·|A|+1 shingles per doc, and each probe costs that shingle's
    * corpus df — on a saturated shingle space (every shingle a head
    * shingle, the flat-vocab testdata) that is df ∝ N per probe, a
    * quadratic total (measured: exponent 1.38 flat / 0.78 Zipf at 10×).
    * Here each incoming doc probes only its k SMALLEST md5 shingle
    * hashes — a uniform random k-subset of A under a uniform hash, so
    * the fraction found in B estimates |A∩B|/|A| — and probes skip
    * shingles whose corpus df exceeds `dfCap`: a shingle in hundreds of
    * docs certifies nothing about copying (it co-occurs with everything),
    * yet carries the entire join blowup. Capped sampled hashes still
    * COUNT toward a candidate's evidence m (df > cap means the container
    * almost surely has them) but can never CREATE a candidate — exactly
    * q159's stop-term semantics. Join cost per incoming doc is <= k·dfCap
    * rows BY CONSTRUCTION, independent of corpus size.
    *
    * Screening (not verification): a pair passes at
    * m >= ceil(screenFrac·ka); recall is traded explicitly by
    * screenFrac < threshold (the q183 audit measures exactly this
    * trade). Docs with no shingles have no evidence and are kept.
    * Output: (id, n_containers, kept) — q175's shape.
    */
  def bottomKContainmentScreen(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      k: Int,
      screenFrac: Double,
      dfCap: Long
  ): DataFrame = {
    val post = containmentPostings(corpus, idCol, textCol, shingleN)
      .localCheckpoint(false) // feeds the df table AND the probe join
    bottomKContainmentScreenOnPostings(incoming, post, postingDf(post),
      idCol, textCol, shingleN, k, screenFrac, dfCap)
  }

  /** The corpus-side POSTING LIST of the containment screens — one
    * (c_id, h) row per distinct md5 shingle hash per corpus doc. This is
    * the persistable half of a term index: at 100 TB ingest writes it
    * ONCE (bucketed by `h`, the probe-join key) and every later screen —
    * batch or per-micro-batch streaming — reads it back instead of
    * re-shingling the corpus (the q132 persisted-signature-table story,
    * applied to the containment family). md5-derived hashes so a SQL
    * oracle reproduces the bottom-k sample bit-for-bit.
    */
  def containmentPostings(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int
  ): DataFrame = corpus
    .select(
      col(idCol).as("c_id"),
      hashedShingles(col(textCol), shingleN).as("hs"))
    // no size(hs) > 0 filter: explode already emits nothing for empty or
    // null arrays, and an explicit filter on a HOF-derived column gets
    // substituted + pushed below any upstream exchange — re-running the
    // whole shingling single-core on an under-partitioned scan (measured
    // 7.2 s vs 1.3 s on the sf0.1 corpus side)
    .select(col("c_id"), explode(col("hs")).as("h"))

  /** The DICTIONARY half of the term index: per shingle hash, its corpus
    * document frequency — the df stop-cut table of the bottom-k screen.
    */
  def postingDf(postings: DataFrame): DataFrame =
    postings.groupBy("h").agg(count(lit(1)).as("df"))

  /** As `bottomKContainmentScreen`, but the corpus side arrives as a
    * pre-built term index — `post` in `containmentPostings` shape and
    * `freq` in `postingDf` shape. The streaming entry point: a
    * foreachBatch gate builds (or reads) the index ONCE and every
    * micro-batch pays only its own bottom-k probes (<= k·dfCap posting
    * rows per doc), never a corpus-side rebuild — without this split the
    * per-batch screen re-shingled the whole static corpus, the dominant
    * cost at any scale. Callers should materialize both frames
    * (localCheckpoint locally; a bucketed table in production).
    */
  def bottomKContainmentScreenOnPostings(
      incoming: DataFrame,
      post: DataFrame,
      freq: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      k: Int,
      screenFrac: Double,
      dfCap: Long
  ): DataFrame = {
    require(k >= 1 && dfCap >= 1 && screenFrac > 0 && screenFrac <= 1,
      "bottom-k screen needs k >= 1, dfCap >= 1, screenFrac in (0, 1]")
    val hi = incoming
      .select(
        col(idCol),
        hashedShingles(col(textCol), shingleN).as("hs"))
      .withColumn("nsh", size(col("hs")))
      .localCheckpoint(false) // sample side + output spine, shared by q190-sized slices
    // the probe's hash set is <= k rows per incoming doc — SEMI-FILTER
    // the corpus-side index with it instead of joining into it: when
    // the probe side is broadcastable the dictionary and posting frames
    // are only ever scanned map-side (a cached scan locally, a
    // bucketed-table scan in production) and the screen — in particular
    // a per-micro-batch streaming one — never pays a corpus-sized
    // exchange. The broadcast decision is AQE's, NOT a hint: the probe
    // set grows linearly with the incoming batch (k·|incoming| rows), so
    // a hardwired broadcast() that is right for a micro-batch would pin
    // a multi-GB build on every executor when a BULK slice (q190's
    // shape at full scale) probes the same index — the runtime picks
    // broadcast under the threshold and a plain shuffle join above it,
    // and answers are identical either way
    val sampledRaw = hi.filter(col("nsh") > 0)
      .select(col(idCol), least(lit(k), col("nsh")).as("ka"),
        explode(slice(col("hs"), lit(1), least(lit(k), col("nsh")))).as("h"))
    val dictHit = freq
      .join(sampledRaw.select("h").distinct(), Seq("h"), "left_semi")
    val sampled = sampledRaw
      .join(dictHit, Seq("h"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .localCheckpoint(false) // feeds the stop count AND the rare probe
    // per-doc count of capped sampled hashes: evidence every join-made
    // candidate container gets for free (df > cap ⇒ it has them)
    val nCap = sampled.groupBy(col(idCol), col("ka"))
      .agg(sum(when(col("df") > dfCap, 1L).otherwise(0L)).as("n_cap"))
    // df is a GLOBAL property of a hash, so a semi hit on the sample's
    // rare (df <= dfCap) hashes already satisfies the corpus-side df cut
    // — no posting-to-dictionary join at all; per-doc probe volume stays
    // <= k*dfCap rows by construction
    val rareHit = post
      .join(sampled.filter(col("df") <= dfCap).select("h").distinct(),
        Seq("h"), "left_semi")
    val mRare = rareHit
      .join(sampled.filter(col("df") <= dfCap).select(col(idCol), col("h")),
        Seq("h"))
      .filter(col(idCol) =!= col("c_id"))
      .groupBy(col(idCol), col("c_id")).agg(count(lit(1)).as("m_rare"))
    val hits = mRare.join(nCap, Seq(idCol))
      .filter(col("m_rare") + col("n_cap") >= ceil(lit(screenFrac) * col("ka")))
      .groupBy(idCol).agg(count(lit(1)).as("n_containers"))
    hi.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_containers"), lit(0L)).as("n_containers"))
      .withColumn("kept", col("n_containers") === 0)
  }

  /** Collapse near-dup PAIRS into duplicate groups: every doc gets
    * `keep_id` = the minimum doc id in its connected component of the
    * pair graph (keep-one dedup — the actual "dedup" a training-data
    * pipeline needs; an edge list alone drops nothing. The reference's
    * helper dedups with a set(),
    * /root/reference/src/example_helpers/parse_inputs.py:27-35).
    *
    * Iterative min-label propagation WITH pointer jumping: each round
    * every vertex takes the min over (its label, neighbors' labels, its
    * label's label). The shortcut through the label table compresses
    * label chains, so rounds scale with the log of component diameter
    * rather than the diameter itself — but the constant is NOT the
    * ideal halving (propagation and jumping interleave through one min,
    * and a fresh frontier's labels arrive unjumped), so give the loop
    * comfortable headroom: maxIter 64 (q192's 50k-node mutual-kNN graph
    * empirically needs more than 25 where the 500-node gate converged
    * well inside it; rounds are cheap and the loop exits on
    * convergence).
    * Each round is one edge join + one label self-join + one min
    * aggregation, all distributed (the driver loop only counts changed
    * labels; no vertex data ever reaches the driver). localCheckpoint
    * truncates the growing lineage per round. Throws if maxIter rounds
    * were insufficient rather than returning silently-wrong labels.
    */
  def resolveGroups(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIter: Int = 64
  ): DataFrame = {
    // a non-integral id would silently cast to null below and propagate
    // garbage keep_ids — reject it up front (fail-loudly contract)
    val idType = docs.schema(idCol).dataType
    require(
      Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(idType),
      s"resolveGroups requires an integral id column; '$idCol' is $idType")
    // materialize the edge list ONCE: `pairs` is usually an expensive
    // pipeline (LSH near-dup detection), and every propagation round plus
    // every convergence check would otherwise re-run it from scratch
    // freshCheckpoint, not plain localCheckpoint: the loop below joins
    // checkpointed frames against each other every round, and Spark's
    // checkpoint INHERITS the child plan's size estimate — the estimate
    // would be squared per round until Catalyst's stats visitor overflows
    // BigInteger during planning (see CheckpointStats' scaladoc)
    // hash-partitioned by src BEFORE the checkpoint: freshCheckpoint now
    // preserves output partitioning (round 17), so every round's edge-
    // propagation join reads the edge list pre-clustered on its join key
    // instead of re-exchanging it each round
    val edges = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .repartition(col("src")))
    // iterate ONLY over edge-touched vertices: at realistic near-dup
    // density (~0.02% of pairs at j>=0.8 on this corpus) the propagation
    // frames are orders of magnitude smaller than the corpus; every
    // untouched doc is a singleton (keep_id = id) and is merged back in
    // one final left join instead of riding through every round
    // seed with min(id, min neighbor) — the old id->id seed spent the
    // whole first round discovering exactly this, for the same shuffle
    // cost as the distinct() it replaces (round-17 optimization: the
    // loop's fixed per-round cost dominates at bench scale, and every
    // label candidate below is still a component member, so the fixpoint
    // — component-min labels — is unchanged)
    var labels = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      edges
        .groupBy("src")
        .agg(min("dst").as("mn"))
        .select(col("src").as("id"), least(col("src"), col("mn")).as("keep_id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val trr0 = System.nanoTime()
      def lap(tag: String): Unit = if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[resolveGroups] round $iter $tag ${(System.nanoTime() - trr0) / 1e6}%.0f ms")
      // ONE lookup join per round (round-17 optimization): edge
      // propagation ("give dst the label of src") and pointer jumping
      // ("give v the label of its label") are both lookups of
      // labels(key) delivered to a receiver — union the two request
      // frames first and resolve them with a single join instead of the
      // old prop-join + jump-join pair. Same candidates, same fixpoint,
      // identical round count — but the loop's dominant cost at bench
      // scale is PER-STAGE fixed overhead (each exchange is an AQE
      // stage materialization: measured ~13 mini-jobs/round, 4-30 ms of
      // tasks each, wall ~0.45 s/round on KB-sized frames), and this
      // halves the exchanges per round. At cluster scale the same fusion
      // halves the number of shuffle barriers per round.
      val requests = edges
        .select(col("dst").as("id"), col("src").as("k"))
        .union(labels.select(col("id"), col("keep_id").as("k")))
      val looked = requests
        .join(labels.select(col("id").as("k"), col("keep_id").as("lbl")), Seq("k"))
        .select(col("id"), col("lbl").as("keep_id"),
          lit(null).cast("long").as("old_keep"))
      // the previous label rides along as `old_keep` (max ignores the
      // nulls from the lookup branch), so the convergence check is a
      // scan of THIS checkpointed frame — no extra join+shuffle per
      // round. LAZY checkpoint (round 17): the convergence count below
      // is the materializing action, so each round pays ONE driver-side
      // action instead of checkpoint-job + count-job.
      val next = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
        labels
          .select(col("id"), col("keep_id"), col("keep_id").as("old_keep"))
          .union(looked)
          .groupBy("id")
          .agg(min("keep_id").as("keep_id"), max("old_keep").as("old_keep")),
        eager = false)
      lap("checkpoint")
      val tr0 = System.nanoTime()
      changed = next.filter(col("keep_id") =!= col("old_keep")).count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[resolveGroups] round $iter changed=$changed countMs=${(System.nanoTime() - tr0) / 1e6}%.0f")
      labels = next.select("id", "keep_id")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"resolveGroups did not converge in $maxIter rounds ($changed labels still changing)")
    docs
      .select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("keep_id"), col("id")).as("keep_id"))
  }

  /** Quality-aware dedup resolution: collapse near-dup pairs into groups
    * (resolveGroups) and keep the BEST document of each group by
    * `qualityCol` (ties -> smallest id) instead of the arbitrary min-id
    * survivor — what a training-data pipeline actually wants ("of these
    * near-identical pages, keep the longest/highest-quality one").
    *
    * Output: one row per doc — (id, group_id, best_id, kept). The argmax
    * is a per-group WindowGroupLimit (rank-1 rows truncate inside each
    * partition); both joins are keyed by doc/group id. No global state.
    */
  def keepBest(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      qualityCol: String
  ): DataFrame = {
    val groups = resolveGroups(docs, idCol, pairs)
      .select(col(idCol), col("keep_id").as("group_id"))
    val j = groups.join(docs.select(col(idCol), col(qualityCol)), Seq(idCol))
    val w = Window.partitionBy("group_id").orderBy(col(qualityCol).desc, col(idCol).asc)
    val best = j
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("group_id"), col(idCol).as("best_id"))
    j.join(best, Seq("group_id"))
      .select(col(idCol), col("group_id"), col("best_id"),
        (col(idCol) === col("best_id")).as("kept"))
  }

  /** SimHash near-dup candidate pairs via multi-index hamming banding:
    * the signature's `bits` bits split into `maxHamming + 1` contiguous
    * bands — pigeonhole: hamming(a, b) <= maxHamming means at most
    * maxHamming bands differ, so at least one band is bit-identical.
    * An equi-join on (band, band bits) finds every qualifying pair, exact
    * hamming verifies, and no cross join appears anywhere in the plan.
    */
  def simhashCandidates(
      docs: DataFrame,
      idCol: String,
      shCol: String,
      bits: Int = 16,
      maxHamming: Int = 2
  ): DataFrame =
    simhashBandPairs(docs, idCol, shCol, bits, numBands = maxHamming + 1)
      .filter(col("hamming") <= maxHamming)

  /** Distinct band-collision pairs (id_a < id_b, exact hamming attached)
    * for ONE contiguous-band layout of a simhash column — the shared
    * candidate stage of `simhashCandidates` (filtered) and
    * `simhashTuningAudit` (counted raw: the candidate volume IS the
    * shuffle cost a banding decision is buying).
    */
  /** Contiguous-band explode of a hamming-space signature column:
    * (idCol, shCol, band, key) — the shared candidate-key stage of the
    * simhash self-join pairs, the tuning audit, and the incremental
    * (incoming vs corpus) screens. `shiftright` sign-extends, but the
    * band mask bounds every key to its band width, so 64-bit signatures
    * with the sign bit set band correctly too.
    */
  def hammingBands(
      docs: DataFrame,
      idCol: String,
      shCol: String,
      bits: Int,
      numBands: Int
  ): DataFrame =
    docs.select(
      col(idCol), col(shCol),
      posexplode(
        array((0 until numBands).map { b =>
          val lo = b * bits / numBands
          val hi = (b + 1) * bits / numBands
          shiftright(col(shCol), lo).bitwiseAND(lit((1L << (hi - lo)) - 1))
        }: _*)
      ).as(Seq("band", "key"))
    )

  private def simhashBandPairs(
      docs: DataFrame,
      idCol: String,
      shCol: String,
      bits: Int,
      numBands: Int
  ): DataFrame = {
    val banded = hammingBands(docs, idCol, shCol, bits, numBands)
    // self-join with the rename AFTER the join: both sides canonicalize to
    // the same plan so ReuseExchange materializes the banded shuffle once
    banded.alias("a")
      .join(
        banded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol")
      )
      .select(
        col(s"a.$idCol").as("id_a"), col(s"a.$shCol").as("sh_a"),
        col(s"b.$idCol").as("id_b"), col(s"b.$shCol").as("sh_b")
      )
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
  }

  /** SimHash BANDING-PARAMETER AUDIT — the `lshTuningAudit` shape applied
    * to the hamming-banding family: for each band count over ONE shared
    * simhash table, the candidate-pair volume (the shuffle-cost knob) vs
    * how many true hamming<=maxHamming pairs it captures (the recall
    * knob) and the false-positive fraction of its candidates (the verify-
    * cost knob). Unlike MinHash banding, truth here is EXACT, not a
    * sample estimate of itself: `maxHamming + 1` contiguous bands are a
    * provably lossless index for the hamming<=maxHamming ball
    * (pigeonhole — at most maxHamming bands differ, so one is
    * bit-identical), so the truth set = that layout's candidates filtered
    * by exact hamming, and every config's recall is measured against the
    * complete true pair set of the sampled docs. Fewer bands than
    * maxHamming+1 trade recall for radically smaller band keys; more
    * bands keep recall 1.0 but widen every bucket (shorter keys -> more
    * collisions -> more exact-hamming verifies). The audit runs on a
    * corpus-scaled 1-in-m doc sample (m = max(1, N div sampleTarget),
    * broadcast 1-row m, identity at oracle scales) because EVERY banding's
    * pair volume is corpus-quadratic in the worst case — bounded
    * O(target^2) audit cost at any corpus size, the q147 convention.
    */
  def simhashTuningAudit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int,
      bandConfigs: Seq[Int],
      maxHamming: Int,
      sampleTarget: Long = 1000L
  ): DataFrame = {
    require(bandConfigs.forall(nb => nb >= 1 && nb <= bits) && maxHamming + 1 <= bits,
      "band configs must be 1..bits bands (above bits every band is zero-width: " +
        "all docs share key 0 and the candidate stage goes all-pairs) and the " +
        "truth layout needs one bit per band")
    // sample FIRST and checkpoint: the barrier keeps the per-doc simhash
    // fold above the broadcast-m filter (the lshTuningAudit lesson —
    // without it the optimizer inlines the hashing below the join and
    // hashes the whole corpus for a bounded audit)
    val docsS = Sampling.oneInM(docs, idCol, sampleTarget)
      .localCheckpoint(false)
    hammingBandTuningAudit(
      docsS.select(col(idCol), simhash(col(textCol), bits).as("sh")),
      idCol, "sh", bits, bandConfigs, maxHamming)
  }

  /** The audit core of `simhashTuningAudit` over an ALREADY-COMPUTED
    * hamming-space signature column — usable for any 64-bit-or-narrower
    * signature family (simhash, perceptual dHash): per band count, the
    * candidate volume, recall against the EXACT hamming<=maxHamming pair
    * set (maxHamming+1 contiguous bands are lossless by pigeonhole, so
    * the truth is complete), and the candidate false-positive fraction.
    * Caller is responsible for bounding `sig`'s row count (the audit's
    * pair stages are sample-quadratic in the worst case).
    */
  def hammingBandTuningAudit(
      sig: DataFrame,
      idCol: String,
      shCol: String,
      bits: Int,
      bandConfigs: Seq[Int],
      maxHamming: Int
  ): DataFrame = {
    require(bandConfigs.forall(nb => nb >= 1 && nb <= bits) && maxHamming + 1 <= bits,
      "band configs must be 1..bits bands and the truth layout needs one bit per band")
    // one signature table feeds every config's band explode + the truth
    val sh = sig.localCheckpoint(false)
    val truth = simhashBandPairs(sh, idCol, shCol, bits, numBands = maxHamming + 1)
      .filter(col("hamming") <= maxHamming)
    val totals = truth.agg(count(lit(1)).as("n_true_total"))
    bandConfigs.map { nb =>
      simhashBandPairs(sh, idCol, shCol, bits, nb)
        .agg(
          count(lit(1)).as("n_candidates"),
          sum(when(col("hamming") <= maxHamming, 1L).otherwise(0L)).as("n_true_found"))
        .select(lit(nb.toLong).as("bands"), col("n_candidates"), col("n_true_found"))
        .crossJoin(broadcast(totals))
        .withColumn("recall",
          expr("CAST(n_true_found AS DOUBLE) / nullif(n_true_total, 0)"))
        .withColumn("fp_rate",
          expr("CAST(n_candidates - n_true_found AS DOUBLE) / nullif(n_candidates, 0)"))
    }.reduce(_.unionAll(_))
  }
}
