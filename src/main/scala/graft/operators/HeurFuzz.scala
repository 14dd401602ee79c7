package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Fuzz, TextFunctions}
import graft.sources.Readers

/** The reference's entire query, re-expressed as one lazy Spark DAG
  * (/root/reference/src/heurFuzz.py:138-170):
  *
  *   read queries + refs (strip, stable row ids)
  *     -> project byte length + byte bigrams
  *     -> pair generation (crossJoin(broadcast(queries)) by default, or an
  *        inverted-index equi-join on bigram for the scale path, SURVEY §4.3)
  *     -> per-pair coverage + abs length difference
  *     -> per-query top-K window ordered desc(coverage, len_diff, ref_id)
  *        (/root/reference/src/heurFuzz.py:81-90; lexsort-derived total
  *        order validated against example/output.txt, SURVEY §2.1)
  *     -> partial_ratio verify with score cutoff, lowercased
  *        (/root/reference/src/heurFuzz.py:96-112)
  *     -> per-query argmax ordered desc(score), asc(len_diff), desc(ref_id)
  *        (/root/reference/src/heurFuzz.py:113-125)
  *     -> left join back to queries, NA coalesce, input-order TSV sink
  *        (/root/reference/src/heurFuzz.py:131-136)
  *
  * Scale notes (100 TB design):
  *   - The query side is broadcast (the reference's real workload has few
  *     queries vs millions of refs, parse_inputs.py:48); refs stream
  *     through executors without a shuffle until the top-K window's
  *     partitionBy(q_id) shuffle, which carries only
  *     (q_id, ref_id, ref term, coverage, len_diff) — not the raw pair
  *     matrix the reference materializes densely in RAM.
  *   - `useInvertedIndex = true` replaces the O(|r|x|q|) nested loop with
  *     an equi-join on bigram values: pairs sharing zero bigrams never
  *     materialize. A per-query fallback cross join covers queries that
  *     get fewer than K indexed candidates, so results stay identical.
  */
object HeurFuzz {

  /** CLI defaults per the reference (/root/reference/src/heurFuzz.py:177-179).
    * bufferSize is accepted and ignored: Spark strings are not fixed-width
    * (documented divergence).
    */
  case class Params(
      topK: Int = 10,
      scoreCutoff: Int = 90,
      bufferSize: Int = 500,
      useInvertedIndex: Boolean = false
  )

  /** partial_ratio with cutoff as a Spark UDF — kept as the simple
    * comparison surface; the pipeline uses the codegen'd Catalyst
    * expression (graft.expressions.PartialRatioCutoff), which calls the
    * same audited scorer without the ScalaUDF wrapper.
    */
  def partialRatioCutoffUdf(cutoff: Int) =
    udf((a: String, b: String) => Fuzz.partialRatioCutoff(a, b, cutoff))

  /** Add byte length + byte bigrams to a (id, term) frame, prefixing
    * column names (q_/r_).
    */
  def prepare(df: DataFrame, p: String): DataFrame =
    df.select(
      col("id").as(s"${p}id"),
      col("term").as(s"${p}term"),
      TextFunctions.byteLength(col("term")).as(s"${p}len"),
      TextFunctions.byteBigrams(col("term")).as(s"${p}bigrams")
    )

  /** Brute-force pair stage (bit-faithful to the reference's dense loops,
    * /root/reference/src/heurFuzz.py:47-70): every (ref, query) pair via
    * BroadcastNestedLoopJoin with the small query side broadcast.
    */
  def pairsCross(queries: DataFrame, refs: DataFrame): DataFrame =
    refs
      .crossJoin(broadcast(queries))
      .withColumn(
        "coverage",
        TextFunctions.bigramCoverage(col("q_bigrams"), col("r_bigrams"))
      )
      .withColumn("len_diff", abs(col("q_len") - col("r_len")).cast("double"))

  /** Scale-path pair stage (SURVEY §4.3): posexplode query bigrams
    * (multiplicity preserved — the reference counts each query bigram
    * occurrence separately, heurFuzz.py:37-43), array_distinct ref bigrams
    * (membership-without-consumption — the `break` at heurFuzz.py:43), then
    * an equi-join on the bigram value and a count per (q_id, r_id).
    * Pairs sharing zero bigrams drop out of the join, so a fallback cross
    * join over only the under-filled queries restores exact top-K parity.
    */
  def pairsInverted(queries: DataFrame, refs: DataFrame, topK: Int): DataFrame = {
    val qx = queries.select(
      col("q_id"), col("q_term"), col("q_len"),
      size(col("q_bigrams")).as("q_nbigrams"),
      explode_outer(col("q_bigrams")).as("bigram")
    )
    val rx = refs.select(
      col("r_id"), col("r_term"), col("r_len"),
      explode(array_distinct(col("r_bigrams"))).as("bigram")
    )
    val joined = rx
      .join(broadcast(qx.filter(col("bigram").isNotNull)), Seq("bigram"))
      .groupBy("q_id", "q_term", "q_len", "q_nbigrams", "r_id", "r_term", "r_len")
      .agg(count(lit(1)).as("hits"))
      .withColumn("coverage", col("hits").cast("double") / col("q_nbigrams"))
      .withColumn("len_diff", abs(col("q_len") - col("r_len")).cast("double"))
      .drop("hits", "q_nbigrams")

    // Queries with < topK indexed candidates fall back to the exact cross
    // join so the emitted candidate set matches pairsCross bit-for-bit.
    // Derived from the FULL query set (left join to the candidate counts),
    // not from `joined` alone: a query with ZERO index candidates (no
    // bigrams at all, or no bigram shared with any ref — the reference
    // still scores those, /root/reference/src/heurFuzz.py:113-125) forms
    // no group in `joined` and would otherwise silently return NA.
    val counts = joined.groupBy("q_id").agg(count(lit(1)).as("n"))
    val starved = queries
      .select(col("q_id"))
      .join(counts, Seq("q_id"), "left")
      .filter(coalesce(col("n"), lit(0L)) < topK)
      .select("q_id")
    val starvedQueries = queries.join(broadcast(starved), Seq("q_id"))
    val fallback = pairsCross(starvedQueries, refs)
      .select("q_id", "q_term", "q_len", "r_id", "r_term", "r_len", "coverage", "len_diff")
    joined
      .join(broadcast(starved.withColumn("starved", lit(true))), Seq("q_id"), "left_anti")
      .select("q_id", "q_term", "q_len", "r_id", "r_term", "r_len", "coverage", "len_diff")
      .unionByName(fallback)
  }

  /** Per-query top-K: the reference's lexsort+tail+reverse net order is
    * desc(coverage, len_diff, ref_id) — including the counter-intuitive
    * LARGEST len_diff first within a coverage tie (code wins over
    * README.md:12; validated vs example/output.txt, SURVEY §2.1).
    * The reference's n_refs<K zero-fill quirk (spurious ref-0 candidates,
    * heurFuzz.py:83-89) is intentionally NOT replicated.
    */
  def topKCandidates(pairs: DataFrame, topK: Int): DataFrame = {
    val w = Window
      .partitionBy("q_id")
      .orderBy(col("coverage").desc, col("len_diff").desc, col("r_id").desc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK).drop("rank")
  }

  /** Verify + reduce: score the K survivors with lowercased partial_ratio
    * (cutoff zeroes in double domain, then uint8 rounding), keep score>0,
    * argmax per query ordered desc(score), asc(len_diff), desc(ref_id)
    * (heurFuzz.py:113-125: np.argmax first-hit over the §2-op-7 candidate
    * order == largest ref_id among min-len_diff score-ties).
    */
  def bestMatches(candidates: DataFrame, scoreCutoff: Int): DataFrame = {
    val scored = candidates
      .withColumn("score",
        org.apache.spark.sql.graft.GraftFunctions.partialRatioCutoff(col("r_term"), col("q_term"), scoreCutoff))
      .filter(col("score") > 0)
    val w = Window
      .partitionBy("q_id")
      .orderBy(col("score").desc, col("len_diff").asc, col("r_id").desc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("q_id"), col("r_term").as("match"), col("score"))
  }

  /** Full match table: every query in input order with its match or "NA"
    * (absence is the literal string "NA" in the reference, heurFuzz.py:115).
    * Returns (q_id, query, match).
    */
  def matchTable(queries: DataFrame, refs: DataFrame, params: Params): DataFrame = {
    val q = prepare(queries, "q_")
    val r = prepare(refs, "r_")
    val pairs =
      if (params.useInvertedIndex) pairsInverted(q, r, params.topK)
      else pairsCross(q, r)
    val best = bestMatches(topKCandidates(pairs, params.topK), params.scoreCutoff)
    q.select(col("q_id"), col("q_term").as("query"))
      .join(best, Seq("q_id"), "left")
      .select(col("q_id"), col("query"), coalesce(col("match"), lit("NA")).as("match"))
  }

  /** Map ratio %: mapped/total*100 rounded to 2dp
    * (/root/reference/src/heurFuzz.py:127-128).
    */
  def mapRatio(matches: DataFrame): Double =
    matches
      .agg(round(avg(when(col("match") =!= "NA", 1.0).otherwise(0.0)) * 100, 2))
      .head()
      .getDouble(0)

  /** End-to-end run on text files, mirroring the reference CLI
    * (/root/reference/src/heurFuzz.py:138-170). Writes the two-column TSV
    * (header `query\tmatch`, input order) and prints the map ratio.
    */
  def run(
      spark: SparkSession,
      queryFile: String,
      refFile: String,
      outputFile: String,
      params: Params = Params()
  ): Double = {
    // step banners for CLI parity (/root/reference/src/heurFuzz.py:140-168);
    // they are log lines, not materialization barriers — the DAG stays lazy
    println("[STEP1] Reading queries and refs...")
    // linesFast: ordering-equivalent ids in one pass (no zipWithIndex
    // count job) — tie-breaks depend only on id order, so output is
    // identical to the contiguous-id reader (golden e2e covers both).
    val queries = Readers.linesFast(spark, queryFile)
    val refs = Readers.linesFast(spark, refFile)
    println("[STEP2-5] Planning lengths, coverage, top-K (lazy single DAG)...")
    val matches = matchTable(queries, refs, params).cache()
    println("[STEP6] Running verify scorer + reduce...")
    val ratio = mapRatio(matches)
    println("[STEP6] Writing output file...")
    Readers.writeTsvFile(matches.select("q_id", "query", "match"), "q_id", outputFile)
    println(f"Map ratio: $ratio%.2f%%")
    matches.unpersist()
    ratio
  }
}
