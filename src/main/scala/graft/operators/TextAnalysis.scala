package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-language stopword lists for the argmax language classifier —
    * shared with the generated oracle SQL (SparkEntry) so they cannot
    * drift. Sorted key order = deterministic tie-break order.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "was", "for", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une")
  )

  /** Argmax language-ID over the stopword lists: scores every language,
    * picks the best (ties -> first language in LangStopwords order, i.e.
    * alphabetical). Returns a (pred_lang, best_score) struct's fields via
    * the two helper methods below.
    */
  def langScore(text: Column, lang: String): Column =
    stopwordRatio(text, LangStopwords.toMap.apply(lang))

  def predictedLang(text: Column): Column = {
    val scored = LangStopwords.map { case (l, _) => (l, langScore(text, l)) }
    def maxOf(cs: Seq[Column]): Column = if (cs.length == 1) cs.head else greatest(cs: _*)
    // strictly-greater chain => earlier (alphabetical) language wins ties
    scored.tail.foldLeft(lit(scored.head._1)) { case (acc, (l, s)) =>
      when(s > maxOf(scored.takeWhile(_._1 != l).map(_._2)), lit(l)).otherwise(acc)
    }
  }

  def bestLangScore(text: Column): Column =
    greatest(LangStopwords.map { case (l, _) => langScore(text, l) }: _*)

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

  /** Gopher-style repetition signals per document: duplicate-word
    * fraction and the most-frequent word bigram's share of all bigrams —
    * the published filters for catching degenerate/boilerplate text that
    * per-token quality metrics miss (a doc can have fine token lengths
    * and stopword ratios while repeating one phrase forever).
    *
    * Scale shape: the per-doc stats are a narrow projection; the top
    * bigram is one groupBy keyed by (doc, bigram) + a per-doc
    * WindowGroupLimit (rn = 1 truncates inside partitions before any
    * sort), and the final join is keyed by doc id — everything partitions
    * by document, nothing is global. Ties on bigram count break to the
    * lexicographically-smallest bigram so results are deterministic.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.whitespaceTokens(lower(col(textCol)))
    // checkpointed: the token arrays feed BOTH the per-doc stats and the
    // bigram explode — without the barrier the regex tokenization (the
    // dominant per-row cost) runs twice (the q114 tokenize-diamond fix)
    val d = docs.select(col(idCol), toks.as("toks")).localCheckpoint(false)
    // narrow per-doc stats — computed before the join so token arrays
    // never travel through a shuffle
    val stats = d.select(
      col(idCol),
      size(col("toks")).cast("long").as("n_words"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
    val bigrams = d
      .select(col(idCol),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("ng"))
      .groupBy(col(idCol), col("ng"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(idCol).orderBy(col("cnt").desc, col("ng").asc)
    val top = bigrams
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("ng"), col("cnt"))
    stats
      .join(top, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_words"),
        when(col("n_words") === 0, lit(0.0))
          .otherwise((col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
          .as("dup_word_frac"),
        coalesce(col("ng"), lit("")).as("top_bigram"),
        when(col("n_words") < 2, lit(0.0))
          .otherwise(col("cnt").cast("double") / (col("n_words") - 1))
          .as("top_bigram_frac"))
  }

  /** TRAINED language identification: char-trigram profiles per language
    * learned from the corpus's own labels, broadcast, and argmax-scored
    * per document — the "derive the lang column instead of trusting it"
    * operator the per-language sampling/budget family (q75/q92) sits on.
    * Unlike `predictedLang` (fixed stopword lists), the model here is
    * data-derived: each language's profile is its `topM` most frequent
    * trigrams (ties broken lexicographically), and a document's score
    * for a language is the NUMBER of its trigram occurrences that land
    * in that profile — all integer counts, so both engines reproduce the
    * scores and the (score desc, lang asc) argmax bit-for-bit. Documents
    * matching no profile fall back to the alphabetically-first label
    * with score 0 (the all-zero argmax under the same tie-break).
    *
    * Scale shape: trigram counting is one (lang, trigram) hash aggregate
    * (map-side combined); the profile table is langs x topM rows —
    * always broadcast; scoring re-explodes the checkpointed per-doc
    * shingle arrays (the q114 tokenize-diamond rule) against the
    * broadcast profile, then one (doc, lang) aggregate and a per-doc
    * WindowGroupLimit argmax. In production the profile is an ingest
    * artifact (the q144 drift-model shape) rather than retrained per
    * query; the training stage here is the same plan that would build it.
    */
  def langIdTrigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      topM: Int = 64
  ): DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    val d = docs.select(col(idCol), col(langCol),
        TextFunctions.charShingles(lower(col(textCol)), 3).as("gs"))
      .localCheckpoint(false)
    val tri = d.select(col(idCol), col(langCol), explode(col("gs")).as("g"))
    val counts = tri.groupBy(col(langCol).as("plang"), col("g"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("plang").orderBy(col("c").desc, col("g").asc)
    val prof = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topM).select("plang", "g")
    val scores = tri.join(broadcast(prof), Seq("g"))
      .groupBy(col(idCol), col("plang")).agg(count(lit(1)).as("score"))
    val wd = Window.partitionBy(idCol).orderBy(col("score").desc, col("plang").asc)
    val best = scores.withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1).drop("rn")
    val fallback = d.agg(min(col(langCol)).as("fb"))
    d.select(col(idCol), col(langCol))
      .join(best, Seq(idCol), "left")
      .crossJoin(broadcast(fallback))
      .select(col(idCol), col(langCol),
        coalesce(col("plang"), col("fb")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("best_score"))
  }

  /** Proximity search: per (pattern, doc), the number of "qualifying
    * anchors" — term positions whose half-open [pos, pos + windowK) span
    * contains every distinct term of the pattern (any order). A window
    * covering all terms has a minimal form starting at some term
    * occurrence, so this count is well-defined and both engines compute
    * it identically (the q160 gate's oracle recomputes it in SQL).
    *
    * Scale shape: pattern terms broadcast onto the posting explode; the
    * anchor x occurrence pairing is a BANDED forward range join
    * (Joins.rangeJoinForwardWindow — pos div K joins as part of the
    * equi-key, anchors probe buckets {b, b+1}), so pairs per anchor are
    * bounded by two buckets' occupancy (<= 2K rows), never the per-doc
    * occurrence list. A head-term-dense 100k-token document is linear in
    * occurrences, not n_occ^2 (TextAnalysisSpec's long-doc fixture).
    */
  def proximitySearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String],
      windowK: Int
  ): DataFrame = {
    require(windowK >= 1, s"windowK must be >= 1, got $windowK")
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.toDF("phrase")
    val pterms = pats.select(col("phrase"),
      explode(array_distinct(TextFunctions.whitespaceTokens(col("phrase")))).as("term"))
    val nterms = pterms.groupBy("phrase").agg(countDistinct(col("term")).as("nt"))
    val post = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.whitespaceTokens(lower(col(textCol)))).as(Seq("pos", "term")))
    val occ = post.join(broadcast(pterms), Seq("term"))
      .select(col("phrase"), col("doc_id"), col("pos"), col("term"))
      .localCheckpoint(false) // anchor side AND window side of one join
    Joins.rangeJoinForwardWindow(
        occ.select(col("phrase"), col("doc_id"), col("pos").as("anchor")),
        occ, Seq("phrase", "doc_id"), "anchor", "pos", windowK.toLong)
      .groupBy("phrase", "doc_id", "anchor")
      .agg(countDistinct(col("term")).as("nm"))
      .join(broadcast(nterms), Seq("phrase"))
      .filter(col("nm") === col("nt"))
      .groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_windows"))
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

  /** Sliding-window token CHUNKING — the RAG / context-window prep step:
    * each document becomes ceil((ntok - chunkSize)/stride) + 1 overlapping
    * chunks of up to `chunkSize` whitespace tokens, starting every
    * `stride` tokens (stride < chunkSize ⇒ chunkSize - stride tokens of
    * overlap, so no boundary-straddling span is ever lost). Documents
    * shorter than one chunk emit exactly one (possibly empty) chunk, so
    * every doc_id survives into the chunk table.
    *
    * Output: (id, chunk_idx, start_tok, n_tokens, chunk_text) — ids are
    * the (doc, chunk_idx) composite, stable under re-partitioning.
    *
    * Scale shape: a pure narrow projection (split + sequence + explode +
    * slice), no shuffle anywhere; 100 TB of documents chunk at scan
    * speed and the output partitioning inherits the input's. Row count
    * inflates by ~ntok/stride per doc — the `stride` knob is the output
    * volume control, not a shuffle knob.
    */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride (chunkSize $chunkSize)")
    docs
      .select(col(idCol), TextFunctions.whitespaceTokens(col(textCol)).as("toks"))
      .withColumn("ntok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("ntok") <= chunkSize, lit(1L))
          .otherwise(expr(s"(ntok - $chunkSize + ${stride - 1}) div $stride + 1")))
      .select(col(idCol), col("toks"), col("ntok"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("piece",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunkSize)))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        size(col("piece")).cast("long").as("n_tokens"),
        concat_ws(" ", col("piece")).as("chunk_text"))
  }

  /** TRUE winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    * scheme): the Karp-Rabin rolling hash of the k-gram at EVERY
    * position, then the minimum hash of each w-length window; the
    * distinct minima are the document's fingerprint set. The winnowing
    * guarantee: any verbatim overlap of length >= w + k - 1 between two
    * documents yields at least one SHARED fingerprint, at an expected
    * density of only 2/(w+1) hashes per position — the sub-sampling that
    * lets web-scale near-dup keep a bounded, joinable number of keys per
    * document (fingerprint equality is then a plain equi-join, exactly
    * like the LSH band join). Docs shorter than the window emit their
    * single global minimum; docs shorter than k emit an empty array.
    *
    * ONE codegen'd O(n) pass (custom expression, RollingHash.winnow —
    * rolling hashes into a monotonic deque): the declarative
    * transform/slice/array_min composition measured 142 s at sf0.1 vs
    * ~2 s for this expression. The oracle reproduces the values with a
    * naive per-window integer recompute (q102's hash, list_min per
    * window).
    */
  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 8): Column =
    org.apache.spark.sql.graft.GraftFunctions.winnowingFingerprints(lower(text), k, w)

  /** Winnowing fingerprints packed with their first-occurrence char
    * offset, `(fp << 32) | pos` — the evidence-carrying variant: the
    * near-dup join can aggregate min/max positions per pair and report
    * the overlapping region extent in each document (what the reference
    * returns for its matches: the matched content, not just a score —
    * /root/reference/src/heurFuzz.py:123-125). Unpack with
    * `shiftright(x, 32)` / `x & 0xffffffff`.
    */
  def winnowingFingerprintPos(text: Column, k: Int = 8, w: Int = 8): Column =
    org.apache.spark.sql.graft.GraftFunctions.winnowingFingerprintPos(lower(text), k, w)

  /** The sentinel wrapping every BPE symbol in bpeTopMerges' working
    * sequences (U+001F unit separator — absent from the corpus text by
    * construction of the testdata; shared with the generated oracle SQL).
    */
  val BpeSep = ""

  /** BPE tokenizer TRAINING on the corpus (Sennrich et al. ACL'16): the
    * iterated half of byte-pair encoding — count adjacent symbol pairs
    * over the word-frequency table, merge the most frequent pair
    * everywhere, repeat. Exactly the greedy left-to-right non-overlap
    * semantics real BPE uses, because both engines' `replace` IS
    * left-to-right non-overlapping substitution; symbols are wrapped in
    * U+001F sentinels so a merge can never match across a symbol
    * boundary. Ties break on (pair count DESC, left ASC, right ASC) —
    * binary string order in both engines.
    *
    * Returns one row per merge step: (step, left, right, pair_count)
    * with human-readable (sentinel-stripped) symbols.
    *
    * Scale shape: the working state is the WORD-FREQUENCY table (vocab,
    * not corpus) — the corpus is touched once to build it; each step is
    * one narrow explode + one map-side-combined count + a 1-row argmax
    * broadcast back onto the vocab. Each step's sequences are lazily
    * checkpointed so step t does not replay steps 1..t-1.
    */
  def bpeTopMerges(
      docs: DataFrame,
      textCol: String,
      steps: Int
  ): DataFrame = bpeIterate(docs, textCol, steps)._1

  /** The ENCODE half of BPE: the vocab's final segmentation after
    * `steps` trained merges — (word, freq, pieces, n_pieces). This is
    * the table a tokenizer deployment ships: joining corpus tokens
    * against it (vocab-sized, broadcastable) BPE-encodes the corpus
    * without re-running any merge logic per document.
    */
  def bpeSegmentedVocab(
      docs: DataFrame,
      textCol: String,
      steps: Int
  ): DataFrame =
    bpeIterate(docs, textCol, steps)._2
      .select(col("word"), col("freq"),
        transform(split(col("seq"), " "),
          p => regexp_replace(p, BpeSep, "")).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))

  private def bpeIterate(
      docs: DataFrame,
      textCol: String,
      steps: Int
  ): (DataFrame, DataFrame) = {
    val S = BpeSep
    var words = docs
      .select(explode(TextFunctions.whitespaceTokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq",
        array_join(transform(expr("regexp_extract_all(word, '.', 0)"),
          c => concat(lit(S), c, lit(S))), " "))
      .localCheckpoint(false)
    val merges = (1 to steps).map { step =>
      val arr = split(col("seq"), " ")
      val pairs = words
        .select(col("freq"),
          explode(arrays_zip(
            slice(arr, lit(1), size(arr) - 1).as("a"),
            slice(arr, lit(2), size(arr) - 1).as("b"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
        .filter(col("b").isNotNull)
      val best = pairs.groupBy("a", "b").agg(sum("freq").as("pair_count"))
        .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
        .limit(1)
        .localCheckpoint(false)
      words = words.crossJoin(broadcast(best))
        .withColumn("seq",
          expr("replace(seq, a || ' ' || b, substring(a, 1, length(a) - 1) || substring(b, 2))"))
        .select("word", "freq", "seq")
        .localCheckpoint(false)
      best.select(lit(step.toLong).as("step"),
        regexp_replace(col("a"), S, "").as("left"),
        regexp_replace(col("b"), S, "").as("right"),
        col("pair_count"))
    }
    (merges.reduce(_.union(_)), words)
  }
}
