package graft

import org.apache.spark.sql.functions._
import graft.operators.HeurFuzz
import graft.sources.Readers

/** Pipeline semantics: golden e2e (SURVEY §7.2 definition-of-done), the
  * load-bearing tie-break total orders (SURVEY §2 ops 7/10), and the
  * inverted-index scale path's exact parity.
  */
class HeurFuzzSpec extends SparkSpec {

  private val exQ = "/root/reference/example/test_query.txt"
  private val exR = "/root/reference/example/test_refs.txt"
  private val goldenRows = Seq(
    ("test", "test2"),
    ("a yellow banana from the store", "yellow banana"),
    ("vanilla", "vanilla"),
    ("peanutbutter", "NA")
  )

  private def matchRows(params: HeurFuzz.Params) =
    HeurFuzz
      .matchTable(Readers.lines(spark, exQ), Readers.lines(spark, exR), params)
      .orderBy("q_id")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  test("golden e2e: reproduces example/output.txt (crossJoin path)") {
    assert(matchRows(HeurFuzz.Params(topK = 5, scoreCutoff = 90)) == goldenRows)
  }

  test("golden e2e: inverted-index path is bit-identical") {
    assert(
      matchRows(HeurFuzz.Params(topK = 5, scoreCutoff = 90, useInvertedIndex = true))
        == goldenRows
    )
  }

  test("top-K candidate order: desc(coverage, len_diff, ref_id) — SURVEY §2.1") {
    val q = HeurFuzz.prepare(Readers.lines(spark, exQ), "q_")
    val r = HeurFuzz.prepare(Readers.lines(spark, exR), "r_")
    val cands = HeurFuzz
      .topKCandidates(HeurFuzz.pairsCross(q, r), 5)
      .filter(col("q_term") === "test")
      .orderBy(col("coverage").desc, col("len_diff").desc, col("r_id").desc)
      .select("r_term")
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(cands == Seq("testing", "test123", "tester", "test2", "test1"))
  }

  test("argmax tie-break: desc(score), asc(len_diff), desc(ref_id) → test2 not test1") {
    val rows = matchRows(HeurFuzz.Params(topK = 5, scoreCutoff = 90))
    assert(rows.head == ("test", "test2"))
  }

  test("k larger than ref count: no spurious candidates (reference quirk not replicated)") {
    val q = HeurFuzz.prepare(Readers.lines(spark, exQ), "q_")
    val r = HeurFuzz.prepare(Readers.lines(spark, exR), "r_")
    val n = HeurFuzz
      .topKCandidates(HeurFuzz.pairsCross(q, r), 50)
      .filter(col("q_term") === "test")
      .count()
    assert(n == 10) // all 10 refs, nothing more
  }

  test("map ratio: 75.00 on the example fixture (heurFuzz.py:127-128)") {
    val m = HeurFuzz.matchTable(
      Readers.lines(spark, exQ),
      Readers.lines(spark, exR),
      HeurFuzz.Params(topK = 5, scoreCutoff = 90)
    )
    assert(HeurFuzz.mapRatio(m) == 75.0)
  }

  test("strip semantics: 'vanilla ' ref (trailing space) matches exactly") {
    val rows = matchRows(HeurFuzz.Params(topK = 5, scoreCutoff = 90))
    assert(rows(2) == ("vanilla", "vanilla"))
  }

  test("inverted index: zero-overlap query hits the starved fallback and matches crossJoin") {
    import spark.implicits._
    // "qqqq" shares no bigram with any example ref -> it vanishes from the
    // index join entirely and must come back through the fallback
    val queries = Seq((0L, "qqqq"), (1L, "test")).toDF("id", "term")
    val refs = Readers.lines(spark, exR)
    def run(inv: Boolean) =
      HeurFuzz.matchTable(queries, refs, HeurFuzz.Params(topK = 5, scoreCutoff = 90, useInvertedIndex = inv))
        .orderBy("q_id").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val cross = run(false)
    val inverted = run(true)
    assert(cross == inverted)
    assert(cross == Seq(("qqqq", "NA"), ("test", "test2")))
  }

  test("inverted index: zero-bigram (1-char) query still matches (not silently NA)") {
    import spark.implicits._
    // "a" has ZERO bigrams -> invisible to the index join; but
    // partial_ratio("a", "apple") = 100 at the default cutoff 90, so the
    // reference (heurFuzz.py:113-125) maps it. Pre-fix the inverted path
    // returned NA here because the query formed no group in the candidate
    // counts and was never marked starved.
    val queries = Seq((0L, "a"), (1L, "test")).toDF("id", "term")
    val refs = Seq((0L, "apple"), (1L, "test2")).toDF("id", "term")
    def run(inv: Boolean) =
      HeurFuzz.matchTable(queries, refs, HeurFuzz.Params(topK = 5, scoreCutoff = 90, useInvertedIndex = inv))
        .orderBy("q_id").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val cross = run(false)
    val inverted = run(true)
    assert(cross == inverted)
    assert(cross == Seq(("a", "apple"), ("test", "test2")))
  }

  test("inverted index: zero-overlap query at cutoff 0 falls back to a real match") {
    import spark.implicits._
    // judge repro: "xy" shares no bigram with "yx", yet at cutoff 0 the
    // cross path scores and matches it; the inverted path must agree.
    val queries = Seq((0L, "xy")).toDF("id", "term")
    val refs = Seq((0L, "yx")).toDF("id", "term")
    def run(inv: Boolean) =
      HeurFuzz.matchTable(queries, refs, HeurFuzz.Params(topK = 5, scoreCutoff = 0, useInvertedIndex = inv))
        .orderBy("q_id").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val cross = run(false)
    val inverted = run(true)
    assert(cross == inverted)
    assert(cross == Seq(("xy", "yx")))
  }

  test("empty query set: both paths yield an empty result, no crash") {
    import spark.implicits._
    val queries = Seq.empty[(Long, String)].toDF("id", "term")
    val refs = Readers.lines(spark, exR)
    for (inv <- Seq(false, true)) {
      val n = HeurFuzz.matchTable(queries, refs,
        HeurFuzz.Params(topK = 5, scoreCutoff = 90, useInvertedIndex = inv)).count()
      assert(n == 0, s"inverted=$inv")
    }
  }

  test("cutoff gate: peanutbutter maps once the cutoff is dropped") {
    val rows = matchRows(HeurFuzz.Params(topK = 5, scoreCutoff = 0))
    assert(rows(3)._2 != "NA")
  }
}
