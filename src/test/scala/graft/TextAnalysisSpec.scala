package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Text-analysis operator semantics. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: grid, tail chunk, overlap reconstruction, empty doc") {
    val toks = (1 to 40).map(i => s"w$i")
    val docs = Seq((1L, toks.mkString(" ")), (2L, "only three tokens"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 8, stride = 6)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // ceil((40 - 8) / 6) + 1 = 7 chunks; last starts at 36 with 4 tokens
    assert(d1.length == 7)
    assert(d1.map(_.getLong(2)).toSeq == Seq(0L, 6L, 12L, 18L, 24L, 30L, 36L))
    assert(d1.last.getLong(3) == 4L && d1.last.getString(4) == "w37 w38 w39 w40")
    // consecutive chunks overlap by chunkSize - stride = 2 tokens
    for (Seq(a, b) <- d1.toSeq.sliding(2)) {
      val ta = a.getString(4).split(" ").toSeq
      val tb = b.getString(4).split(" ").toSeq
      assert(ta.takeRight(math.min(2, ta.length - 6)) == tb.take(2).take(ta.length - 6))
    }
    // every token position is covered (union of [start, start+n) == [0, 40))
    val covered = d1.flatMap(r => r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
    assert(covered == (0L until 40L).toSet)
    // short doc: one chunk, verbatim; empty doc: one empty chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getLong(3) == 3L
      && d2.head.getString(4) == "only three tokens")
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3.head.getLong(3) == 0L && d3.head.getString(4) == "")
  }

  test("stopwordRatio: exact fraction, zero for empty") {
    val out = Seq("the cat sat on a mat", "xyzzy plugh", "")
      .toDF("t")
      .select(TextAnalysis.stopwordRatio(col("t")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(out(0) - 3.0 / 6) < 1e-12) // the, on, a
    assert(out(1) == 0.0)
    assert(out(2) == 0.0)
  }

  test("tokenCount and wordPieceCount") {
    val r = Seq("hello world, v2.0!").toDF("t")
      .select(
        TextAnalysis.tokenCount(col("t")).as("ws"),
        TextAnalysis.wordPieceCount(col("t")).as("wp"))
      .head()
    assert(r.getLong(0) == 3)
    // pieces: hello | world | , | v | 2 | . | 0 | !
    assert(r.getLong(1) == 8)
  }

  test("punctRatio counts ASCII punctuation over length") {
    val r = Seq("ab,.").toDF("t").select(TextAnalysis.punctRatio(col("t"))).head().getDouble(0)
    assert(r == 0.5)
  }

  test("meanTokenLength") {
    val r = Seq("ab cdef").toDF("t").select(TextAnalysis.meanTokenLength(col("t"))).head().getDouble(0)
    assert(r == 3.0) // (2 + 4) / 2
  }

  test("predictedLang: argmax over stopword lists with alphabetical tie-break") {
    val out = Seq(
      "the cat and the dog of the house",  // en
      "el perro y la casa de la abuela",   // es
      "le chien et la maison des amis",    // fr
      "der hund und die katze ist nicht",  // de
      "zzz qqq www"                        // no stopwords anywhere -> tie -> 'de' (first)
    ).toDF("t")
      .select(TextAnalysis.predictedLang(col("t")).as("l"), TextAnalysis.bestLangScore(col("t")).as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out.map(_._1) == Seq("en", "es", "fr", "de", "de"))
    assert(out(4)._2 == 0.0)
  }

  test("fingerprint: deterministic, k-bounded, null for short docs") {
    val rows = Seq("the quick brown fox", "the quick brown fox", "ab")
      .toDF("t")
      .select(TextAnalysis.fingerprint(col("t"), 4, 8).as("fp"))
      .collect()
    assert(rows(0).getString(0) == rows(1).getString(0))
    assert(rows(0).getString(0).split(",").length == 8)
    assert(rows(2).isNullAt(0))
  }

  test("fingerprint: word reordering shifts only part of the shingle set") {
    val Seq(a, b) = Seq("alpha beta gamma delta", "beta alpha gamma delta")
      .toDF("t")
      .select(TextAnalysis.fingerprint(col("t"), 4, 8).as("fp"))
      .collect().map(_.getString(0)).toSeq
    val (sa, sb) = (a.split(",").toSet, b.split(",").toSet)
    assert(sa != sb && (sa intersect sb).nonEmpty)
  }

  test("repetitionSignals: dup fraction, dominant bigram, edge docs") {
    val docs = Seq(
      (1L, "spam spam spam spam"),   // 4 words, 1 distinct; bigram "spam spam" x3 of 3
      (2L, "a b c d"),               // no dups; 3 bigrams each once -> tie -> "a b"
      (3L, "solo"),                  // 1 word: no bigrams
      (4L, "")                       // empty doc
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4)
    assert(out(0).getDouble(2) == 3.0 / 4)       // dup_word_frac
    assert(out(0).getString(3) == "spam spam")
    assert(out(0).getDouble(4) == 1.0)           // all 3 bigrams identical
    assert(out(1).getDouble(2) == 0.0)
    assert(out(1).getString(3) == "a b")         // count tie -> lexicographic
    assert(math.abs(out(1).getDouble(4) - 1.0 / 3) < 1e-15)
    assert(out(2).getLong(1) == 1 && out(2).getString(3) == "" && out(2).getDouble(4) == 0.0)
    assert(out(3).getLong(1) == 0 && out(3).getDouble(2) == 0.0 && out(3).getString(3) == "")
  }

  test("winnowing: shared substring of length >= w+k-1 guarantees a shared fingerprint") {
    // k=8, w=8: any verbatim overlap of >= 15 chars must yield at least
    // one common fingerprint (Schleimer et al. SIGMOD'03, Thm 1-adjacent
    // guarantee) — the property the whole scheme exists for
    val shared = "this exact span is shared verbatim"
    val docs = Seq(
      (1L, s"prefix one $shared and then tail a"),
      (2L, s"completely different lead-in $shared closing words"),
      (3L, "no overlap with the others at all here")
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        explode(TextAnalysis.winnowingFingerprints(col("text"))).as("fp"))
      .collect().groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "shared 34-char span must share a fingerprint")
    assert(fps(1L).intersect(fps(3L)).isEmpty, "unrelated docs should not collide on this fixture")
  }

  test("winnowing: short docs emit one global-min fingerprint; sub-k docs emit none") {
    val docs = Seq(
      (1L, "abcdefghij"), // 3 k-grams (< w=8 windows) -> single global min
      (2L, "abcd")        // shorter than k=8 -> no fingerprints
    ).toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"),
        explode(TextAnalysis.winnowingFingerprints(col("text"))).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L), "one fingerprint for doc 1, none for doc 2")
  }

  test("langIdTrigram: disjoint character distributions separate perfectly") {
    // three constructed "languages" with disjoint alphabets: the trained
    // trigram profiles are disjoint, so every doc must score 0 for the
    // other two languages and match its own label
    val rnd = new scala.util.Random(5)
    def text(alpha: String): String =
      (1 to 12).map(_ => (1 to 6).map(_ => alpha(rnd.nextInt(alpha.length))).mkString).mkString(" ")
    val docs = (0 until 30).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val alpha = Map("aa" -> "abcde", "bb" -> "fghij", "cc" -> "klmno")(lang)
      (i.toLong, lang, text(alpha))
    }.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdTrigram(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.length == 30)
    assert(out.forall { case (lang, pred, score) => pred == lang && score > 0 },
      s"every doc must match its label: ${out.filterNot(t => t._1 == t._2).mkString(", ")}")
  }

  test("langIdTrigram: prediction derives from text, not from the label") {
    // one doc labeled "aa" but written in bb's alphabet: its trigram
    // hits land in the bb profile (its few polluting trigrams cannot
    // displace bb's dominant ones), so the prediction contradicts the
    // label — the model reads the text
    val rnd = new scala.util.Random(9)
    def text(alpha: String): String =
      (1 to 12).map(_ => (1 to 6).map(_ => alpha(rnd.nextInt(alpha.length))).mkString).mkString(" ")
    val base = (0 until 20).map { i =>
      val lang = Seq("aa", "bb")(i % 2)
      val alpha = Map("aa" -> "abcde", "bb" -> "fghij")(lang)
      (i.toLong, lang, text(alpha))
    }
    val docs = (base :+ ((99L, "aa", text("fghij")))).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdTrigram(docs, "doc_id", "text", "lang")
      .filter(col("doc_id") === 99L).collect().head
    assert(out.getString(2) == "bb", s"mislabeled doc must be predicted from its text: $out")
  }

  test("proximitySearch: brute-force match on small docs incl. edge windows") {
    val docs = Seq(
      (1L, "alpha x beta"),             // both terms within K=4 of pos 0
      (2L, "alpha x y z beta"),         // beta at offset 4 — outside [0, 4)
      (3L, "beta alpha"),               // order-free: anchor at beta covers both
      (4L, "alpha alpha beta alpha"),   // multiple qualifying anchors
      (5L, "gamma delta")               // no pattern terms at all
    ).toDF("doc_id", "text")
    val got = TextAnalysis.proximitySearch(docs, "doc_id", "text",
        Seq("alpha beta"), windowK = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // doc 1: anchor 0 [0,4) holds alpha+beta -> 1 (anchor at beta lacks alpha)
    // doc 2: no 4-window holds both -> absent
    // doc 3: anchor 0 (beta) holds both -> 1
    // doc 4: anchors 0,1,2 qualify ([2,6) holds beta+alpha@3); anchor 3 lacks beta -> 3
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 3L))
  }

  test("proximitySearch: head-term-dense LONG document stays linear (banded join)") {
    // 50k tokens, ~2/3 of them pattern terms: an unbanded (phrase, doc)
    // self-join materializes ~1.1e9 occurrence pairs for this ONE doc
    // (the q160 scale hazard); the banded join is bounded by 2K per
    // anchor (~530k pairs) and finishes in seconds. Correctness checked
    // against an exact brute-force scan of the same token stream.
    val k = 8
    val rnd = new scala.util.Random(42)
    val vocab = Array("alpha", "beta", "filler")
    val toks = Array.fill(50000)(vocab(rnd.nextInt(3)))
    val docs = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
    val expected = toks.indices.count { i =>
      (toks(i) == "alpha" || toks(i) == "beta") && {
        val win = toks.slice(i, math.min(i + k, toks.length))
        win.contains("alpha") && win.contains("beta")
      }
    }.toLong
    val got = TextAnalysis.proximitySearch(docs, "doc_id", "text",
        Seq("alpha beta"), windowK = k)
      .collect().map(r => r.getLong(2)).toSeq
    assert(got == Seq(expected), s"expected $expected qualifying anchors")
  }

  test("winnowing: fingerprint density is bounded (distinct minima << positions)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = docs.select(
        size(TextAnalysis.winnowingFingerprints(col("text"))).cast("double").as("n_fp"),
        greatest(length(col("text")) - 7, lit(1)).cast("double").as("n_pos"))
      .agg(sum("n_fp").as("fp"), sum("n_pos").as("pos")).head()
    val density = stats.getDouble(0) / stats.getDouble(1)
    // expected 2/(w+1) = 0.22 for random hashes; allow generous slack
    assert(density < 0.4, f"winnowing density $density%.3f should be well below 1")
    assert(density > 0.05, f"winnowing density $density%.3f implausibly low")
  }
}
