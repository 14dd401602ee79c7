package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup operator semantics: exact groups, LSH candidate generation
  * guarantees, near-dup verification, simhash properties.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"), // near dup of 0
    (3L, "completely different content about spark query engines here"),
    (4L, "xy") // shorter than the shingle width
  ).toDF("doc_id", "text")

  test("exactGroups: identical texts share a hash group; keep-one is min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dup = g.find(_.getLong(1) == 2).get
    assert(dup.getLong(2) == 0L) // keep_id = min(0, 1)
    assert(g.count(_.getLong(1) == 1) == 3) // docs 2, 3, 4 unique
  }

  test("nearDuplicates: exact and near duplicates found, unrelated pairs absent") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleN = 4, numHashes = 8, rowsPerBand = 4, threshold = 0.4)
    val pairs = nd.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup always survives (jaccard 1.0)
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup (one word case-flipped)
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // unrelated doc never pairs
  }

  test("nearDuplicates: exact dup pair has jaccard exactly 1.0") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text")
    val j = nd.filter(col("id_a") === 0 && col("id_b") === 1).select("jacc").head().getDouble(0)
    assert(j == 1.0)
  }

  test("nearDuplicates: too-short docs drop out (null signature semantics)") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text")
    assert(nd.filter(col("id_a") === 4 || col("id_b") === 4).count() == 0)
  }

  test("lshCandidates: band collision requires identical minhash band") {
    val withSh = docs.select(col("doc_id"), Dedup.shingleSet(col("text"), 4).as("sh"))
    val cands = Dedup.lshCandidates(withSh, "doc_id", "sh", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L))) // identical docs collide in every band
    assert(cands.forall { case (a, b) => a < b }) // canonical pair order
  }

  test("simhash: identical texts get identical hashes; value fits the bit width") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L))
    assert(h.values.forall(v => v >= 0 && v < (1 << 16)))
  }

  test("simhash: near-identical texts are close in hamming distance") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(2L)) <= hamming(h(0L), h(3L)))
  }

  test("ngramJaccardPairs: identical pair scores 1.0, threshold filters") {
    val pairs = Dedup.ngramJaccardPairs(docs.filter(col("doc_id") < 4), "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 3L))
  }
}
