package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import graft.functions.RollingHash

/** Karp-Rabin rolling hashes: O(1)-update values must equal the naive
  * per-window recompute, through both the Scala kernel and the codegen'd
  * Catalyst expression.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def naive(s: String, k: Int): Array[Long] =
    (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) => (h * RollingHash.Base + c) % RollingHash.Mod)
    }.toArray

  test("rolling recurrence equals the naive per-window hash") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val s = (0 until rng.nextInt(60)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      for (k <- Seq(1, 2, 4, 8)) {
        val expected = if (s.length < k) Array.empty[Long] else naive(s, k)
        assert(RollingHash.hashes(s, k).toSeq == expected.toSeq, s"s='$s' k=$k")
      }
    }
  }

  test("catalyst expression: codegen matches the kernel; null and short inputs") {
    val rows = Seq(Some("the quick brown fox"), Some("short"), Some(""), None)
      .toDF("t")
      .select(GraftFunctions.rollingKgramHashes(col("t"), 8).as("hs"))
      .collect()
    assert(rows(0).getSeq[Long](0) == RollingHash.hashes("the quick brown fox", 8).toSeq)
    assert(rows(1).getSeq[Long](0).isEmpty)  // shorter than k
    assert(rows(2).getSeq[Long](0).isEmpty)  // empty string
    assert(rows(3).isNullAt(0))              // null in -> null out
  }

  test("SQL surface: rolling_kgram_hashes registered via extensions") {
    val r = spark.sql("SELECT rolling_kgram_hashes('the quick brown fox', 8) AS hs")
      .collect()(0).getSeq[Long](0)
    assert(r == RollingHash.hashes("the quick brown fox", 8).toSeq)
  }

  test("SQL surface: winnowing_fingerprints registered via extensions") {
    val r = spark.sql("SELECT winnowing_fingerprints('the quick brown fox jumps', 8, 8) AS fp")
      .collect()(0).getSeq[Long](0)
    assert(r == RollingHash.winnow("the quick brown fox jumps", 8, 8).toSeq)
  }

  test("identical windows hash identically, different windows (almost surely) differ") {
    val hs = RollingHash.hashes("abcabcabc", 3).toSeq
    assert(hs(0) == hs(3) && hs(3) == hs(6)) // "abc" thrice
    assert(hs(0) != hs(1))                   // "abc" vs "bca"
  }

  test("winnow == brute-force per-window minima (property, random strings)") {
    val rng = new scala.util.Random(7)
    def brute(s: String, k: Int, w: Int): Seq[Long] = {
      val hs = RollingHash.hashes(s, k)
      if (hs.isEmpty) Seq.empty
      else if (hs.length < w) Seq(hs.min)
      else hs.toSeq.sliding(w).map(_.min).toSeq.distinct
    }
    for (_ <- 1 to 200) {
      val n = rng.nextInt(40)
      val s = Seq.fill(n)(('a' + rng.nextInt(3)).toChar).mkString // tiny alphabet forces ties
      val k = 1 + rng.nextInt(4)
      val w = 1 + rng.nextInt(5)
      assert(RollingHash.winnow(s, k, w).toSeq.sorted == brute(s, k, w).sorted,
        s"mismatch for s='$s' k=$k w=$w")
    }
  }

  test("winnowWithPos packs the same fingerprints with first-occurrence offsets") {
    val rng = new scala.util.Random(23)
    for (_ <- 1 to 100) {
      val n = rng.nextInt(50)
      val s = Seq.fill(n)(('a' + rng.nextInt(3)).toChar).mkString // ties force repeated hashes
      val k = 1 + rng.nextInt(4)
      val w = 1 + rng.nextInt(5)
      val packed = RollingHash.winnowWithPos(s, k, w)
      val plain = RollingHash.winnow(s, k, w)
      val hs = RollingHash.hashes(s, k)
      assert(packed.map(_ >>> 32).toSeq == plain.toSeq, s"fp part s='$s' k=$k w=$w")
      packed.foreach { p =>
        val fp = p >>> 32
        val pos = (p & 0xffffffffL).toInt
        assert(hs(pos) == fp, s"pos does not hash to fp for s='$s' k=$k w=$w")
        assert(hs.indexOf(fp) == pos, s"pos is not the FIRST occurrence for s='$s' k=$k w=$w")
      }
    }
  }

  test("catalyst expression: winnowing_fingerprint_pos codegen matches the kernel") {
    val r = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("t")
      .select(GraftFunctions.winnowingFingerprintPos(col("t"), 8, 8).as("p"))
      .collect()(0).getSeq[Long](0)
    assert(r == RollingHash.winnowWithPos("the quick brown fox jumps over the lazy dog", 8, 8).toSeq)
    assert(r.nonEmpty)
  }

  test("winnow deque handles the monotone-decreasing worst case") {
    // strictly decreasing hash sequence keeps the deque at size 1 per pop
    val s = "zyxwvutsrqponmlkjihgfedcba"
    val hs = RollingHash.hashes(s, 1)
    val minima = hs.toSeq.sliding(4).map(_.min).toSeq.distinct
    assert(RollingHash.winnow(s, 1, 4).toSeq.sorted == minima.sorted)
  }
}
