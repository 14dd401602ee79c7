package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.Fuzz

/** ScalaCheck properties for the scorer (SURVEY §5 test plan). Plain
  * scalacheck Properties (sbt's scalacheck test framework runs these).
  */
object FuzzPropertySpec extends Properties("Fuzz") {

  private val asciiStr = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  property("ratio symmetric and within [0,100]") =
    Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      val r = Fuzz.ratioDouble(a, b)
      r >= 0.0 && r <= 100.0 && math.abs(r - Fuzz.ratioDouble(b, a)) < 1e-9
    }

  property("self-ratio is 100") =
    Prop.forAll(asciiStr) { a => Fuzz.ratio(a, a) == 100 }

  property("substring implies partial_ratio == 100") =
    Prop.forAll(asciiStr, asciiStr, asciiStr) { (pre, mid, post) =>
      mid.isEmpty || Fuzz.partialRatio(mid, pre + mid + post) == 100
    }

  // NB deliberately NO "partial_ratio >= ratio" property: it is FALSE.
  // When s's matches are scattered wider than any length-m window (e.g.
  // s="aaaa", l="axaxaxax"), every window catches fewer matches than the
  // full-string LCS and partial_ratio (50) < ratio (66.7) — RapidFuzz
  // behaves identically. The brute-force window-max property below is the
  // correct specification.

  property("cutoff zeroes strictly-below scores, passes the rest unchanged") =
    Prop.forAll(asciiStr, asciiStr, Gen.choose(0, 100)) { (a, b, cutoff) =>
      val d = Fuzz.partialRatioDouble(Fuzz.pyLower(a), Fuzz.pyLower(b))
      val s = Fuzz.partialRatioCutoff(a, b, cutoff)
      if (d >= cutoff) s == math.round(d).toInt else s == 0
    }

  property("partial_ratio equals the brute-force max over all windows") =
    Prop.forAll(Gen.resize(20, asciiStr), Gen.resize(80, asciiStr)) { (a, b) =>
      val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
      val m = s.length
      val n = l.length
      if (m == 0) true
      else {
        val windows =
          (1 until m).map(j => l.substring(0, j)) ++
            (0 to n - m).map(i => l.substring(i, i + m)) ++
            (1 until m).map(j => l.substring(n - j))
        val brute = (windows.map(w => Fuzz.ratioDouble(s, w)) :+ 0.0).max
        math.abs(Fuzz.partialRatioDouble(a, b) - brute) < 1e-9
      }
    }

  /** Textbook full-table LCS written independently of Fuzz's two
    * implementations — the reference both must agree with.
    */
  private def naiveLcs(a: String, b: String): Int = {
    val t = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      t(i)(j) =
        if (a(i - 1) == b(j - 1)) t(i - 1)(j - 1) + 1
        else math.max(t(i - 1)(j), t(i)(j - 1))
    t(a.length)(b.length)
  }

  // a small alphabet makes long common subsequences likely, so the DP
  // recurrence's max-branch (not just the match-branch) gets exercised
  private val smallAlphaStr = (max: Int) =>
    Gen.choose(0, max).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))

  property("lcsLength agrees with an independent naive DP across the 64-char seam") =
    Prop.forAll(smallAlphaStr(100), smallAlphaStr(150)) { (a, b) =>
      // lengths 0-100 x 0-150: covers bit-parallel (min side <= 64) AND
      // the two-row DP path (min side > 64) against one reference
      Fuzz.lcsLength(a, b) == naiveLcs(a, b)
    }

  property("long-needle partial_ratio equals the brute-force window max (DP path)") =
    Prop.forAll(smallAlphaStr(110), smallAlphaStr(160)) { (a, b) =>
      val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
      val m = s.length
      val n = l.length
      if (m == 0) true
      else {
        val windows =
          (1 until m).map(j => l.substring(0, j)) ++
            (0 to n - m).map(i => l.substring(i, i + m)) ++
            (1 until m).map(j => l.substring(n - j))
        val brute = (windows.map(w =>
          200.0 * naiveLcs(s, w) / (m + w.length)) :+ 0.0).max
        math.abs(Fuzz.partialRatioDouble(a, b) - brute) < 1e-9
      }
    }

  property("bit-parallel LCS agrees with DP: appending chars absent from b keeps LCS") =
    Prop.forAll(Gen.resize(30, asciiStr), Gen.resize(120, asciiStr)) { (a, b) =>
      // a+pad crosses the 64-char bit-parallel boundary; '\u00a7' (section sign) never
      // occurs in alphanumeric b, so the LCS must be unchanged
      val pad = "\u00a7".repeat(70)
      Fuzz.lcsLength(a, b) == Fuzz.lcsLength(a + pad, b)
    }
}
