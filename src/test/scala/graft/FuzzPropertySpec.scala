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

  property("partial_ratio >= ratio (a window can only help)") =
    Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      Fuzz.partialRatioDouble(a, b) >= Fuzz.ratioDouble(a, b) - 1e-9
    }

  property("cutoff zeroes strictly-below scores, passes the rest unchanged") =
    Prop.forAll(asciiStr, asciiStr, Gen.choose(0, 100)) { (a, b, cutoff) =>
      val d = Fuzz.partialRatioDouble(Fuzz.pyLower(a), Fuzz.pyLower(b))
      val s = Fuzz.partialRatioCutoff(a, b, cutoff)
      if (d >= cutoff) s == math.round(d).toInt else s == 0
    }

  property("bit-parallel LCS agrees with DP: appending chars absent from b keeps LCS") =
    Prop.forAll(Gen.resize(30, asciiStr), Gen.resize(120, asciiStr)) { (a, b) =>
      // a+pad crosses the 64-char bit-parallel boundary; '\u00a7' (section sign) never
      // occurs in alphanumeric b, so the LCS must be unchanged
      val pad = "\u00a7".repeat(70)
      Fuzz.lcsLength(a, b) == Fuzz.lcsLength(a + pad, b)
    }
}
