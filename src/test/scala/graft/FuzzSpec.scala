package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fuzz

/** Table-driven checks of the Indel ratio / partial_ratio scorer against
  * RapidFuzz-documented values (the reference's scorer,
  * /root/reference/src/heurFuzz.py:106-112).
  */
class FuzzSpec extends AnyFunSuite {

  test("ratio: known RapidFuzz values") {
    // fuzz.ratio("kitten","sitting"): LCS=4, 200*4/13 = 61.538 -> 62
    assert(Fuzz.ratio("kitten", "sitting") == 62)
    assert(Fuzz.ratio("test", "test") == 100)
    assert(Fuzz.ratio("", "") == 100)
    assert(Fuzz.ratio("abc", "") == 0)
    // fuzz.ratio("this is a test","this is a test!"): LCS=14, 200*14/29 = 96.55 -> 97
    assert(Fuzz.ratio("this is a test", "this is a test!") == 97)
    // LCS("abcd","bcda")=3 ("bcd"), 200*3/8 = 75
    assert(Fuzz.ratio("abcd", "bcda") == 75)
  }

  test("partial_ratio: substring implies 100") {
    assert(Fuzz.partialRatio("test", "testing") == 100)
    assert(Fuzz.partialRatio("banana", "a yellow banana store") == 100)
    assert(Fuzz.partialRatio("yellow banana", "a yellow banana from the store") == 100)
  }

  test("partial_ratio: equal lengths still evaluate edge windows (ADVICE r1)") {
    // RapidFuzz partial_ratio("ab","ba") ~ 66.67 (prefix window "b"), not 50
    assert(Fuzz.partialRatio("ab", "ba") == 67)
    assert(math.abs(Fuzz.partialRatioDouble("ab", "ba") - 200.0 / 3) < 1e-9)
  }

  test("partial_ratio: best window can hang off an edge") {
    // s="abcd", l="abced": full windows score 75; prefix window "abc"
    // scores 200*3/7 = 85.71 -> best, rounds to 86
    assert(Fuzz.partialRatio("abcd", "abced") == 86)
  }

  test("cutoff applies in double domain before uint8 rounding (ADVICE r1)") {
    // true score 85.71 rounds to 86, but must NOT pass cutoff 86
    assert(Fuzz.partialRatio("abcd", "abced") == 86)
    assert(Fuzz.partialRatioCutoff("abcd", "abced", 86) == 0)
    assert(Fuzz.partialRatioCutoff("abcd", "abced", 85) == 86)
  }

  test("partialRatioCutoff lowercases both sides (processor=str.lower)") {
    assert(Fuzz.partialRatioCutoff("TEST", "teSting", 90) == 100)
    assert(Fuzz.partialRatioCutoff("Vanilla", "vanilla", 90) == 100)
  }

  test("golden-example scoring: all five test candidates fuzz to 100") {
    for (r <- Seq("testing", "test123", "tester", "test2", "test1"))
      assert(Fuzz.partialRatioCutoff(r, "test", 90) == 100, r)
  }

  test("golden-example scoring: peanutbutter is zeroed at cutoff 90") {
    for (r <- Seq("test1", "test2", "test123", "estt", "testing", "tester",
                  "vanilla", "banana", "yellow banana", "a yellow banana store"))
      assert(Fuzz.partialRatioCutoff(r, "peanutbutter", 90) == 0, r)
  }

  test("lcsLength: bit-parallel (<=64) agrees with DP (>64) on a seam case") {
    val a = "abcab" * 12 // 60 chars -> bit-parallel
    val b = "bcab" * 20
    val lcsShort = Fuzz.lcsLength(a, b)
    // pad the pattern past 64 chars with chars absent from b: LCS unchanged
    val lcsLong = Fuzz.lcsLength(a + "ZZZZZ", b)
    assert(lcsShort == lcsLong)
  }

  test("lcsLength: exactly 64-char pattern (mask overflow boundary)") {
    val a = "ab" * 32 // 64 chars
    assert(Fuzz.lcsLength(a, a) == 64)
    assert(Fuzz.ratio(a, a) == 100)
  }
}
