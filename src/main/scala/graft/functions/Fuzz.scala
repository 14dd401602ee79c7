package graft.functions

import java.util.Locale

/** Indel-based fuzzy string similarity, re-implemented from the published
  * RapidFuzz algorithm (the reference calls `rapidfuzz.fuzz.partial_ratio`
  * through `rapidfuzz.process.cdist`, /root/reference/src/heurFuzz.py:106-112).
  *
  * Definitions (per RapidFuzz's documentation):
  *   - indel distance(a, b)  = |a| + |b| - 2 * LCS(a, b)   (insert/delete only,
  *     no substitution — NOT Levenshtein)
  *   - ratio(a, b)           = 100 * (1 - dist / (|a|+|b|))
  *                           = 200 * LCS(a, b) / (|a| + |b|)
  *   - partial_ratio(a, b)   = max over alignments of the shorter string s in
  *     the longer string l of ratio(s, window). Windows are every substring
  *     l[i, i+|s|) plus the partial windows hanging off both edges
  *     (prefixes l[0, j) and suffixes l[|l|-j, |l|) for j < |s|), which is a
  *     superset of the windows RapidFuzz's `partial_ratio_short_needle`
  *     evaluates, so the maximum matches.
  *
  * Scores are rounded to the nearest integer (the reference requests
  * `dtype=np.uint8` from cdist) and zeroed below `scoreCutoff`
  * (/root/reference/src/heurFuzz.py:109-111).
  *
  * Known divergence (documented, SURVEY §7.4): lengths/LCS operate on UTF-16
  * code units, while Python operates on code points — non-BMP input (emoji,
  * rare CJK) can diverge slightly. BMP input is exact.
  */
object Fuzz extends Serializable {

  /** LCS length. Bit-parallel Allison–Dix for patterns <= 64 chars
    * (O(|a|*|b|/64)), classic two-row DP otherwise.
    */
  def lcsLength(a: CharSequence, b: CharSequence): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    if (m == 0) return 0
    if (m <= 64) lcsBitParallel(s, l) else lcsDp(s, l)
  }

  /** Allison–Dix (1986) bit-vector LCS: V' = (V + (V & M)) | (V & ~M),
    * V starts all-ones over |s| bits; LCS = count of zero bits at the end.
    */
  private def lcsBitParallel(s: CharSequence, l: CharSequence): Int = {
    val m = s.length
    // per-character match masks for the pattern
    val masks = new java.util.HashMap[Character, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val c = s.charAt(i)
      val prev = masks.getOrDefault(c, 0L)
      masks.put(c, prev | (1L << i))
      i += 1
    }
    val full = if (m == 64) -1L else (1L << m) - 1L
    var v = full
    var j = 0
    val n = l.length
    while (j < n) {
      val mtch = masks.getOrDefault(l.charAt(j), 0L)
      val u = v & mtch
      v = (v + u) | (v & ~mtch)
      // keep only the low m bits (addition can carry out of the window)
      v = v & full
      j += 1
    }
    m - java.lang.Long.bitCount(v & full)
  }

  private def lcsDp(s: CharSequence, l: CharSequence): Int = {
    val m = s.length
    val n = l.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j < n) {
      val cj = l.charAt(j)
      var i = 0
      while (i < m) {
        cur(i + 1) =
          if (s.charAt(i) == cj) prev(i) + 1
          else math.max(prev(i + 1), cur(i))
        i += 1
      }
      val t = prev; prev = cur; cur = t
      j += 1
    }
    prev(m)
  }

  /** Unrounded indel ratio in [0, 100]. */
  def ratioDouble(a: CharSequence, b: CharSequence): Double = {
    val denom = a.length + b.length
    if (denom == 0) return 100.0
    200.0 * lcsLength(a, b) / denom
  }

  /** `fuzz.ratio`, rounded like cdist(dtype=uint8) does. */
  def ratio(a: String, b: String): Int = math.round(ratioDouble(a, b)).toInt

  /** `fuzz.partial_ratio` (case-sensitive; callers lowercase to mirror
    * `processor=str.lower`). Rounded to nearest int.
    */
  def partialRatio(a: String, b: String): Int =
    math.round(partialRatioDouble(a, b)).toInt

  def partialRatioDouble(a: String, b: String): Double =
    partialRatioDoubleBounded(a, b, 100.0)

  /** As `partialRatioDouble` but the window scan stops once `best`
    * reaches `stopAt` (100.0 = exact score, since nothing can top 100).
    * With stopAt < 100 the return value is only a LOWER bound on the
    * true score — sufficient for `best >= stopAt` predicates, where it
    * skips the remaining windows the moment one clears the bar.
    */
  private def partialRatioDoubleBounded(a: String, b: String, stopAt: Double): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    val n = l.length
    if (m == 0) return if (n == 0) 100.0 else 0.0
    // NB: even when m == n, RapidFuzz's partial_ratio_short_needle still
    // evaluates the prefix/suffix edge windows (e.g. partial_ratio("ab","ba")
    // is ~66.67, not 50), so there is deliberately no equal-length shortcut.
    if (m <= 64) partialRatioShortNeedle(s, l, stopAt) else partialRatioGeneric(s, l, stopAt)
  }

  /** Fast path for patterns <= 64 chars: the Allison-Dix match masks for
    * the (fixed) short side are built ONCE and shared by every window —
    * the naive per-window call rebuilt the mask HashMap each time, which
    * dominated the verify stage's cost.
    */
  private def partialRatioShortNeedle(s: String, l: String, stopAt: Double = 100.0): Double = {
    val m = s.length
    val n = l.length
    val masks = new java.util.HashMap[Character, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val c = s.charAt(i)
      masks.put(c, masks.getOrDefault(c, 0L) | (1L << i))
      i += 1
    }
    val full = if (m == 64) -1L else (1L << m) - 1L

    // LCS(s, l[from, until)) via the shared masks
    def lcsWindow(from: Int, until: Int): Int = {
      var v = full
      var j = from
      while (j < until) {
        val mtch = masks.getOrDefault(l.charAt(j), 0L)
        val u = v & mtch
        v = ((v + u) | (v & ~mtch)) & full
        j += 1
      }
      m - java.lang.Long.bitCount(v)
    }

    var best = 0.0
    def consider(from: Int, until: Int): Unit = {
      val w = until - from
      best = math.max(best, 200.0 * lcsWindow(from, until) / (m + w))
    }
    // partial windows hanging off the start: l[0, j), j < m
    var j = 1
    while (j < m && best < stopAt) { consider(0, j); j += 1 }
    // full windows l[i, i+m)
    var i2 = 0
    while (i2 <= n - m && best < stopAt) { consider(i2, i2 + m); i2 += 1 }
    // partial windows hanging off the end: l[n-j, n), j < m
    j = 1
    while (j < m && best < stopAt) { consider(n - j, n); j += 1 }
    best
  }

  private def partialRatioGeneric(s: String, l: String, stopAt: Double = 100.0): Double = {
    val m = s.length
    val n = l.length
    var best = 0.0
    var j = 1
    while (j < m && best < stopAt) {
      best = math.max(best, ratioDouble(s, l.subSequence(0, j)))
      j += 1
    }
    var i = 0
    while (i <= n - m && best < stopAt) {
      best = math.max(best, ratioDouble(s, l.subSequence(i, i + m)))
      i += 1
    }
    j = 1
    while (j < m && best < stopAt) {
      best = math.max(best, ratioDouble(s, l.subSequence(n - j, n)))
      j += 1
    }
    best
  }

  /** Python str.lower analogue (locale-independent). */
  def pyLower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** The exact scoring call the reference makes per candidate pair:
    * lowercase both sides, partial_ratio, apply cutoff in DOUBLE domain
    * (rapidfuzz applies score_cutoff inside the scorer before the uint8
    * conversion, so e.g. 89.6 at cutoff 90 must be 0, not rounded to 90),
    * then round like cdist(dtype=uint8).
    */
  def partialRatioCutoff(a: String, b: String, cutoff: Int): Int = {
    if (a == null || b == null) return 0
    val d = partialRatioDouble(pyLower(a), pyLower(b))
    if (d >= cutoff) math.round(d).toInt else 0
  }

  /** Predicate form of the cutoff scorer: true iff
    * `partialRatioCutoff(a, b, cutoff) > 0` (equivalently `>= cutoff`,
    * since the cutoff zeroes every lower score). Unlike the scorer it
    * EARLY-EXITS the sliding-window scan the moment any window clears
    * the cutoff — the optimizer rewrites filter-only comparisons to this
    * (FoldPartialRatioCutoffPredicate), so a WHERE clause never pays for
    * the exact maximum it immediately discards.
    */
  def partialRatioAtLeast(a: String, b: String, cutoff: Int): Boolean = {
    if (a == null || b == null) return false
    // cutoff <= 0 degenerates: the bounded scan's stop-at bar is already
    // met at best = 0.0, yet `partialRatioCutoff > 0` still means
    // "rounded score >= 1" — fall back to the exact scorer there so the
    // documented equivalence holds for ALL cutoffs, not just the ones
    // the optimizer rule's guards produce
    if (cutoff <= 0) return partialRatioCutoff(a, b, cutoff) > 0
    partialRatioDoubleBounded(pyLower(a), pyLower(b), cutoff.toDouble) >= cutoff
  }
}
