package graft.functions

/** Karp-Rabin rolling k-gram hashes: polynomial hash of every k-length
  * character window, computed in O(n) — each position updates the
  * previous hash in O(1) (subtract the outgoing char's term, shift by
  * the base, add the incoming char) instead of rehashing k chars.
  *
  * h_i = (sum_j code(c_{i+j}) * B^{k-1-j}) mod P with B = 131 and
  * P = 1e9+7: h < 2^30, so every intermediate (h*B + c, c*B^{k-1})
  * stays far below 2^63 — no overflow, and a DuckDB oracle reproduces
  * the values with plain integer SQL (recomputing each window naively;
  * same values, different complexity).
  *
  * Operates on UTF-16 code units (Java chars) — identical to codepoints
  * for ASCII/BMP text, which is the engine's documented scorer contract
  * too (SURVEY §1.4).
  */
object RollingHash extends Serializable {

  val Base: Long = 131L
  val Mod: Long = 1000000007L

  /** Distinct winnowing fingerprints (Schleimer et al., SIGMOD'03): the
    * minimum rolling k-gram hash of every w-length position window,
    * deduplicated, in first-occurrence order. ONE O(n) pass — the
    * rolling hashes stream through a monotonic deque (amortized O(1)
    * per position), so no per-window rescan and no intermediate
    * n-element slice allocations. Texts shorter than the window emit
    * their single global minimum; texts shorter than k emit an empty
    * array.
    */
  def winnow(s: String, k: Int, w: Int): Array[Long] = {
    if (s == null) return null
    val hs = hashes(s, k)
    val n = hs.length
    if (n == 0) return hs
    if (n < w) return Array(hs.min)
    val idx = new Array[Int](n) // deque of candidate indices, hashes increasing
    var head = 0
    var tail = 0 // window is [head, tail)
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    val seen = new java.util.HashSet[java.lang.Long]
    var i = 0
    while (i < n) {
      while (tail > head && hs(idx(tail - 1)) >= hs(i)) tail -= 1
      idx(tail) = i
      tail += 1
      if (idx(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hs(idx(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    out.toArray
  }

  /** Winnowing fingerprints packed with their match position:
    * `(fp << 32) | firstIndex(hs, fp)` for each fingerprint `winnow`
    * selects, in the same first-occurrence order. The position is the
    * first index of the fingerprint's value in the rolling-hash array —
    * i.e. the 0-based char offset where the matched k-gram starts —
    * which is the deterministic definition an oracle can reproduce with
    * `list_position`. fp < 2^30 (mod 1e9+7) so the pack fits in 62
    * bits. Still one O(n) pass: the extra work is a set-membership scan
    * over the hashes.
    */
  def winnowWithPos(s: String, k: Int, w: Int): Array[Long] = {
    if (s == null) return null
    val sel = winnow(s, k, w)
    if (sel.isEmpty) return sel
    val hs = hashes(s, k)
    val want = new java.util.HashSet[java.lang.Long]
    sel.foreach(want.add(_))
    val firstIdx = new java.util.HashMap[java.lang.Long, Integer]
    var i = 0
    while (i < hs.length) {
      if (want.contains(hs(i)) && !firstIdx.containsKey(hs(i)))
        firstIdx.put(hs(i), i)
      i += 1
    }
    sel.map(v => (v << 32) | firstIdx.get(v).toLong)
  }

  /** All rolling k-gram hashes of `s`, in position order; empty array
    * when the text is shorter than k.
    */
  def hashes(s: String, k: Int): Array[Long] = {
    if (s == null) return null
    val n = s.length
    if (k <= 0 || n < k) return Array.empty[Long]
    val out = new Array[Long](n - k + 1)
    // B^(k-1) mod P, for removing the outgoing char's contribution
    var bk = 1L
    var i = 1
    while (i < k) { bk = bk * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = ((h + Mod - s.charAt(i - k) * bk % Mod) % Mod * Base + s.charAt(i)) % Mod
      out(i - k + 1) = h
      i += 1
    }
    out
  }
}
