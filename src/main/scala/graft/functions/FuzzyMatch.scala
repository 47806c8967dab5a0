package graft.functions

/** Fuzzy in-text title search (SURVEY.md §2.7 C21).
  *
  * The FedGaz importer locates an article's start inside a page by
  * fuzzily matching its title against the page text with a
  * cost-bounded regex (fedgaz/classes.py:242-344, error tolerance
  * max(1, len/10)). Re-expressed as a sliding-window Levenshtein scan in
  * plain Scala — used inside typed map/mapPartitions, JVM-native.
  */
object FuzzyMatch {

  /** Levenshtein distance with early-exit bound. */
  def levenshtein(a: String, b: String, bound: Int = Int.MaxValue): Int = {
    if (math.abs(a.length - b.length) > bound) return bound + 1
    var prev = Array.tabulate(b.length + 1)(identity)
    var curr = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var rowMin = curr(0)
      var j = 1
      while (j <= b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        rowMin = math.min(rowMin, curr(j))
        j += 1
      }
      if (rowMin > bound) return bound + 1
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(b.length)
  }

  /** Best fuzzy occurrence of `pattern` in `text`: scans windows of
    * pattern length ±tolerance and returns (startOffset, distance) of
    * the minimum-distance window (leftmost on ties), or None if no
    * window is within `maxDist`. Tolerance defaults to the reference's
    * max(1, len/10). */
  def find(text: String, pattern: String,
      maxDistOpt: Option[Int] = None): Option[(Int, Int)] = {
    if (pattern.isEmpty || text.isEmpty) return None
    val maxDist = maxDistOpt.getOrElse(math.max(1, pattern.length / 10))
    var best: Option[(Int, Int)] = None
    val w = pattern.length
    var start = 0
    while (start + math.max(1, w - maxDist) <= text.length) {
      val end = math.min(text.length, start + w)
      val d = levenshtein(text.substring(start, end), pattern, maxDist)
      if (d <= maxDist && best.forall(_._2 > d)) best = Some((start, d))
      if (best.exists(_._2 == 0)) return best
      start += 1
    }
    best
  }
}
