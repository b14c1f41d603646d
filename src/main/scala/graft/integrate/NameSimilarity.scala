package graft.integrate

/** Ratcliff-Obershelp sequence similarity, matching Python
  * `difflib.SequenceMatcher.ratio()` (used for column-name similarity
  * in the reference, validator/union.py:70-82 and fuzzy feature
  * matching, LLM_Ingestor/output_validator.py:72-81).
  *
  * ratio = 2 * M / (|a| + |b|) where M is the total length of matching
  * blocks found by recursively taking the longest matching block
  * (ties: earliest in a, then earliest in b) and recursing on the
  * pieces before and after. Column names are short, so difflib's
  * autojunk heuristic (len >= 200) never applies and is omitted.
  */
object NameSimilarity {

  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0 // difflib: 2*0/0 -> 1.0? (0/0) guarded: returns 1.0 for equal empties
    val m = matchingBlocksLength(a, b)
    2.0 * m / (a.length + b.length)
  }

  /** Longest matching block in a[alo,ahi) x b[blo,bhi), difflib
    * `find_longest_match` semantics (earliest-in-a, then earliest-in-b
    * tie-break; j2len rolling table).
    */
  private def longestMatch(a: String, b: String, alo: Int, ahi: Int, blo: Int, bhi: Int)
      : (Int, Int, Int) = {
    val b2j = scala.collection.mutable.Map[Char, List[Int]]()
    for (j <- (bhi - 1) to blo by -1) b2j(b(j)) = j :: b2j.getOrElse(b(j), Nil)
    var besti = alo
    var bestj = blo
    var bestSize = 0
    var j2len = Map[Int, Int]()
    for (i <- alo until ahi) {
      var newJ2len = Map[Int, Int]()
      for (j <- b2j.getOrElse(a(i), Nil)) {
        val k = j2len.getOrElse(j - 1, 0) + 1
        newJ2len += j -> k
        if (k > bestSize) { besti = i - k + 1; bestj = j - k + 1; bestSize = k }
      }
      j2len = newJ2len
    }
    (besti, bestj, bestSize)
  }

  private def matchingBlocksLength(a: String, b: String): Int = {
    def recurse(alo: Int, ahi: Int, blo: Int, bhi: Int): Int = {
      if (alo >= ahi || blo >= bhi) return 0
      val (i, j, k) = longestMatch(a, b, alo, ahi, blo, bhi)
      if (k == 0) 0
      else k + recurse(alo, i, blo, j) + recurse(i + k, ahi, j + k, bhi)
    }
    recurse(0, a.length, 0, b.length)
  }
}

/** Deterministic lexical stand-in for the reference's FinBERT+XGBoost
  * column-name model (validator/union.py:84-113). The hybrid score is
  * 85% name similarity, so the model term only nudges decisions; the
  * reference itself degrades to a constant 0.5 when its model files
  * are absent. This scorer uses character-trigram Jaccard similarity
  * of the normalized names — deterministic, dependency-free, and
  * documented as a divergence (SURVEY §7.4).
  */
object TrigramScorer {

  def probability(name1: String, name2: String): Double = {
    val t1 = trigrams(name1.toLowerCase.trim)
    val t2 = trigrams(name2.toLowerCase.trim)
    if (t1.isEmpty && t2.isEmpty) 1.0
    else if (t1.isEmpty || t2.isEmpty) 0.0
    else (t1 & t2).size.toDouble / (t1 | t2).size
  }

  private def trigrams(s: String): Set[String] =
    if (s.length < 3) (if (s.isEmpty) Set.empty else Set(s))
    else s.sliding(3).toSet
}
