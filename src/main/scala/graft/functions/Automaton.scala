package graft.functions

/** Aho–Corasick multi-pattern string matching — the blocklist/term-scan
  * primitive of a web-curation pipeline (bad-word filtering, policy term
  * screening, keyword tagging). One automaton walk finds every occurrence
  * of every pattern in O(|text| + matches), independent of pattern count —
  * the property that matters at 100 TB, where the naive per-term scan is
  * O(|text| · n_terms) and a regex alternation backtracks.
  *
  * Execution shape: the automaton is built ONCE on the driver from the
  * (artifact-sized) term list and ships inside the task closure (it is a
  * few KB for realistic blocklists — same discipline as the broadcast
  * deny-list of q215); executors reuse it across every row of every
  * partition. Scanning is pure map work: no shuffle, no per-row
  * allocation beyond the counts array.
  *
  * Matching semantics: ALL occurrences are reported, at every ending
  * position, including overlaps between different patterns and patterns
  * nested inside longer ones (the standard AC dictionary-automaton
  * contract). Counting is case-sensitive over exact char sequences.
  */
object Automaton {

  /** Immutable, serializable AC automaton over `patterns` (index-aligned
    * with the input seq). Nodes are flat parallel arrays; transitions are
    * per-node sorted (char → next) pairs resolved by binary search — no
    * 64K-wide rows, so the footprint stays blocklist-proportional.
    */
  final class AhoCorasick private[Automaton] (
      val patterns: IndexedSeq[String],
      transChars: Array[Array[Char]],
      transNext: Array[Array[Int]],
      fail: Array[Int],
      // patterns ending at this node, INCLUDING via dictionary-suffix
      // links (pre-flattened at build so the scan never chases links)
      outputs: Array[Array[Int]]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val cs = transChars(s)
        var lo = 0; var hi = cs.length - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val mc = cs(mid)
          if (mc == c) return transNext(s)(mid)
          else if (mc < c) lo = mid + 1
          else hi = mid - 1
        }
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Per-pattern occurrence counts over `text` (one array per call;
      * index-aligned with [[patterns]]).
      */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        s = step(s, text.charAt(i))
        val out = outputs(s)
        var j = 0
        while (j < out.length) { counts(out(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }

    /** Match spans (start, end-exclusive, patternIdx) in scan order — the
      * redaction-feed variant. Spans of different patterns may overlap;
      * the caller chooses a resolution policy (e.g. leftmost-longest).
      */
    def findSpans(text: String): Seq[(Int, Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int, Int)]
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val o = outputs(s)
        var j = 0
        while (j < o.length) {
          val p = o(j)
          out += ((i + 1 - patterns(p).length, i + 1, p))
          j += 1
        }
        i += 1
      }
      out.result()
    }
  }

  /** Build the goto/fail/output automaton. Duplicate and empty patterns
    * are rejected (an empty pattern would match at every position; a
    * duplicate would double-count silently).
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "empty pattern set")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")
    // trie as growable maps, frozen to arrays at the end
    val trans = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (pat, pi) =>
      var s = 0
      pat.foreach { c =>
        s = trans(s).getOrElseUpdate(c, {
          trans += scala.collection.mutable.TreeMap.empty[Char, Int]
          ends += Nil
          trans.size - 1
        })
      }
      ends(s) ::= pi
    }
    val n = trans.size
    val fail = new Array[Int](n)
    val outputs = new Array[List[Int]](n)
    var i = 0
    while (i < n) { outputs(i) = ends(i); i += 1 }
    // BFS from the root: fail(child) = the deepest proper-suffix state;
    // outputs flatten the dictionary-suffix chain as we go (parents are
    // finalized before children by BFS order)
    val queue = scala.collection.mutable.Queue.empty[Int]
    trans(0).foreach { case (_, child) => fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outputs(s) = outputs(s) ::: outputs(fail(s))
      trans(s).foreach { case (c, child) =>
        var f = fail(s)
        while (f != 0 && !trans(f).contains(c)) f = fail(f)
        fail(child) = trans(f).get(c).filter(_ != child).getOrElse(0)
        queue += child
      }
    }
    new AhoCorasick(
      patterns.toIndexedSeq,
      trans.map(_.keys.toArray).toArray,
      trans.map(_.values.toArray).toArray,
      fail,
      outputs.map(_.toArray))
  }
}
