package graft.functions

import scala.collection.mutable

/** Character-level Aho-Corasick multi-pattern matcher with Java-regex `\b`
  * word-boundary semantics enforced at both match ends — the one-pass
  * replacement for a bank of `\b<escaped term>\b` regexes over lowered text.
  * The reference runs its whole dictionary as per-document compiled-regex
  * loops (pracuj_scraper.py:183-197); SURVEY §2.4 F6 names this automaton
  * as the v2 perf path. Matching is O(chars + hits) regardless of
  * dictionary size; construction is O(total pattern chars) and is done once
  * per deserialized expression (microseconds — trivial against a task).
  *
  * Boundary class is ASCII `[a-zA-Z0-9_]`: both Java regex (without
  * UNICODE_CHARACTER_CLASS, which Spark's `regexp_like` doesn't set) and
  * DuckDB's RE2 define `\b` over exactly that class, so the automaton
  * reproduces the regex bank bit-for-bit — including the quirky edges, e.g.
  * a pattern ending in `)` only matches when a WORD char follows it, and a
  * pattern starting with `.` only matches when a word char precedes it.
  *
  * Patterns are matched as literals (the regex bank escapes metacharacters,
  * so its patterns are literals too) against text the CALLER has lowered.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {

  // Flat trie. Per-node HashMap transitions: the alphabet is open (terms
  // carry '+', '/', '.', space, unicode letters), so a dense char table
  // would be 64K ints per node for nothing.
  private val trans = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outPat = mutable.ArrayBuffer(-1) // pattern id ending at node
  private val patLen: Array[Int] = patterns.map(_.length)

  patterns.zipWithIndex.foreach { case (p, id) =>
    var s = 0
    p.foreach { c =>
      s = trans(s).getOrElseUpdate(c, {
        trans += mutable.HashMap.empty[Char, Int]
        outPat += -1
        trans.size - 1
      })
    }
    outPat(s) = id // patterns are distinct upstream
  }

  private val fail = new Array[Int](trans.size)
  // Nearest proper-suffix node that is an output (0 = none; the root is
  // never an output) — the standard output-link chain, so a state visit
  // reports ALL patterns ending there, e.g. "sql" inside "sql server".
  private val outLink = new Array[Int](trans.size)

  locally {
    val q = mutable.Queue.empty[Int]
    trans(0).valuesIterator.foreach { s => fail(s) = 0; q += s }
    while (q.nonEmpty) {
      val u = q.dequeue()
      outLink(u) = if (outPat(fail(u)) >= 0) fail(u) else outLink(fail(u))
      trans(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !trans(f).contains(c)) f = fail(f)
        val t = trans(f).getOrElse(c, 0)
        fail(v) = if (t == v) 0 else t
        q += v
      }
    }
  }

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      (c >= 'A' && c <= 'Z') || c == '_'

  /** Java/RE2 `\b`: position p lies between a word char and a non-word char
    * (out-of-range counts as non-word). */
  @inline private def isBoundary(t: String, p: Int): Boolean = {
    val before = p > 0 && isWord(t.charAt(p - 1))
    val after = p < t.length && isWord(t.charAt(p))
    before != after
  }

  /** Ids of every pattern with at least one `\b`-bounded occurrence in
    * `text` (a set — the per-document `set()` semantics all callers want). */
  def matchedIds(text: String): mutable.BitSet = {
    val hits = new mutable.BitSet(patterns.length)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (s != 0 && !trans(s).contains(c)) s = fail(s)
      s = trans(s).getOrElse(c, 0)
      var o = if (outPat(s) >= 0) s else outLink(s)
      while (o != 0) {
        val pid = outPat(o)
        if (!hits(pid)) {
          val start = i + 1 - patLen(pid)
          if (isBoundary(text, start) && isBoundary(text, i + 1)) hits += pid
        }
        o = outLink(o)
      }
      i += 1
    }
    hits
  }

  /** The matched pattern strings themselves, in dictionary order. */
  def matchedPatterns(text: String): Iterator[String] =
    matchedIds(text).iterator.map(patterns)
}
