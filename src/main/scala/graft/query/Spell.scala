package graft.query

/** Spell correction for unknown query terms (reference searcher.py:32,
  * 76-119 / SURVEY Q2): generate all edit-distance-1 candidates over a
  * bounded alphabet and pick the candidate with MAX document frequency
  * in the index — exactly the reference's argmax-df policy, minus its
  * latent mutate-while-iterating bug (we operate on a copy; SURVEY Q2
  * note).
  */
object Spell {

  val Alphabet: Array[Char] = ('a' to 'z').toArray :+ '_'

  /** All distinct edit-distance-1 variants: deletes, transposes,
    * replaces, inserts. Bounded: O(len * |alphabet|). */
  def edits1(w: String): Iterator[String] = {
    val n = w.length
    val deletes = (0 until n).iterator.map(i => w.take(i) + w.drop(i + 1))
    val transposes = (0 until n - 1).iterator.map(i =>
      w.take(i) + w(i + 1) + w(i) + w.drop(i + 2))
    val replaces = for {
      i <- (0 until n).iterator; c <- Alphabet.iterator if c != w(i)
    } yield w.take(i) + c + w.drop(i + 1)
    val inserts = for {
      i <- (0 to n).iterator; c <- Alphabet.iterator
    } yield w.take(i) + c + w.drop(i)
    (deletes ++ transposes ++ replaces ++ inserts).distinct
  }

  /** Correct `term` against a df lookup: known terms pass through;
    * unknown terms become the edit-1 candidate with max df (ties by
    * lexicographic order for determinism); no candidate → unchanged. */
  def correct(term: String, df: String => Option[Long]): String = {
    if (df(term).isDefined) return term
    val cands = edits1(term)
      .flatMap(c => df(c).map(d => (c, d)))
      .toSeq
    if (cands.isEmpty) term
    else cands.minBy { case (c, d) => (-d, c) }._1
  }

  /** Full reference policy incl. the edit-2 fallback (pyspellchecker's
    * candidates() reaches edit distance 2, searcher.py:94-95): known →
    * unchanged; else argmax-df over known edit-1s; else over known
    * edit-2s; else unchanged. `dfBatch` resolves many candidates in one
    * lookup so a non-preloaded engine pays ONE dictionary scan per
    * stage, not one per candidate. `maxEdit2` bounds the second stage's
    * candidate set (deterministic prefix of the generation order) so a
    * pushdown-scan dictionary isn't handed a quarter-million-term
    * predicate. */
  def correct2(term: String, dfBatch: Seq[String] => Map[String, Long],
               maxEdit2: Int = Int.MaxValue): String = {
    if (dfBatch(Seq(term)).contains(term)) return term
    val e1 = edits1(term).toSeq
    def best(known: Map[String, Long]): String =
      known.toSeq.minBy { case (c, d) => (-d, c) }._1
    val known1 = dfBatch(e1)
    if (known1.nonEmpty) return best(known1)
    val seen = scala.collection.mutable.HashSet(term)
    seen ++= e1
    val e2 = e1.iterator.flatMap(edits1).filter(seen.add).take(maxEdit2).toSeq
    val known2 = dfBatch(e2)
    if (known2.nonEmpty) best(known2) else term
  }

  /** Optimal-string-alignment (Damerau-Levenshtein with adjacent
    * transposition) distance from query `a` to candidate `b`, early-exit
    * when it must exceed `cutoff`. Matches the edit MODEL of `edits1`
    * exactly: deletes and transpositions are free of alphabet
    * constraints, but an insert or substitution may only INTRODUCE a
    * char from `Alphabet` — the reference's corrector never invents
    * digits/punctuation, so "15.6K" must not "correct" to a nearby
    * number term. */
  def osaDistanceAlpha(a: String, b: String, cutoff: Int): Int = {
    val n = a.length; val m = b.length
    if (math.abs(n - m) > cutoff) return cutoff + 1
    val big = cutoff + 1
    def allowed(c: Char): Boolean = (c >= 'a' && c <= 'z') || c == '_'
    var prev2 = new Array[Int](m + 1)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j0 = 0
    while (j0 <= m) {
      // inserting b's first j chars into an empty query
      prev(j0) =
        if (j0 == 0) 0
        else if (prev(j0 - 1) >= big || !allowed(b.charAt(j0 - 1))) big
        else prev(j0 - 1) + 1
      j0 += 1
    }
    var i = 1
    while (i <= n) {
      cur(0) = i
      var rowMin = cur(0)
      var j = 1
      while (j <= m) {
        val bc = b.charAt(j - 1)
        val same = a.charAt(i - 1) == bc
        var d = prev(j) + 1 // delete from query: always allowed
        if (same && prev(j - 1) < d) d = prev(j - 1)
        if (!same && allowed(bc) && prev(j - 1) + 1 < d) d = prev(j - 1) + 1 // substitute
        if (allowed(bc) && cur(j - 1) + 1 < d) d = cur(j - 1) + 1 // insert
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == bc && prev2(j - 2) + 1 < d)
          d = prev2(j - 2) + 1 // transpose: always allowed
        if (d > big) d = big
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (rowMin > cutoff) return big
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** SymSpell-style delete-variant index (Garbe's publicly documented
    * symmetric-delete algorithm): every vocabulary term is indexed under
    * the 64-bit hashes of itself and all of its 1- and 2-char-delete
    * variants; a query term generates ITS ≤2-delete variants, unions the
    * posting lists, and verifies true OSA distance — O(len²) hash
    * lookups per correction instead of generating the O(len² · |Σ|²)
    * edit-2 string neighborhood (measured 50-190 ms per unknown term on
    * a 150k vocabulary; this path is <1 ms).
    *
    * Hash collisions are harmless: every candidate is distance-verified.
    * Per-variant lists are built in df-descending term order and capped,
    * so crowded variants keep exactly the candidates an argmax-df policy
    * could pick. */
  final class DeleteIndex private (terms: Array[String], dfs: Array[Long],
                                   map: java.util.HashMap[java.lang.Long, Array[Int]]) {

    /** Reference policy over the index: known → unchanged; else argmax
      * df among distance-1 candidates; else among distance-2; ties
      * lexicographic; none → unchanged. */
    def correct(q: String): String = {
      val cands = new java.util.HashSet[Integer]()
      DeleteIndex.variants(q).foreach { h =>
        val hit = map.get(h)
        if (hit != null) { var i = 0; while (i < hit.length) { cands.add(hit(i)); i += 1 } }
      }
      var best: String = null
      var bestDf = -1L
      var bestDist = 3
      val it = cands.iterator()
      while (it.hasNext) {
        val idx = it.next().intValue()
        val t = terms(idx)
        if (t == q) return q
        val d = osaDistanceAlpha(q, t, 2)
        if (d <= 2) {
          val df = dfs(idx)
          if (d < bestDist ||
              (d == bestDist && (df > bestDf || (df == bestDf && (best == null || t < best))))) {
            best = t; bestDf = df; bestDist = d
          }
        }
      }
      if (best == null) q else best
    }
  }

  object DeleteIndex {
    /** Longest term that gets 2-delete variants (len²/2 of them); longer
      * terms index only 1-deletes — correcting a 30+-char identifier is
      * not a realistic query need, bounding memory. */
    val MaxLen2 = 24
    val MaxListLen = 64

    private def fnv(s: CharSequence): Long = {
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var i = 0
      while (i < s.length) {
        h ^= s.charAt(i)
        h *= 1099511628211L
        i += 1
      }
      h
    }

    /** Hashes of s and its distinct 1- and 2-delete variants. */
    private[Spell] def variants(s: String): Array[Long] = {
      val out = new java.util.HashSet[java.lang.Long]()
      out.add(fnv(s))
      val n = s.length
      val sb = new java.lang.StringBuilder(n)
      var i = 0
      while (i < n) {
        sb.setLength(0); sb.append(s, 0, i).append(s, i + 1, n)
        out.add(fnv(sb))
        if (n <= MaxLen2) {
          var j = i + 1
          while (j < n) { // delete chars at original positions i and j
            val sb2 = new java.lang.StringBuilder(n)
            sb2.append(s, 0, i).append(s, i + 1, j).append(s, j + 1, n)
            out.add(fnv(sb2))
            j += 1
          }
        }
        i += 1
      }
      val arr = new Array[Long](out.size())
      val it = out.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
      arr
    }

    def build(vocab: Iterable[(String, Long)]): DeleteIndex = {
      // df-desc insertion order => capped lists keep the argmax-df picks
      val sorted = vocab.toArray.sortBy { case (t, df) => (-df, t) }
      val terms = sorted.map(_._1)
      val dfs = sorted.map(_._2)
      val map = new java.util.HashMap[java.lang.Long, Array[Int]](terms.length * 4)
      var idx = 0
      while (idx < terms.length) {
        val vs = variants(terms(idx))
        var v = 0
        while (v < vs.length) {
          val key = java.lang.Long.valueOf(vs(v))
          val cur = map.get(key)
          if (cur == null) map.put(key, Array(idx))
          else if (cur.length < MaxListLen) {
            val nw = java.util.Arrays.copyOf(cur, cur.length + 1)
            nw(cur.length) = idx
            map.put(key, nw)
          }
          v += 1
        }
        idx += 1
      }
      new DeleteIndex(terms, dfs, map)
    }
  }
}
