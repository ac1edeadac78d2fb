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

  /** Exact membership test: is `b` in `edits1(a)`? One delete,
    * adjacent transpose, alphabet replace, or alphabet insert — checked
    * in O(len) without generating the neighborhood. Deletes/transposes
    * are alphabet-free; a replace or insert may only INTRODUCE a char
    * from `Alphabet` (the reference's corrector never invents
    * digits/punctuation, so "15.6K" must not "correct" to a nearby
    * number term). */
  def isOneEdit(a: String, b: String): Boolean = {
    val n = a.length; val m = b.length
    def alpha(c: Char): Boolean = (c >= 'a' && c <= 'z') || c == '_'
    if (m == n - 1) { // delete
      var i = 0
      while (i < m && a.charAt(i) == b.charAt(i)) i += 1
      var j = i
      while (j < m && a.charAt(j + 1) == b.charAt(j)) j += 1
      j == m
    } else if (m == n + 1) { // insert (the new char must be alphabet)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      if (!alpha(b.charAt(i))) return false
      var j = i
      while (j < n && a.charAt(j) == b.charAt(j + 1)) j += 1
      j == n
    } else if (m == n) {
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      if (i == n) return false // identical: zero edits, not one
      // transpose at i?
      if (i + 1 < n && a.charAt(i) == b.charAt(i + 1) &&
          a.charAt(i + 1) == b.charAt(i)) {
        var j = i + 2
        while (j < n && a.charAt(j) == b.charAt(j)) j += 1
        if (j == n) return true
      }
      // replace at i (introduced char must be alphabet)
      if (!alpha(b.charAt(i))) return false
      var j = i + 1
      while (j < n && a.charAt(j) == b.charAt(j)) j += 1
      j == n
    } else false
  }

  /** Distance of candidate `b` from query `q` under correct2's EXACT
    * composed-edit model (b in edits1? 1; b in edits1 of some edits1
    * variant? 2) — `e1` is the precomputed edits1(q) array, generated
    * once per correction and shared across candidates. Composed Norvig
    * edits reach some strings an OSA metric calls distance 3 (e.g.
    * "ca" -> "ac" -> "abc"), so a metric-based verifier would silently
    * diverge from the generate-and-probe path. */
  def composedDist2(q: String, b: String, e1: Array[String]): Int = {
    if (q == b) 0
    else if (isOneEdit(q, b)) 1
    else {
      var i = 0
      while (i < e1.length) {
        if (isOneEdit(e1(i), b)) return 2
        i += 1
      }
      3
    }
  }

  /** SymSpell-style delete-variant index (Garbe's publicly documented
    * symmetric-delete algorithm): every vocabulary term is indexed under
    * the 64-bit hashes of itself and all of its 1- and 2-char-delete
    * variants; a query term generates ITS ≤2-delete variants, unions the
    * posting lists, and verifies exact composed-edit membership
    * (composedDist2 — the same edit model correct2 generates) — O(len²) hash
    * lookups per correction instead of generating the O(len² · |Σ|²)
    * edit-2 string neighborhood (measured 50-190 ms per unknown term on
    * a 150k vocabulary; this path is <1 ms).
    *
    * Hash collisions are harmless: every candidate is distance-verified.
    * Per-variant lists are built in df-descending term order and capped,
    * so crowded variants keep exactly the candidates an argmax-df policy
    * could pick. */
  final class DeleteIndex private (terms: Array[String], dfs: Array[Long],
                                   map: java.util.HashMap[java.lang.Long, Array[Int]],
                                   truncated: java.util.HashSet[java.lang.Long]) {

    /** Buckets that hit the list cap at build time. A truncated bucket
      * keeps its 4096 HIGHEST-df members, but the sole distance-1
      * candidate for some query could in principle be the evicted one —
      * queries whose variant set touches a truncated bucket therefore
      * take the exact generate-and-probe fallback below instead of
      * silently diverging from the argmax-df-at-min-distance policy. */
    def nTruncatedBuckets: Int = truncated.size()

    private def touchesTruncated(q: String): Boolean = {
      if (truncated.isEmpty) return false
      val vs = DeleteIndex.variants(q)
      var i = 0
      while (i < vs.length) {
        if (truncated.contains(vs(i))) return true
        i += 1
      }
      false
    }

    /** Self-contained vocab lookup for the exact fallback (the index
      * already carries every (term, df)). */
    @transient private lazy val byTerm: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](terms.length * 2)
      var i = 0
      while (i < terms.length) { m.put(terms(i), dfs(i)); i += 1 }
      m
    }

    private def exactFallback(q: String): String =
      Spell.correct2(q, cands => {
        val out = Map.newBuilder[String, Long]
        cands.foreach { c =>
          val d = byTerm.get(c)
          if (d != null) out += c -> d.longValue()
        }
        out.result()
      })

    /** Reference policy over the index: known → unchanged; else argmax
      * df among distance-1 candidates; else among distance-2; ties
      * lexicographic; none → unchanged. Queries touching a truncated
      * bucket route to the exact generate-and-probe path (same policy,
      * immune to capped-list eviction). */
    def correct(q: String): String = {
      if (touchesTruncated(q)) return exactFallback(q)
      val cands = new java.util.HashSet[Integer]()
      DeleteIndex.variants(q).foreach { h =>
        val hit = map.get(h)
        if (hit != null) { var i = 0; while (i < hit.length) { cands.add(hit(i)); i += 1 } }
      }
      var best: String = null
      var bestDf = -1L
      var bestDist = 3
      lazy val e1 = edits1(q).toArray // shared across candidate checks
      val it = cands.iterator()
      while (it.hasNext) {
        val idx = it.next().intValue()
        val t = terms(idx)
        if (t == q) return q
        val d = composedDist2(q, t, e1)
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

    /** Binary artifact dump (format DeleteIndex.Magic): vocabulary, the
      * variant-hash posting map, and the truncated-bucket set. Written
      * once at index-build time; an executor materializes the whole
      * structure with one sequential read instead of re-hashing every
      * vocab term's O(len²) delete neighborhood per JVM. */
    def save(out: java.io.DataOutputStream): Unit = {
      out.writeInt(DeleteIndex.Magic)
      out.writeInt(terms.length)
      var i = 0
      while (i < terms.length) {
        out.writeUTF(terms(i)); out.writeLong(dfs(i)); i += 1
      }
      out.writeInt(map.size())
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeLong(e.getKey.longValue())
        val v = e.getValue
        out.writeInt(v.length)
        var j = 0
        while (j < v.length) { out.writeInt(v(j)); j += 1 }
      }
      out.writeInt(truncated.size())
      val tit = truncated.iterator()
      while (tit.hasNext) out.writeLong(tit.next().longValue())
    }
  }

  object DeleteIndex {
    val Magic = 0x47535031 // "GSP1"
    /** Longest term that gets 2-delete variants (len²/2 of them); longer
      * terms index only 1-deletes — so queries beyond this length have
      * edit-1 reach only (a DOCUMENTED approximation: correcting a
      * 30+-char identifier at distance 2 is not a realistic query need,
      * and the cap bounds index memory). */
    val MaxLen2 = 24
    /** Safety valve only: total index entries are bounded by the sum of
      * per-term variant counts regardless of this cap, so it is set far
      * above any realistic per-variant crowd — a tight cap (64 in an
      * earlier build) could evict the sole distance-1 candidate from a
      * crowded variant list and silently change the correction. */
    val MaxListLen = 4096

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

    /** fnv of s with the chars at original positions skip1 (and skip2,
      * when >= 0) removed — the hash of a delete-variant WITHOUT
      * materializing the variant string (the StringBuilder-per-variant
      * form made the build-time artifact phase allocation-bound:
      * vocab × len²/2 builders). Must stay bit-identical to
      * fnv(variant). */
    private def fnvSkip(s: String, skip1: Int, skip2: Int): Long = {
      var h = -3750763034362895579L
      var i = 0
      val n = s.length
      while (i < n) {
        if (i != skip1 && i != skip2) {
          h ^= s.charAt(i)
          h *= 1099511628211L
        }
        i += 1
      }
      h
    }

    /** Hashes of s and its distinct 1- and 2-delete variants. */
    private[Spell] def variants(s: String): Array[Long] = {
      val n = s.length
      val two = n <= MaxLen2
      val cap = 1 + n + (if (two) n * (n - 1) / 2 else 0)
      val buf = new Array[Long](cap)
      var c = 0
      buf(c) = fnv(s); c += 1
      var i = 0
      while (i < n) {
        buf(c) = fnvSkip(s, i, -1); c += 1
        if (two) {
          var j = i + 1
          while (j < n) { buf(c) = fnvSkip(s, i, j); c += 1; j += 1 }
        }
        i += 1
      }
      // distinct (deleting either of two equal adjacent chars collides):
      // sort + unique in place of the boxed HashSet
      java.util.Arrays.sort(buf, 0, c)
      var w = 0
      var r = 0
      while (r < c) {
        if (w == 0 || buf(r) != buf(w - 1)) { buf(w) = buf(r); w += 1 }
        r += 1
      }
      if (w == cap) buf else java.util.Arrays.copyOf(buf, w)
    }

    /** Growable bucket used only during build: copy-per-append on plain
      * arrays made crowded buckets O(k²) (a 4096-cap bucket cost 8M
      * element copies). */
    private final class IntBuf(first: Int) {
      var arr: Array[Int] = new Array[Int](4)
      var len: Int = 1
      arr(0) = first
      def add(v: Int): Unit = {
        if (len == arr.length) arr = java.util.Arrays.copyOf(arr, len * 2)
        arr(len) = v; len += 1
      }
      def trimmed: Array[Int] =
        if (len == arr.length) arr else java.util.Arrays.copyOf(arr, len)
    }

    /** Upper bound on delete-index entries for a vocabulary — the SAME
      * formula the lazy engine guard and the build-time artifact phase
      * apply (1 + len + len²/2 for 2-delete-eligible terms), stopping
      * early once `budget` is exceeded. */
    def entryEstimate(terms: Iterator[String], budget: Long): Long = {
      var entries = 0L
      while (terms.hasNext && entries <= budget) {
        val n = terms.next().length.toLong
        entries += 1 + n + (if (n <= MaxLen2) n * (n - 1) / 2 else 0L)
      }
      entries
    }

    def build(vocab: Iterable[(String, Long)],
              maxListLen: Int = MaxListLen): DeleteIndex = {
      // df-desc insertion order => capped lists keep the argmax-df picks
      val sorted = vocab.toArray.sortBy { case (t, df) => (-df, t) }
      val terms = sorted.map(_._1)
      val dfs = sorted.map(_._2)
      // variant hashing is the CPU of the build and embarrassingly
      // parallel; precompute per-term hash arrays across a small pool
      // (determinism unaffected — insertion below stays sequential
      // term-major, which is what the df-desc cap semantics need)
      val varr = new Array[Array[Long]](terms.length)
      val nThreads =
        if (terms.length < 4096) 1
        else math.min(8, Runtime.getRuntime.availableProcessors())
      if (nThreads == 1) {
        var i = 0
        while (i < terms.length) { varr(i) = variants(terms(i)); i += 1 }
      } else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
        try {
          val chunk = (terms.length + nThreads - 1) / nThreads
          (0 until nThreads).map { t =>
            pool.submit(new Runnable {
              def run(): Unit = {
                var i = t * chunk
                val end = math.min(terms.length, i + chunk)
                while (i < end) { varr(i) = variants(terms(i)); i += 1 }
              }
            })
          }.foreach(_.get())
        } finally pool.shutdown()
      }
      val bufs = new java.util.HashMap[java.lang.Long, IntBuf](terms.length * 4)
      val truncated = new java.util.HashSet[java.lang.Long]()
      var idx = 0
      while (idx < terms.length) {
        val vs = varr(idx)
        varr(idx) = null // release as consumed
        var v = 0
        while (v < vs.length) {
          val key = java.lang.Long.valueOf(vs(v))
          val cur = bufs.get(key)
          if (cur == null) bufs.put(key, new IntBuf(idx))
          else if (cur.len < maxListLen) cur.add(idx)
          else truncated.add(key) // observable: these route to exact fallback
          v += 1
        }
        idx += 1
      }
      val map = new java.util.HashMap[java.lang.Long, Array[Int]](bufs.size() * 2)
      val it = bufs.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        map.put(e.getKey, e.getValue.trimmed)
      }
      new DeleteIndex(terms, dfs, map, truncated)
    }

    /** Load an artifact written by [[DeleteIndex.save]]. */
    def load(in: java.io.DataInputStream): DeleteIndex = {
      val magic = in.readInt()
      require(magic == Magic, f"bad spell-index magic 0x$magic%08x")
      val n = in.readInt()
      val terms = new Array[String](n)
      val dfs = new Array[Long](n)
      var i = 0
      while (i < n) { terms(i) = in.readUTF(); dfs(i) = in.readLong(); i += 1 }
      val nKeys = in.readInt()
      val map = new java.util.HashMap[java.lang.Long, Array[Int]](nKeys * 2)
      var k = 0
      while (k < nKeys) {
        val key = in.readLong()
        val len = in.readInt()
        val arr = new Array[Int](len)
        var j = 0
        while (j < len) { arr(j) = in.readInt(); j += 1 }
        map.put(key, arr)
        k += 1
      }
      val nTrunc = in.readInt()
      val truncated = new java.util.HashSet[java.lang.Long](nTrunc * 2 + 16)
      var t = 0
      while (t < nTrunc) { truncated.add(in.readLong()); t += 1 }
      new DeleteIndex(terms, dfs, map, truncated)
    }
  }
}
