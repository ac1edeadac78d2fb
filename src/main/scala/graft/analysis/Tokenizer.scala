package graft.analysis

import scala.collection.mutable

/** One parsed document: term -> tf, plus the stats BM25 needs.
  *
  * `docLen` follows the reference's definition exactly: the count of the
  * intermediate token stream AFTER stopword removal but BEFORE
  * normalization/expansion (reference parser_module.py:321 counts
  * `len(self.tokens)`, not emitted terms, so docLen != sum(tf) in general
  * — SURVEY.md §2.3 A2; BM25's dl/avgdl depends on this definition).
  */
final case class TokenizedDoc(
    terms: Map[String, Int],
    positions: Map[String, List[Int]],
    docLen: Int,
    maxTf: Int)

/** Code-profile tokenizer-normalizer: the engine's one generator
  * (text -> term rows), mirroring the reference's parse pipeline
  * (reference parser_module.py:58-241 `parse_sentence`) with the
  * code-payload adaptations from SURVEY.md §2.2:
  *
  *  - F1  whitespace tokenize (code-aware; punkt replaced deliberately)
  *  - F2  stopword filter (english + punct + code keywords fixture)
  *  - F4  non-latin strip (parser_module.py:51-52, 318)
  *  - F6  ascii guard (parser_module.py:243-248)
  *  - F7  number normalization: K/M/B scaling, percent/dollar fusion,
  *        fractions, thousand/million/billion words
  *        (parser_module.py:412-522)
  *  - F8  date-token detection (parser_module.py:331-336)
  *  - F9  hyphen split: whole + parts, all-numeric kept whole
  *        (parser_module.py:338-360)
  *  - F10 identifier split: camelCase/snake_case -> whole + subtokens
  *        (structural analog of hashtag decomposition,
  *        parser_module.py:384-394)
  *  - F11 @mention drop: the @token and its successor
  *        (parser_module.py:147-151)
  *  - F13 url domain: www.X.Y emits middle label (parser_module.py:396-410)
  *  - F14 slash split: parts of len>1 (parser_module.py:187-191)
  *  - F15 leading quote/hyphen + trailing dot trim (parser_module.py:119-123)
  *  - F16 Porter2 stem on purely-alphabetic tokens only
  *        (parser_module.py:195-202)
  *
  * Deliberate divergences from the reference (documented per SURVEY.md
  * §7.4): iteration-order-dependent capital/entity global dicts are
  * replaced by deterministic rules; the tokenizer is a pure function of
  * the text — required for resumable, partition-order-independent builds.
  */
object Tokenizer extends Serializable {

  /** `positions`: F19 position tracking is computed-but-dropped in the
    * reference (indexer.py:108) — off by default to keep the indexing
    * hot path allocation-free; tests that need it opt in. */
  final case class Config(stem: Boolean = true,
                          stopwords: Set[String] = Stopwords.all,
                          plain: Boolean = false,
                          positions: Boolean = false)

  val default: Config = Config()

  /** SQL-replicable profile: lowercase whitespace split, nothing else —
    * lets a DuckDB oracle replay the whole index+BM25 path exactly
    * (SURVEY.md §5 item 5). */
  val plainCfg: Config = Config(stem = false, stopwords = Set.empty,
    plain = true)

  private val identSplit = "(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|_+|\\.".r

  // The digit-token classifiers are hand-rolled equivalents of the
  // regexes `\d{1,4}[-/]\d{1,2}([-/]\d{1,4})?|\d{1,4}\.\d{1,2}\.\d{1,4}`
  // (F8 dates: slash/hyphen in 2-3 parts; dot-dates need all 3 parts so
  // decimal literals fall through to F7), `\d+`, `\d+(\.\d+)?` and
  // `\d+/\d+` — Regex.matches allocates a Matcher per call, and digit
  // tokens probe several patterns each (hot path, BASELINE.md).
  private def digitRun(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    i - i0
  }
  private[analysis] def isDateToken(t: String): Boolean = {
    val n = t.length
    val d1 = digitRun(t, 0)
    if (d1 < 1 || d1 > 4 || d1 >= n) return false
    val sep = t.charAt(d1)
    if (sep == '-' || sep == '/') {
      val d2 = digitRun(t, d1 + 1)
      if (d2 < 1 || d2 > 2) return false
      val p2 = d1 + 1 + d2
      if (p2 == n) return true
      val sep2 = t.charAt(p2)
      if (sep2 != '-' && sep2 != '/') return false
      val d3 = digitRun(t, p2 + 1)
      d3 >= 1 && d3 <= 4 && p2 + 1 + d3 == n
    } else if (sep == '.') {
      val d2 = digitRun(t, d1 + 1)
      if (d2 < 1 || d2 > 2) return false
      val p2 = d1 + 1 + d2
      if (p2 >= n || t.charAt(p2) != '.') return false
      val d3 = digitRun(t, p2 + 1)
      d3 >= 1 && d3 <= 4 && p2 + 1 + d3 == n
    } else false
  }
  private def isAllDigits(t: String): Boolean =
    t.length > 0 && digitRun(t, 0) == t.length
  private def isNumberToken(t: String): Boolean = {
    val d1 = digitRun(t, 0)
    if (d1 == 0) return false
    if (d1 == t.length) return true
    if (t.charAt(d1) != '.') return false
    val d2 = digitRun(t, d1 + 1)
    d2 > 0 && d1 + 1 + d2 == t.length
  }
  private def isFractionToken(t: String): Boolean = {
    val d1 = digitRun(t, 0)
    d1 > 0 && d1 < t.length && t.charAt(d1) == '/' && {
      val d2 = digitRun(t, d1 + 1)
      d2 > 0 && d1 + 1 + d2 == t.length
    }
  }

  def isAscii(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c <= 32 || c >= 128) return false
      i += 1
    }
    true
  }


  /** toLowerCase that allocates only when an upper-case char exists —
    * tokens here are ASCII (post F6 guard), so A-Z is the whole test. */
  private def lowerAscii(t: String): String = {
    var i = 0
    while (i < t.length && !(t.charAt(i) >= 'A' && t.charAt(i) <= 'Z')) i += 1
    if (i == t.length) t else t.toLowerCase(java.util.Locale.ROOT)
  }

  /** Thread-local stem memo: the Zipf head repeats constantly, so most
    * stem calls are cache hits; bounded (cleared at 64k entries), pure
    * (memo of a pure function), and per-thread so uncontended. */
  private val stemCache =
    ThreadLocal.withInitial[java.util.HashMap[String, String]](() =>
      new java.util.HashMap[String, String](1 << 12))
  private def stemCached(l: String): String = {
    val m = stemCache.get()
    val hit = m.get(l)
    if (hit != null) hit
    else {
      val s = Porter2.stem(l)
      if (m.size >= (1 << 16)) m.clear()
      m.put(l, s)
      s
    }
  }

  private def allLowerAlpha(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c < 'a' || c > 'z') return false
      i += 1
    }
    t.length > 0
  }

  /** Open-addressing term->tf counter: the per-token boxed-Integer
    * updates of a LinkedHashMap were a top allocation site in the build
    * (memory bandwidth is the measured thread-scaling ceiling,
    * BASELINE.md); this keeps two flat arrays per document. */
  private[graft] final class Counter(initialCap: Int = 64) {
    private var mask = initialCap - 1
    private var keys = new Array[String](initialCap)
    private var tfs = new Array[Int](initialCap)
    private var n = 0
    def size: Int = n
    def add(t: String): Unit = {
      var i = t.hashCode & mask
      while (keys(i) != null && !(keys(i) == t)) i = (i + 1) & mask
      if (keys(i) == null) {
        if ((n + 1) * 4 > mask * 3) { grow(); add(t); return }
        keys(i) = t; tfs(i) = 1; n += 1
      } else tfs(i) += 1
    }
    private def grow(): Unit = {
      val ok = keys; val ot = tfs
      mask = mask * 2 + 1
      keys = new Array[String](mask + 1)
      tfs = new Array[Int](mask + 1)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null) {
          var j = ok(i).hashCode & mask
          while (keys(j) != null) j = (j + 1) & mask
          keys(j) = ok(i); tfs(j) = ot(i); n += 1
        }
        i += 1
      }
    }
    def maxTf: Int = {
      var m = 0; var i = 0
      while (i < keys.length) { if (keys(i) != null && tfs(i) > m) m = tfs(i); i += 1 }
      m
    }
    def foreachEntry(f: (String, Int) => Unit): Unit = {
      var i = 0
      while (i < keys.length) { if (keys(i) != null) f(keys(i), tfs(i)); i += 1 }
    }
    def toMap: Map[String, Int] = {
      val b = Map.newBuilder[String, Int]
      foreachEntry((k, v) => b += (k -> v))
      b.result()
    }
  }

  /** F7: scale a numeric literal into the reference's K/M/B form.
    * 123 -> "123"; 15600 -> "15.6K"; 1200000 -> "1.2M"; 3.5e9 -> "3.5B".
    * Up to 3 decimals, trailing zeros stripped. */
  def formatNumber(v: Double): String = {
    def fmt(x: Double, suffix: String): String = {
      val r = math.rint(x * 1000) / 1000
      val s = if (r == math.rint(r)) r.toLong.toString
              else BigDecimal(r).bigDecimal.stripTrailingZeros.toPlainString
      s + suffix
    }
    val a = math.abs(v)
    if (a >= 1e9) fmt(v / 1e9, "B")
    else if (a >= 1e6) fmt(v / 1e6, "M")
    else if (a >= 1e3) fmt(v / 1e3, "K")
    else fmt(v, "")
  }

  /** Trim F15: leading quotes/hyphens, trailing dots/commas/quotes.
    * Index-based: the dropWhile/reverse chain allocated 4 strings per
    * token; this allocates at most one (usually zero — trimmed forms
    * are interned too). */
  private def trim(t: String): String = {
    var s = 0
    var e = t.length
    while (s < e && { val c = t.charAt(s)
      c == '\'' || c == '"' || c == '-' || c == '`' }) s += 1
    while (e > s && ".,'\"`;:!?".indexOf(t.charAt(e - 1)) >= 0) e -= 1
    if (s == 0 && e == t.length) t else internerTL.get().intern(t, s, e)
  }

  /** F4 non-latin strip, hand-rolled: the regex `replaceAllIn` on whole
    * documents was the single hottest spot in the build (thread dumps),
    * and ASCII-only docs (the common case) take a zero-allocation fast
    * path. Semantics identical to replacing `[^\\u0000-\\u024F]` with "". */
  private def stripNonLatin(s: String): String = {
    var i = 0
    while (i < s.length && s.charAt(i) <= 'ɏ') i += 1
    if (i == s.length) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= 'ɏ') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Thread-local open-addressing span interner: token text repeats
    * heavily across documents (the Zipf head plus a bounded identifier
    * vocabulary), so most "substring" calls can return an existing
    * String instead of allocating a new one. Allocation is writes —
    * interning turns the tokenizer's dominant heap traffic into
    * read-only probes, which is exactly the memory-bandwidth pressure
    * that caps single-box thread scaling (BASELINE.md). Cleared wholesale
    * when full (high-cardinality numeric/url tokens can't grow it
    * unboundedly); pure: interning only dedups identical strings. */
  private final class Interner {
    private val cap = 1 << 15
    private val mask = cap - 1
    private val keys = new Array[String](cap)
    private var n = 0
    private def regionEq(k: String, s: String, start: Int): Boolean = {
      var i = 0
      val len = k.length
      while (i < len) {
        if (k.charAt(i) != s.charAt(start + i)) return false
        i += 1
      }
      true
    }
    def intern(s: String, start: Int, end: Int): String = {
      var h = 0
      var i = start
      while (i < end) { h = 31 * h + s.charAt(i); i += 1 }
      var j = h & mask
      var k = keys(j)
      while (k != null) {
        if (k.length == end - start && regionEq(k, s, start)) return k
        j = (j + 1) & mask
        k = keys(j)
      }
      val t = s.substring(start, end)
      if (n >= cap - (cap >> 2)) { // keep probe chains short: clear at 75%
        java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
        n = 0
        j = h & mask
      }
      keys(j) = t
      n += 1
      t
    }
  }
  private val internerTL =
    ThreadLocal.withInitial[Interner](() => new Interner)

  /** Whitespace split without the regex engine (split("\\s+") compiles
    * and allocates per call); leading whitespace yields no empty first
    * token. Tokens are interned (see Interner). */
  private[analysis] def fastSplit(s: String): Array[String] = {
    val in = internerTL.get()
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out += in.intern(s, start, i)
    }
    out.toArray
  }

  /** The intermediate token stream whose length IS docLen (A2): trimmed,
    * non-empty, mention-pairs dropped, ascii-guarded, stopwords dropped. */
  def preTokens(text: String, cfg: Config = default): Array[String] = {
    val cleaned = stripNonLatin(text)
    val raw = fastSplit(cleaned)
    val out = mutable.ArrayBuffer.empty[String]
    var skipNext = false
    var i = 0
    while (i < raw.length) {
      val r = raw(i)
      if (skipNext) skipNext = false
      else if (r.startsWith("@")) skipNext = true // F11: drop @tok + next
      else {
        val t = trim(r)
        if (t.nonEmpty && isAscii(t) && !cfg.stopwords(lowerAscii(t)))
          out += t
      }
      i += 1
    }
    out.toArray
  }

  /** Expand one pre-token into emitted terms (F7-F16) via `emit` — the
    * callback form keeps the hot path free of per-token List/Option/
    * tuple allocations (the common case is exactly one emitted term).
    * `next` (null = none) enables the reference's neighbor fusion;
    * returns consumedNext. */
  private[analysis] def expandInto(tok: String, next: String, cfg: Config,
                                   emit: String => Unit): Boolean = {
    val lower = lowerAscii(tok)
    // hot-path gate: every digit-driven rule (F7/F8) needs a digit —
    // one char scan replaces four regex attempts on the common case
    val hasDigit = {
      var i = 0; var found = false
      while (i < tok.length && !found) {
        if (tok.charAt(i) >= '0' && tok.charAt(i) <= '9') found = true
        i += 1
      }
      found
    }

    // F8: date tokens kept verbatim
    if (hasDigit && isDateToken(tok)) { emit(tok); return false }

    // F7: fractions — "3/4" verbatim; "25" + "3/4" fuse into one term
    if (hasDigit && isFractionToken(tok)) { emit(tok); return false }
    if (hasDigit && isAllDigits(tok) && next != null &&
        isFractionToken(next)) {
      emit(s"$tok $next"); return true
    }

    // F7: numbers — quantity-word / percent / dollar fusion, K/M/B scale
    if (hasDigit && isNumberToken(tok)) {
      val v = tok.toDouble
      val nx = if (next == null) null else lowerAscii(next)
      nx match {
        case "thousand" => emit(formatNumber(v * 1e3)); return true
        case "million" => emit(formatNumber(v * 1e6)); return true
        case "billion" => emit(formatNumber(v * 1e9)); return true
        case "percent" | "percentage" | "%" =>
          emit(formatNumber(v) + "%"); return true
        case "dollar" | "dollars" | "$" =>
          emit(formatNumber(v) + "$"); return true
        case _ => emit(formatNumber(v)); return false
      }
    }
    // F7: sign-prefixed numbers: $100 -> 100$, 45% stays 45%
    if (hasDigit && tok.length > 1 && tok.head == '$' && isNumberToken(tok.tail)) {
      emit(formatNumber(tok.tail.toDouble) + "$"); return false
    }
    if (hasDigit && tok.length > 1 && tok.last == '%' && isNumberToken(tok.dropRight(1))) {
      emit(formatNumber(tok.dropRight(1).toDouble) + "%"); return false
    }

    // F13: urls — www.X.Y emits the middle label; other urls the host
    if (lower.startsWith("http://") || lower.startsWith("https://") ||
        lower.startsWith("www.")) {
      val host = lower.stripPrefix("http://").stripPrefix("https://")
        .takeWhile(c => c != '/' && c != '?' && c != '#')
      val labels = host.split('.').filter(_.nonEmpty)
      val dom = if (labels.length >= 2 && labels(0) == "www") Some(labels(1))
                else if (labels.length >= 2) Some(labels(0))
                else None
      dom.filterNot(cfg.stopwords).foreach(emit)
      return false
    }

    // F16 applied inside: stem alpha-only terms, like the reference
    def finishEmit(t: String): Unit = {
      val l = lowerAscii(t)
      if (l.isEmpty || cfg.stopwords(l)) ()
      else if (cfg.stem && allLowerAlpha(l)) emit(stemCached(l))
      else emit(l)
    }

    // F9: hyphen split — whole + parts; all-numeric compound stays whole
    if (tok.contains('-')) {
      val parts = tok.split('-').filter(_.nonEmpty)
      if (parts.forall(isAllDigits)) { emit(lower); return false }
      // rare branch: keep the List-based distinct semantics verbatim
      val sub = parts.toList.flatMap { p =>
        if (isAllDigits(p)) Some(p)
        else {
          val l = lowerAscii(p)
          if (l.isEmpty || cfg.stopwords(l)) None
          else if (cfg.stem && allLowerAlpha(l)) Some(stemCached(l))
          else Some(l)
        }
      }
      (lower :: sub).distinct.foreach(emit)
      return false
    }

    // F14: slash split (not a url) — parts with len > 1
    if (tok.contains('/')) {
      tok.split('/').iterator.filter(_.length > 1).foreach(finishEmit)
      return false
    }

    // F10: identifier split — camelCase / snake_case / dotted
    // gate: splitting can only trigger on uppercase, '_' or '.'
    val canSplit = {
      var i = 0; var found = false
      while (i < tok.length && !found) {
        val c = tok.charAt(i)
        if ((c >= 'A' && c <= 'Z') || c == '_' || c == '.') found = true
        i += 1
      }
      found
    }
    if (canSplit) {
      val parts = identSplit.split(tok).filter(_.nonEmpty)
      if (parts.length > 1) {
        val whole = if (cfg.stopwords(lower)) Nil else List(lower)
        val sub = parts.toList.flatMap { p =>
          if (isAllDigits(p)) Some(formatNumber(p.toDouble))
          else {
            val l = lowerAscii(p)
            if (l.isEmpty || cfg.stopwords(l)) None
            else if (cfg.stem && allLowerAlpha(l)) Some(stemCached(l))
            else Some(l)
          }
        }
        (whole ++ sub).distinct.foreach(emit)
        return false
      }
    }

    finishEmit(tok)
    false
  }

  /** Thread-local expansion memo: token -> the exact term array its
    * expansion emits. Valid only for digit-free tokens (every
    * next-token fusion rule, F7, requires a digit) and keyed by the
    * interned token's REFERENCE (identity hash + eq — the interner
    * guarantees one live String per distinct token text per thread).
    * Identifier-split regexes, url parsing and stemming thus run once
    * per distinct token, not once per occurrence; repeat occurrences
    * emit cached refs with zero allocation. Reset when the tokenizer
    * config instance changes (expansion depends on cfg). */
  private final class ExpandMemo {
    private val cap = 1 << 14
    private val mask = cap - 1
    private val keys = new Array[String](cap)
    private val vals = new Array[Array[String]](cap)
    private var n = 0
    private var cfgRef: Config = null
    def reset(cfg: Config): Unit =
      if (cfg ne cfgRef) {
        java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
        n = 0
        cfgRef = cfg
      }
    def get(tok: String): Array[String] = {
      var j = System.identityHashCode(tok) & mask
      while (keys(j) ne null) {
        if (keys(j) eq tok) return vals(j)
        j = (j + 1) & mask
      }
      null
    }
    def put(tok: String, terms: Array[String]): Unit = {
      if (n >= cap - (cap >> 2)) {
        java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
        n = 0
      }
      var j = System.identityHashCode(tok) & mask
      while (keys(j) ne null) j = (j + 1) & mask
      keys(j) = tok
      vals(j) = terms
      n += 1
    }
  }
  private val memoTL =
    ThreadLocal.withInitial[ExpandMemo](() => new ExpandMemo)
  private val emptyTerms = new Array[String](0)

  private def tokenHasDigit(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= '0' && c <= '9') return true
      i += 1
    }
    false
  }

  /** Hot-path core: text -> (term counter, docLen). No Map/List/boxed
    * allocation per term — this is what the index build runs. */
  private[graft] def tokenizeRaw(text: String, cfg: Config): (Counter, Int) = {
    if (cfg.plain) {
      val toks = fastSplit(text.toLowerCase(java.util.Locale.ROOT))
      val c = new Counter()
      var i = 0
      while (i < toks.length) { c.add(toks(i)); i += 1 }
      return (c, toks.length)
    }
    val pre = preTokens(text, cfg)
    val c = new Counter()
    val memo = memoTL.get()
    memo.reset(cfg)
    val rec = new mutable.ArrayBuffer[String](4)
    val recFn: String => Unit = rec += _
    var i = 0
    while (i < pre.length) {
      val tok = pre(i)
      val memoizable = !tokenHasDigit(tok)
      val cached = if (memoizable) memo.get(tok) else null
      if (cached != null) {
        var m = 0
        while (m < cached.length) { c.add(cached(m)); m += 1 }
        i += 1
      } else if (memoizable) {
        rec.clear()
        expandInto(tok, null, cfg, recFn) // digit-free: never consumes next
        val terms = if (rec.isEmpty) emptyTerms else rec.toArray
        memo.put(tok, terms)
        var m = 0
        while (m < terms.length) { c.add(terms(m)); m += 1 }
        i += 1
      } else {
        rec.clear()
        val next = if (i + 1 < pre.length) pre(i + 1) else null
        val consumed = expandInto(tok, next, cfg, recFn)
        var m = 0
        while (m < rec.length) { c.add(rec(m)); m += 1 }
        i += (if (consumed) 2 else 1)
      }
    }
    (c, pre.length)
  }

  /** Full pipeline: text -> TokenizedDoc. Pure; safe in typed flatMaps.
    * Position tracking (F19, opt-in) takes the slower Map-building path;
    * everything else delegates to the allocation-lean core. */
  def tokenize(text: String, cfg: Config = default): TokenizedDoc = {
    if (!cfg.positions) {
      val (c, docLen) = tokenizeRaw(text, cfg)
      return TokenizedDoc(c.toMap, Map.empty, docLen, c.maxTf)
    }
    if (cfg.plain) {
      // plain + positions must agree with tokenizeRaw's plain shortcut
      // (whitespace-lowercase), NOT the rule pipeline below — the
      // positional index (PosStore) is built on this path and its
      // phrase results are oracle-compared against the whitespace token
      // stream position-for-position. Known boundary of that agreement
      // (pre-existing for the term-set paths, stated here because
      // positions tighten it to per-token alignment): fastSplit splits
      // on Character.isWhitespace, a superset of regex \s — exotic
      // Unicode separators (U+2028, U+1680, U+2000-U+200A, U+3000)
      // split here but not in the SQL oracles' regexp_split. The
      // oracle corpora are ASCII-whitespace; a corpus that isn't needs
      // its oracle tokenizer aligned first. Lowercasing is pinned to
      // Locale.ROOT engine-wide so a tr-TR JVM can't fold 'I' to a
      // dotless ı that Spark/DuckDB lower() would not produce.
      val toks = fastSplit(text.toLowerCase(java.util.Locale.ROOT))
      val tf = mutable.LinkedHashMap.empty[String, Int]
      val pos = mutable.LinkedHashMap.empty[String, List[Int]]
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        tf.updateWith(t) { c => Some(c.getOrElse(0) + 1) }
        pos.updateWith(t) { l => Some(i :: l.getOrElse(Nil)) }
        i += 1
      }
      val maxTf = if (tf.isEmpty) 0 else tf.valuesIterator.max
      return TokenizedDoc(tf.toMap, pos.view.mapValues(_.reverse).toMap,
        toks.length, maxTf)
    }
    val pre = preTokens(text, cfg)
    val tf = mutable.LinkedHashMap.empty[String, Int]
    val pos = mutable.LinkedHashMap.empty[String, List[Int]]
    var emitted = 0
    val emitFn: String => Unit = { t =>
      tf.updateWith(t) { c => Some(c.getOrElse(0) + 1) }
      pos.updateWith(t) { l => Some(emitted :: l.getOrElse(Nil)) }
      emitted += 1
    }
    var i = 0
    while (i < pre.length) {
      val next = if (i + 1 < pre.length) pre(i + 1) else null
      val consumed = expandInto(pre(i), next, cfg, emitFn)
      i += (if (consumed) 2 else 1)
    }
    val maxTf = if (tf.isEmpty) 0 else tf.valuesIterator.max
    TokenizedDoc(tf.toMap, pos.view.mapValues(_.reverse).toMap,
      pre.length, maxTf)
  }

  /** Query-mode parse (reference parser_module.py:250-269 / SURVEY Q1/A10):
    * same pipeline; returns term -> tf. */
  def tokenizeQuery(q: String, cfg: Config = default): Map[String, Int] =
    tokenize(q, cfg).terms

  /** Ordered token sequence (phrase queries need ORDER, which the
    * tf map erases): the emitted tokens sorted by their positions.
    * Runs the positions-tracking path regardless of cfg.positions. */
  def tokenizeSeq(text: String, cfg: Config = default): Seq[String] = {
    val td = tokenize(text, cfg.copy(positions = true))
    td.positions.toSeq
      .flatMap { case (t, ps) => ps.map(p => (p, t)) }
      .sortBy(_._1).map(_._2)
  }
}
