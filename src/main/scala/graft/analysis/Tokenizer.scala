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

  private val nonLatin = "[^\\u0000-\\u024F]".r
  private val datePat = "\\d{1,4}[-./]\\d{1,2}([-./]\\d{1,4})?".r
  private val allDigits = "\\d+".r
  private val numberPat = "\\d+(\\.\\d+)?".r
  private val fractionPat = "\\d+/\\d+".r
  private val identSplit = "(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|_+|\\.".r

  def isAscii(t: String): Boolean = t.forall(c => c > 32 && c < 128)

  private def isNumber(t: String): Boolean = numberPat.matches(t)

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

  /** Trim F15: leading quotes/hyphens, trailing dots/commas/quotes. */
  private def trim(t: String): String =
    t.dropWhile(c => c == '\'' || c == '"' || c == '-' || c == '`')
      .reverse.dropWhile(c => ".,'\"`;:!?".indexOf(c) >= 0).reverse

  /** The intermediate token stream whose length IS docLen (A2): trimmed,
    * non-empty, mention-pairs dropped, ascii-guarded, stopwords dropped. */
  def preTokens(text: String, cfg: Config = default): Array[String] = {
    val cleaned = nonLatin.replaceAllIn(text, "")
    val raw = cleaned.split("\\s+")
    val out = mutable.ArrayBuffer.empty[String]
    var skipNext = false
    var i = 0
    while (i < raw.length) {
      val r = raw(i)
      if (skipNext) skipNext = false
      else if (r.startsWith("@")) skipNext = true // F11: drop @tok + next
      else {
        val t = trim(r)
        if (t.nonEmpty && isAscii(t) && !cfg.stopwords(t.toLowerCase))
          out += t
      }
      i += 1
    }
    out.toArray
  }

  /** Expand one pre-token into emitted terms (F7-F16). The `next` token
    * enables the reference's neighbor fusion; returns (terms, consumedNext). */
  private[analysis] def expand(tok: String, next: Option[String],
                               cfg: Config): (List[String], Boolean) = {
    val lower = tok.toLowerCase
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
    if (hasDigit && datePat.matches(tok)) return (List(tok), false)

    // F7: fractions — "3/4" verbatim; "25" + "3/4" fuse into one term
    if (hasDigit && fractionPat.matches(tok)) return (List(tok), false)
    if (hasDigit && allDigits.matches(tok) && next.exists(fractionPat.matches))
      return (List(s"$tok ${next.get}"), true)

    // F7: numbers — quantity-word / percent / dollar fusion, K/M/B scale
    if (hasDigit && isNumber(tok)) {
      val v = tok.toDouble
      next.map(_.toLowerCase) match {
        case Some("thousand") => return (List(formatNumber(v * 1e3)), true)
        case Some("million") => return (List(formatNumber(v * 1e6)), true)
        case Some("billion") => return (List(formatNumber(v * 1e9)), true)
        case Some("percent") | Some("percentage") | Some("%") =>
          return (List(formatNumber(v) + "%"), true)
        case Some("dollar") | Some("dollars") | Some("$") =>
          return (List(formatNumber(v) + "$"), true)
        case _ => return (List(formatNumber(v)), false)
      }
    }
    // F7: sign-prefixed numbers: $100 -> 100$, 45% stays 45%
    if (hasDigit && tok.length > 1 && tok.head == '$' && isNumber(tok.tail))
      return (List(formatNumber(tok.tail.toDouble) + "$"), false)
    if (hasDigit && tok.length > 1 && tok.last == '%' && isNumber(tok.dropRight(1)))
      return (List(formatNumber(tok.dropRight(1).toDouble) + "%"), false)

    // F13: urls — www.X.Y emits the middle label; other urls the host
    if (lower.startsWith("http://") || lower.startsWith("https://") ||
        lower.startsWith("www.")) {
      val host = lower.stripPrefix("http://").stripPrefix("https://")
        .takeWhile(c => c != '/' && c != '?' && c != '#')
      val labels = host.split('.').filter(_.nonEmpty)
      val dom = if (labels.length >= 2 && labels(0) == "www") Some(labels(1))
                else if (labels.length >= 2) Some(labels(0))
                else None
      return (dom.filterNot(cfg.stopwords).toList, false)
    }

    def finish(t: String): Option[String] = {
      val l = t.toLowerCase
      if (l.isEmpty || cfg.stopwords(l)) None
      else if (cfg.stem && l.forall(c => c >= 'a' && c <= 'z'))
        Some(Porter2.stem(l)) // F16: alpha-only, like the reference
      else Some(l)
    }

    // F9: hyphen split — whole + parts; all-numeric compound stays whole
    if (tok.contains('-')) {
      val parts = tok.split('-').filter(_.nonEmpty)
      if (parts.forall(allDigits.matches)) return (List(lower), false)
      val sub = parts.toList.flatMap(p =>
        if (allDigits.matches(p)) Some(p) else finish(p))
      return ((lower :: sub).distinct, false)
    }

    // F14: slash split (not a url) — parts with len > 1
    if (tok.contains('/'))
      return (tok.split('/').filter(_.length > 1).toList
        .flatMap(finish), false)

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
    val parts = if (canSplit) identSplit.split(tok).filter(_.nonEmpty)
                else Array(tok)
    if (parts.length > 1) {
      val whole = if (cfg.stopwords(lower)) Nil else List(lower)
      val sub = parts.toList.flatMap(p =>
        if (allDigits.matches(p)) Some(formatNumber(p.toDouble)) else finish(p))
      return ((whole ++ sub).distinct, false)
    }

    (finish(tok).toList, false)
  }

  /** Full pipeline: text -> TokenizedDoc. Pure; safe in typed flatMaps. */
  def tokenize(text: String, cfg: Config = default): TokenizedDoc = {
    if (cfg.plain) {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val tf = mutable.LinkedHashMap.empty[String, Int]
      toks.foreach(t => tf.updateWith(t)(c => Some(c.getOrElse(0) + 1)))
      val maxTf = if (tf.isEmpty) 0 else tf.valuesIterator.max
      return TokenizedDoc(tf.toMap, Map.empty, toks.length, maxTf)
    }
    val pre = preTokens(text, cfg)
    val tf = mutable.LinkedHashMap.empty[String, Int]
    val pos = mutable.LinkedHashMap.empty[String, List[Int]]
    var i = 0
    var emitted = 0
    while (i < pre.length) {
      val next = if (i + 1 < pre.length) Some(pre(i + 1)) else None
      val (terms, consumed) = expand(pre(i), next, cfg)
      terms.foreach { t =>
        tf.updateWith(t) { c => Some(c.getOrElse(0) + 1) }
        if (cfg.positions)
          pos.updateWith(t) { l => Some(emitted :: l.getOrElse(Nil)) }
        emitted += 1
      }
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
}
