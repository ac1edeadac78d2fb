package graft.analysis

/** Porter2 (Snowball English) stemmer, pure Scala.
  *
  * The reference stems every alphabetic token with NLTK's
  * `SnowballStemmer("english")` (reference stemmer.py:4-14; applied at
  * parser_module.py:195-202 — and note reference search_engine.py:27 sets a
  * lowercase attr while the parser checks `STEMMER`, so stemming is always
  * ON there; here it is a real config knob, default on, SURVEY.md §2.2).
  *
  * No Snowball jar exists in the sandbox (SURVEY.md §7.1), so this is a
  * from-scratch implementation of the published Porter2 algorithm
  * (snowballstem.org/algorithms/english/stemmer.html). Pure function of the
  * input string: safe inside codegen'd expressions and typed flatMaps.
  */
object Porter2 {

  private val vowels = "aeiouy".toSet
  private val doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private def isVowel(w: String, i: Int): Boolean = vowels(w.charAt(i))

  // rule tables hoisted to object scope: stem() runs per token in the
  // indexing hot path, and per-call Seq construction was measurable GC
  private val step2: Seq[(String, String => Option[String])] = Seq(
    "ization" -> (s => Some(s + "ize")),
    "ational" -> (s => Some(s + "ate")),
    "fulness" -> (s => Some(s + "ful")),
    "ousness" -> (s => Some(s + "ous")),
    "iveness" -> (s => Some(s + "ive")),
    "tional" -> (s => Some(s + "tion")),
    "biliti" -> (s => Some(s + "ble")),
    "lessli" -> (s => Some(s + "less")),
    "entli" -> (s => Some(s + "ent")),
    "ation" -> (s => Some(s + "ate")),
    "alism" -> (s => Some(s + "al")),
    "aliti" -> (s => Some(s + "al")),
    "ousli" -> (s => Some(s + "ous")),
    "iviti" -> (s => Some(s + "ive")),
    "fulli" -> (s => Some(s + "ful")),
    "enci" -> (s => Some(s + "ence")),
    "anci" -> (s => Some(s + "ance")),
    "abli" -> (s => Some(s + "able")),
    "izer" -> (s => Some(s + "ize")),
    "ator" -> (s => Some(s + "ate")),
    "alli" -> (s => Some(s + "al")),
    "bli" -> (s => Some(s + "ble")),
    "ogi" -> (s => if (s.endsWith("l")) Some(s + "og") else None),
    "li" -> (s => if (s.nonEmpty && liEnding(s.last)) Some(s) else None))

  private val step3: Seq[(String, String => Option[String])] = Seq(
    "ational" -> (s => Some(s + "ate")),
    "tional" -> (s => Some(s + "tion")),
    "alize" -> (s => Some(s + "al")),
    "icate" -> (s => Some(s + "ic")),
    "iciti" -> (s => Some(s + "ic")),
    "ative" -> (s => Some(s)), // only if in R2, handled in stem()
    "ical" -> (s => Some(s + "ic")),
    "ness" -> (s => Some(s)),
    "ful" -> (s => Some(s)))

  private val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic")

  /** Index where R1 starts (region after the first non-vowel that follows a
    * vowel), with the special-prefix rule for gener/commun/arsen. */
  private def r1Of(w: String): Int = {
    if (w.startsWith("gener") || w.startsWith("arsen")) return 5
    if (w.startsWith("commun")) return 6
    regionAfterVC(w, 0)
  }

  private def regionAfterVC(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w, i)) i += 1
    while (i < w.length && isVowel(w, i)) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** True if w ends in a short syllable: vowel+non-vowel(≠wxY) preceded by a
    * non-vowel; or a 2-char word starting vowel + non-vowel. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w, 0) && !isVowel(w, 1)
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      !isVowel(w, n - 1) && c != 'w' && c != 'x' && c != 'Y' &&
        isVowel(w, n - 2) && !isVowel(w, n - 3)
    } else false
  }

  private def lowerIfNeeded(t: String): String = {
    var i = 0
    // any char that toLowerCase would change (incl. titlecase Lt like
    // U+01C5, which isUpper misses) forces the allocation
    while (i < t.length &&
           t.charAt(i) == Character.toLowerCase(t.charAt(i))) i += 1
    if (i == t.length) t else t.toLowerCase
  }

  def stem(input: String): String = {
    if (input.length <= 2) return lowerIfNeeded(input)
    var w = lowerIfNeeded(input)
    exceptions1.get(w).foreach(return _)

    if (w.startsWith("'")) w = w.substring(1)
    // Mark consonant-y as Y so vowel tests skip it.
    if (w.nonEmpty && w.charAt(0) == 'y') w = "Y" + w.substring(1)
    val sb = new StringBuilder(w)
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && vowels(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    val r1 = r1Of(w)
    def r2Of(s: String): Int = {
      val base = r1Of(s)
      if (base >= s.length) s.length else regionAfterVC(s, base)
    }
    val r2 = r2Of(w)
    def inR1(s: String, sufLen: Int): Boolean = s.length - sufLen >= r1
    def inR2(s: String, sufLen: Int): Boolean = s.length - sufLen >= r2

    // Step 0: apostrophe suffixes
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) { /* no-op */ }
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel not immediately
      // before the s
      val stemPart = w.dropRight(1)
      if (stemPart.length >= 2 &&
          (0 until stemPart.length - 1).exists(j => vowels(w.charAt(j))))
        w = stemPart
    }

    if (exceptions2(w)) return w.replace('Y', 'y')

    def hasVowel(s: String): Boolean =
      s.exists(c => vowels(c)) // 'Y' excluded by design

    // Step 1b
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
    s1b.find(w.endsWith) match {
      case Some(suf @ ("eed" | "eedly")) =>
        if (inR1(w, suf.length)) w = w.dropRight(suf.length) + "ee"
      case Some(suf) =>
        val stemPart = w.dropRight(suf.length)
        if (hasVowel(stemPart)) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
            w = w + "e"
          else if (w.length >= 2 && doubles(w.takeRight(2)))
            w = w.dropRight(1)
          else if (r1Of(w) >= w.length && endsShortSyllable(w))
            w = w + "e"
        }
      case None =>
    }

    // Step 1c: y/Y -> i if preceded by a non-vowel that is not word-initial
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !vowels(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // Step 2 (longest suffix, in R1)
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach {
      case (suf, f) =>
        if (inR1(w, suf.length)) f(w.dropRight(suf.length)).foreach(w = _)
    }

    // Step 3 (longest suffix, in R1; ative needs R2)
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach {
      case ("ative", _) =>
        if (inR2(w, 5)) w = w.dropRight(5)
      case (suf, f) =>
        if (inR1(w, suf.length)) f(w.dropRight(suf.length)).foreach(w = _)
    }

    // Step 4 (longest suffix, in R2)
    step4.find(w.endsWith) match {
      case Some("ion") =>
        if (inR2(w, 3) &&
            (w.length > 3 && (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't')))
          w = w.dropRight(3)
      case Some(suf) =>
        if (inR2(w, suf.length)) w = w.dropRight(suf.length)
      case None =>
    }

    // Step 5
    if (w.endsWith("e")) {
      if (inR2(w, 1)) w = w.dropRight(1)
      else if (inR1(w, 1) && !endsShortSyllable(w.dropRight(1)))
        w = w.dropRight(1)
    } else if (w.endsWith("l") && inR2(w, 1) && w.length >= 2 &&
               w.charAt(w.length - 2) == 'l') {
      w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
