package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule goldens for the code-profile tokenizer (SURVEY.md §2.2
  * F1-F19; §5 item 1). Reference semantics cited per rule. */
class TokenizerSpec extends AnyFunSuite {

  def terms(text: String, cfg: Tokenizer.Config = Tokenizer.default): Map[String, Int] =
    Tokenizer.tokenize(text, cfg).terms

  val noStem: Tokenizer.Config = Tokenizer.Config(stem = false)

  test("F2: stopwords are dropped (parser_module.py:24-34, 67)") {
    assert(terms("the quick if return fox") ==
      Map("quick" -> 1, "fox" -> 1))
  }

  test("F3: lowercasing (parser_module.py:224)") {
    assert(terms("Quick QUICK quick", noStem) == Map("quick" -> 3))
  }

  test("F6: non-ascii tokens dropped (parser_module.py:243-248)") {
    assert(terms("café naïve plain", noStem).keySet == Set("plain"))
  }

  test("F5: no emoji survives any path (parser_module.py:53-55, 116; dead-on-arrival by 318)") {
    // In the reference's own document pipeline the whole-text non-latin
    // strip (parser_module.py:318) runs BEFORE parse_sentence, and every
    // code point in its emoji class (line 53-55: U+1F300+, U+2600-2B55,
    // U+200D ZWJ, U+FE0F VS16, flags, dingbats...) is outside the strip's
    // keep-set — so the per-token emoji rule (line 116) never sees one on
    // the doc path. Graft subsumes F5 the same way: the F4 strip removes
    // every char > U+024F, in documents AND queries. Pin it with real
    // emoji incl. ZWJ sequences, skin tones, flags, and BMP dingbats.
    val cases = Seq(
      "smile 😀 mid",                  // U+1F600 emoticon
      "🔥fire leading",                 // emoji-prefixed token
      "family 👨‍👩‍👧 zwj",
      "wave 👋🏽 skintone",
      "flag 🇮🇱 pair",
      "star ⭐ dingbat ✂️ scissors",
      "clock ⌚ watch ⏩ ffwd ♀♂ signs")
    for (c <- cases; t <- terms(c, noStem).keySet)
      assert(t.forall(_ <= 'ɏ') && t.forall(_ < 128),
        s"emoji survived in '$t' from: $c")
    // and a query goes through the same strip
    assert(Tokenizer.tokenizeQuery("😀 smile😀s", noStem)
      .keySet == Set("smiles"))
  }

  test("F7: number scaling (parser_module.py:412-522)") {
    assert(terms("123").keySet == Set("123"))
    assert(terms("15600").keySet == Set("15.6K"))
    assert(terms("1200000").keySet == Set("1.2M"))
    assert(terms("3500000000").keySet == Set("3.5B"))
  }

  test("F7: quantity-word fusion consumes the neighbor") {
    val td = Tokenizer.tokenize("35 thousand lines")
    assert(td.terms.keySet == Set("35K", "line"))
  }

  test("F7: percent and dollar fusion") {
    assert(terms("45%").keySet == Set("45%"))
    assert(terms("20 percent").keySet == Set("20%"))
    assert(terms("$100").keySet == Set("100$"))
    assert(terms("100 dollars").keySet == Set("100$"))
  }

  test("F7: fractions kept, and fused with a leading integer") {
    assert(terms("3/4").keySet == Set("3/4"))
    assert(terms("25 3/4").keySet == Set("25 3/4"))
  }

  test("F8: date tokens kept verbatim (parser_module.py:331-336)") {
    assert(terms("12/25/2020").keySet == Set("12/25/2020"))
    assert(terms("2020-01-15").keySet == Set("2020-01-15"))
  }

  test("F9: hyphen split emits whole + parts (parser_module.py:338-360)") {
    assert(terms("covid-19", noStem).keySet == Set("covid-19", "covid", "19"))
    // all-numeric compound stays whole
    assert(terms("10-20", noStem).keySet == Set("10-20"))
  }

  test("F10: camelCase identifier split (hashtag analog, parser_module.py:384-394)") {
    assert(terms("getUserConfig", noStem).keySet ==
      Set("getuserconfig", "get", "user", "config"))
  }

  test("F10: snake_case identifier split") {
    assert(terms("parse_query_string", noStem).keySet ==
      Set("parse_query_string", "parse", "query", "string"))
  }

  test("F11: @mention drops token and successor (parser_module.py:147-151)") {
    assert(terms("@Override public quick", noStem).keySet == Set("quick"))
  }

  test("F13: www url emits the domain label (parser_module.py:396-410)") {
    assert(terms("https://www.example.com/path", noStem).keySet == Set("example"))
    assert(terms("www.snowball.org", noStem).keySet == Set("snowball"))
  }

  test("F14: slash split keeps parts of len>1 (parser_module.py:187-191)") {
    assert(terms("alpha/b/gamma", noStem).keySet == Set("alpha", "gamma"))
  }

  test("F15: quote/hyphen/dot trim (parser_module.py:119-123)") {
    assert(terms("'quoted trailing.", noStem).keySet == Set("quoted", "trailing"))
  }

  test("F16: stemming applies to alphabetic tokens only (parser_module.py:195-202)") {
    assert(terms("running").keySet == Set("run"))
    // non-alpha token (digits) not stemmed
    assert(terms("v2runs", noStem).keySet == Set("v2runs"))
  }

  test("A2: docLen counts post-stopword PRE-normalization tokens (parser_module.py:321)") {
    val td = Tokenizer.tokenize("the getUserConfig runs 15600 times")
    // pre tokens: [getUserConfig, runs, 15600, times] — 'the' dropped
    assert(td.docLen == 4)
    // emitted terms exceed docLen because of identifier expansion
    assert(td.terms.values.sum > td.docLen)
  }

  test("A1: tf accumulates across rules; maxTf tracked (parser_module.py:204-217)") {
    val td = Tokenizer.tokenize("merge merge merge split", Tokenizer.Config(stem = false))
    assert(td.terms == Map("merge" -> 3, "split" -> 1))
    assert(td.maxTf == 3)
  }

  test("plain profile matches lower+whitespace-split exactly") {
    val td = Tokenizer.tokenize("The Quick  FOX the", Tokenizer.plainCfg)
    assert(td.terms == Map("the" -> 2, "quick" -> 1, "fox" -> 1))
    assert(td.docLen == 4)
  }

  test("F7: decimal and boundary number formatting") {
    assert(terms("10.6").keySet == Set("10.6"))
    assert(terms("999").keySet == Set("999"))
    assert(terms("1000").keySet == Set("1K"))
    assert(terms("0.5 billion").keySet == Set("500M"))
    assert(terms("1.5 thousand").keySet == Set("1.5K"))
    assert(terms("999999999").keySet == Set("1000M")) // <1e9 stays M-scaled
  }

  test("F7/F15 interaction: trailing punctuation trimmed before number parse") {
    assert(terms("15600.").keySet == Set("15.6K"))
    assert(terms("'123'").keySet == Set("123"))
  }

  test("mixed-rule document parses deterministically with expected terms") {
    val td = Tokenizer.tokenize(
      "getUserConfig returns 15600 results; visit https://www.example.org/docs " +
        "covid-19 cases rose 20 percent on 12/25/2020", noStem)
    val t = td.terms.keySet
    assert(t.contains("getuserconfig") && t.contains("config"))
    assert(t.contains("15.6K"))
    assert(t.contains("example"))
    assert(t.contains("covid-19") && t.contains("covid"))
    assert(t.contains("20%"))
    assert(t.contains("12/25/2020"))
  }

  test("determinism: tokenize is a pure function") {
    val t = "getUserConfig 15600 covid-19 https://www.example.com the"
    assert(Tokenizer.tokenize(t) == Tokenizer.tokenize(t))
  }
}
