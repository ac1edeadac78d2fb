package graft.analysis

/** Versioned stopword fixture (SURVEY.md §2.2 F2).
  *
  * The reference drops NLTK english stopwords plus ~70 custom twitter /
  * punctuation tokens (reference parser_module.py:24-34, 67, 221). For the
  * code-payload profile (BASELINE.json input_hint: source-code corpus) the
  * analogous list is the english core set plus code keywords that behave
  * like stopwords in source text — they also drive the posting-list skew
  * the salted shuffle handles (SURVEY.md §2.4 M3).
  */
object Stopwords {

  /** NLTK-style english core (the stable subset; versioned fixture v1). */
  val english: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all", "any",
    "both", "each", "few", "more", "most", "other", "some", "such", "no",
    "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "s", "t", "can", "will", "just", "don", "should", "now")

  /** Punctuation-ish junk tokens the reference lists explicitly
    * (parser_module.py:24-34 custom additions). */
  val punct: Set[String] = Set(
    "rt", "http", "https", "www", "...", "..", ".", ",", ":", ";", "!",
    "?", "(", ")", "[", "]", "{", "}", "'", "\"", "-", "_", "=", "+",
    "*", "&", "%", "$", "#", "@", "~", "|", "\\", "/", "<", ">")

  /** Code-profile additions: keywords across the corpus langs
    * (scala/java/py/go/js per FIXTURES.md) — high-df terms analogous to
    * the reference's twitter stopwords. */
  val codeKeywords: Set[String] = Set(
    "val", "var", "def", "class", "object", "trait", "extends", "import",
    "package", "return", "new", "null", "true", "false", "public",
    "private", "static", "void", "int", "func", "type", "struct",
    "interface", "const", "let", "function", "lambda", "self", "none",
    "pass", "elif", "else", "try", "catch", "except", "finally", "throw",
    "throws", "raise", "match", "case", "implicit", "override", "final")

  /** The default engine stopword set (fixture v1). */
  val all: Set[String] = english ++ punct ++ codeKeywords
}
