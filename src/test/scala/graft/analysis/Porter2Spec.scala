package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the Porter2 stemmer (SURVEY.md §7.4 hard-part 1).
  * Expected values hand-derived from the published Snowball English
  * algorithm (the reference pipeline stems with NLTK's SnowballStemmer,
  * reference parser_module.py:39, 195-202). */
class Porter2Spec extends AnyFunSuite {

  val golden: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
    "died" -> "die", "studied" -> "studi", "caress" -> "caress",
    "cats" -> "cat", "gas" -> "gas", "this" -> "this",
    // step 1b
    "agreed" -> "agre", "feed" -> "feed", "plastered" -> "plaster",
    "motoring" -> "motor", "sing" -> "sing", "hopping" -> "hop",
    "falling" -> "fall", "hissing" -> "hiss", "failing" -> "fail",
    "filing" -> "file", "conflated" -> "conflat", "troubled" -> "troubl",
    "sized" -> "size", "hoping" -> "hope",
    // step 1c
    "happy" -> "happi", "cry" -> "cri", "say" -> "say", "by" -> "by",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "digitizer" -> "digit", "operator" -> "oper",
    "feudalism" -> "feudal", "hopefulness" -> "hope",
    "goodness" -> "good", "callousness" -> "callous",
    // step 3/4
    "effective" -> "effect", "national" -> "nation",
    "generate" -> "generat", "communication" -> "communic",
    // exceptions
    "sky" -> "sky", "news" -> "news", "dying" -> "die",
    "lying" -> "lie", "skies" -> "sky", "early" -> "earli",
    "only" -> "onli", "inning" -> "inning", "proceed" -> "proceed",
    // code-ish vocabulary
    "running" -> "run", "parsing" -> "pars", "indexes" -> "index",
    "tokenized" -> "token", "partitions" -> "partit",
    "queries" -> "queri", "caching" -> "cach")

  golden.foreach { case (in, want) =>
    test(s"stem($in) == $want") { assert(Porter2.stem(in) == want) }
  }

  test("stemming is a pure lowercase function") {
    assert(Porter2.stem("Running") == Porter2.stem("running"))
    assert(Porter2.stem("MERGED") == Porter2.stem("merged"))
  }

  test("short inputs pass through") {
    assert(Porter2.stem("a") == "a")
    assert(Porter2.stem("ab") == "ab")
    assert(Porter2.stem("") == "")
  }
}
