package graft.analysis

import graft.SparkSpec

/** Tweet-replay profile spec: F17 concat, F12 url maps, F18 entities,
  * A6 capital folding — reference semantics pinned (citations in
  * TweetProfile scaladoc). */
class TweetProfileSpec extends SparkSpec {

  test("F17: concatenate_tweets conditional structure (parser_module.py:565-581)") {
    import TweetProfile.concatenateTweets
    assert(concatenateTweets("a", null, null) == "a")
    assert(concatenateTweets("a", "rq", null) == "a rq")
    assert(concatenateTweets("a", null, "q") == "a q")
    assert(concatenateTweets("a", "rq", "q") == "a rq q")
    // quoted == retweet_quoted -> quoted NOT appended (dedup rule)
    assert(concatenateTweets("a", "same", "same") == "a same")
  }

  test("F12: url JSON map values extracted; malformed input degrades to empty") {
    import TweetProfile.urlsFromJsonMap
    assert(urlsFromJsonMap("""{"t.co/x": "https://example.com/full"}""") ==
      Seq("https://example.com/full"))
    assert(urlsFromJsonMap("{}").isEmpty)
    assert(urlsFromJsonMap(null).isEmpty)
    assert(urlsFromJsonMap("not json").isEmpty)
    assert(urlsFromJsonMap("""{"a": "u1", "b": "u2"}""").toSet == Set("u1", "u2"))
  }

  test("F18: entity runs of >=2 Title-case tokens; A6 check_if_capital emission") {
    val (terms, entities) = TweetProfile.emit("Barack Obama visited New York today")
    assert(terms == Seq("BARACK", "OBAMA", "visited", "NEW", "YORK", "today"))
    assert(entities == Seq("Barack Obama", "New York"))
    val (_, e2) = TweetProfile.emit("a Single title appears Here alone")
    assert(e2.isEmpty) // no run of >= 2 consecutive Title-case tokens
  }

  test("A6: always-capitalized stays UPPER; ever-lowercase folds; singleton entities dropped") {
    import spark.implicits._
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq(
      (0L, "Obama met Apple executives"),
      (1L, "the apple fell"),
      (2L, "Obama spoke again"),
      (3L, "New York is large"),
      (4L, "New York again")
    ).toDF("doc_id", "text")
    val out = TweetProfile.capitalEntityFold(spark, docs)(
      _.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    val terms = out.map(_._2).toSet
    // Obama never lowercase -> OBAMA
    assert(terms.contains("OBAMA") && !terms.contains("obama"))
    // Apple seen lowercase in doc1 -> folded everywhere
    assert(terms.contains("apple") && !terms.contains("APPLE"))
    // 'New York' appears in 2 docs -> kept; 'Apple executives'? not an
    // entity (executives not Title); no singleton entities survive
    assert(terms.contains("New York"))
    val entRows = out.filter(_._2 == "New York")
    assert(entRows.map(_._1).toSet == Set(3L, 4L))
    // deterministic across reruns
    val again = TweetProfile.capitalEntityFold(spark, docs)(
      _.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    assert(out.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
    // scoped cache lifecycle: repeated folds leave no block-manager residue
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty, s"fold cache leaked RDDs: $leaked")
  }

  test("A6 end-to-end: tweet-profile index builds through Build/Engine and answers queries") {
    import spark.implicits._
    import graft.index.Build
    import graft.query.Engine
    val tweets = Seq(
      (0L, "Obama met Apple executives", null: String, null: String, 100L),
      (1L, "the apple fell on Obama", null: String, null: String, 200L),
      (2L, "New York is large", "New York again", null: String, 300L),
      (3L, "talks in New York", null: String, "quoted words here", 400L),
      (4L, "plain lowercase words here", null: String, null: String, 500L)
    ).toDF("tweet_id", "full_text", "retweet_quoted_text", "quoted_text",
      "ingest_ts")
    val idx = tmpDir("graft-tweet-idx")
    val res = graft.analysis.TweetIndex.build(spark, tweets, idx,
      Build.Config(numPartitions = 2, verifySha = false))
    assert(res.nDocs == 5)
    val eng = new Engine(spark, idx, Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    // lowercase query resolves the always-capitalized OBAMA via the
    // engine's case-fold fallback
    val obama = eng.searchWand("obama", 10)
    assert(obama.map(_._1).toSet == Set(0L, 1L))
    // 'apple' was seen lowercase -> folded: both docs match 'apple'
    assert(eng.searchWand("apple", 10).map(_._1).toSet == Set(0L, 1L))
    // multi-word entity term through the terms-level entry; doc 2 has
    // the entity twice (full + retweet_quoted concat)
    val ny = eng.searchWandQuery(Map("New York" -> 1), 10)
    assert(ny.map(_._1).toSet == Set(2L, 3L))
    assert(ny.head._1 == 2L, "tf=2 entity doc must outrank tf=1")
    // WAND == exhaustive on this profile too
    for (q <- Seq("obama", "apple", "words here"))
      assert(eng.searchWand(q, 10).toSeq == eng.searchExhaustive(q, 10).toSeq)
    eng.close()
  }
}
