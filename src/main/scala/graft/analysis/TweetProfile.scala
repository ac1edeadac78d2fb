package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tweet-replay profile: the reference's tweet-specific ingest rules and
  * the capital/entity corpus aggregate, re-expressed as deterministic
  * two-pass dataflow (SURVEY §2.2 F12/F17/F18, §2.3 A6).
  *
  * Reference semantics pinned here:
  *  - F17 `concatenate_tweets` (parser_module.py:565-581): full_text
  *    ⊕ retweet_quoted_text (if present) ⊕ quoted_text (if present and
  *    != retweet_quoted_text)
  *  - F12 `parse_raw_url` (parser_module.py:524-550): url columns are
  *    JSON string maps {short -> expanded}; the expanded values feed the
  *    url-term rule (F13)
  *  - F3/A6 `check_if_capital` (parser_module.py:362-382): a token
  *    starting uppercase is indexed as UPPER(token) — unless the term is
  *    EVER seen lowercase anywhere in the corpus, in which case every
  *    occurrence folds to lowercase (indexer.py:187-204 does this
  *    mutably at merge; here it is a groupBy + broadcast-join rewrite —
  *    order-independent, hence deterministic)
  *  - F18 entities (parser_module.py:125-145): runs of >= 2 consecutive
  *    Title-case tokens form a multi-word entity term; entities occurring
  *    < 2 times in the corpus are dropped (indexer.py:182-185)
  */
object TweetProfile {

  /** F17, exact reference conditional structure. */
  def concatenateTweets(fullText: String, retweetQuotedText: String,
                        quotedText: String): String = {
    var out = fullText
    if (retweetQuotedText != null) out = out + " " + retweetQuotedText
    if (quotedText != null && retweetQuotedText != quotedText)
      out = out + " " + quotedText
    out
  }

  /** F12: JSON string map {short_url -> expanded_url} → expanded values.
    * Reference does json.loads(urls) and uses the values. */
  def urlsFromJsonMap(json: String): Seq[String] = {
    if (json == null || json.isEmpty || json == "{}") return Nil
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json)
      val it = m.properties().iterator()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val v = it.next().getValue
        if (v != null && !v.isNull) out += v.asText()
      }
      out.toSeq
    } catch { case _: Exception => Nil }
  }

  private def isTitle(t: String): Boolean =
    t.nonEmpty && t.head.isUpper && t.tail.forall(c => !c.isLetter || c.isLower)

  /** Pass 1 per-doc emission: case-sensitive terms + entity candidates.
    * Returns (caseTerms, entityCandidates). A token starting uppercase
    * emits UPPER(token); else lower(token) (check_if_capital). Runs of
    * >= 2 Title-case tokens emit the space-joined entity. */
  def emit(text: String): (Seq[String], Seq[String]) = {
    val toks = text.split("\\s+").filter(t => t.nonEmpty && t.forall(_.isLetter))
    val terms = toks.toSeq.map(t =>
      if (t.head.isUpper) t.toUpperCase else t.toLowerCase)
    val entities = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (isTitle(toks(i))) {
        var j = i + 1
        while (j < toks.length && isTitle(toks(j))) j += 1
        if (j - i >= 2) entities += toks.slice(i, j).mkString(" ")
        i = j
      } else i += 1
    }
    (terms, entities.toSeq)
  }

  /** The A6 two-pass fold over a (doc_id, text[, ingest_ts]) corpus:
    * pass 1 aggregates "ever seen lowercase" per upper(term) and entity
    * counts; pass 2 rewrites terms and prunes singleton entities.
    * The fold result is (doc_id, term, tf, dl, ts) — order-independent,
    * unlike the reference's merge-order-dependent mutation. dl is the
    * pre-fold alpha-token count (the profile's A2 doc length) and ts the
    * optional ingest timestamp, so the output plugs straight into
    * Build.runFromPostings.
    *
    * Scoped-continuation shape: the tokenize pass feeds FOUR consumers
    * (two pass-1 aggregates, two pass-2 streams), so it is cached for
    * the duration of `use` and unpersisted before returning — repeated
    * folds in one session leave no block-manager residue (round-2
    * review: the cache was never released). */
  def capitalEntityFold[T](spark: SparkSession, docs: DataFrame)
                          (use: DataFrame => T): T = {
    import spark.implicits._
    val tsCol =
      if (docs.columns.contains("ingest_ts")) $"ingest_ts".cast("long")
      else lit(0L)
    val emitted = docs.select($"doc_id".cast("long"), $"text", tsCol.as("ts"))
      .as[(Long, String, Long)]
      .map { case (id, text, ts) => val (t, e) = emit(text); (id, t, e, ts) }
      .toDF("doc_id", "terms", "entities", "ts")
    emitted.cache()
    // pass 1a: term ever lowercase? (seen with a lowercase first letter)
    val everLower = emitted
      .select(explode($"terms").as("term"))
      .groupBy(upper($"term").as("uterm"))
      .agg(max(when($"term" === lower($"term"), 1).otherwise(0)).as("ever_lower"))
    // pass 1b: entity corpus counts; singletons dropped (indexer.py:182-185)
    val liveEntities = emitted
      .select(explode($"entities").as("entity"))
      .groupBy($"entity").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= 2)
      .select($"entity")
    // pass 2: rewrite + entity emission, then tf agg
    // joins left to Catalyst/AQE: the fold map is dictionary-sized, so a
    // broadcast hint would be wrong at corpus scale (shuffle join there)
    val termRows = emitted
      .select($"doc_id", explode($"terms").as("term"),
        size($"terms").as("dl"), $"ts")
      .join(everLower, upper($"term") === $"uterm")
      .select($"doc_id",
        when($"ever_lower" === 1, lower($"term")).otherwise($"term").as("term"),
        $"dl", $"ts")
    val entityRows = emitted
      .select($"doc_id", explode($"entities").as("term"),
        size($"terms").as("dl"), $"ts")
      .join(liveEntities, $"term" === $"entity")
      .select($"doc_id", $"term", $"dl", $"ts")
    val out = termRows.union(entityRows)
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"), first($"dl").as("dl"),
        first($"ts").as("ts"))
    try use(out) finally emitted.unpersist(blocking = false)
  }
}
