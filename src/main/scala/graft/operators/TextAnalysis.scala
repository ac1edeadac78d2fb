package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operator family over the `documents` table
  * (builder-prompt training-data pipeline ops): marker-based language
  * ID, quality scoring, token counting (whitespace + BPE-ish pieces),
  * and document fingerprinting. All four are pure column pipelines that
  * stay inside whole-stage codegen — no UDFs — and each has an exact
  * DuckDB oracle.
  */
object TextAnalysis {

  /** Marker lexicons (versioned fixture): langId scores a doc by marker
    * hits per language and takes the argmax — the SQL-expressible core
    * of an n-gram-heuristic language identifier. */
  val Markers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "and", "en" -> "of",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que",
    "de" -> "der", "de" -> "und", "de" -> "die", "de" -> "das",
    "fr" -> "le", "fr" -> "et", "fr" -> "les", "fr" -> "une")

  private def tokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("term"))
      .filter($"term" =!= "")
  }

  private val tokSql =
    """SELECT doc_id, t AS term FROM (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS t
      |  FROM documents) WHERE t <> ''""".stripMargin

  /** q17: language ID — marker-hit argmax with (hits desc, lang asc)
    * tiebreak; docs with zero marker hits report 'und'. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val markers = Markers.toDF("lang_pred", "marker")
    val hits = tokens(spark, dir)
      .join(broadcast(markers), $"term" === $"marker")
      .groupBy($"doc_id", $"lang_pred").agg(count(lit(1)).as("hits"))
    // argmax with (hits desc, lang asc) tiebreak as a lexicographic
    // struct-min: partial-aggregates map-side, unlike a row_number
    // window (which would re-sort-shuffle every (doc, lang) row by
    // doc_id with no partial reduction)
    val best = hits.groupBy($"doc_id")
      .agg(min(struct((-$"hits").as("nh"), $"lang_pred", $"hits")).as("b"))
      .select($"doc_id", $"b.lang_pred".as("lang_pred"), $"b.hits".as("hits"))
    spark.read.parquet(s"$dir/documents.parquet").select($"doc_id")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"lang_pred", lit("und")).as("lang_pred"),
        coalesce($"hits", lit(0L)).as("hits"))
      .orderBy($"doc_id")
  }

  def langIdSql: String = {
    val markerValues = Markers
      .map { case (l, m) => s"('$l', '$m')" }.mkString(", ")
    s"""WITH tok AS ($tokSql),
       |markers(lang_pred, marker) AS (VALUES $markerValues),
       |hits AS (
       |  SELECT doc_id, lang_pred, count(*) AS hits
       |  FROM tok JOIN markers ON term = marker
       |  GROUP BY doc_id, lang_pred),
       |best AS (
       |  SELECT doc_id, lang_pred, hits FROM (
       |    SELECT doc_id, lang_pred, hits,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_pred) AS rn
       |    FROM hits) WHERE rn = 1)
       |SELECT d.doc_id AS doc_id,
       |  coalesce(best.lang_pred, 'und') AS lang_pred,
       |  coalesce(best.hits, 0) AS hits
       |FROM documents d LEFT JOIN best ON d.doc_id = best.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  private[graft] val QualityStopwords =
    Seq("the", "a", "and", "of", "is", "to", "in")

  /** The same list as a SQL IN-list literal, so every oracle that
    * mirrors [[qualityScore]] stays in lock-step with the Spark side
    * if the list ever changes. */
  private[graft] val QualityStopwordsSql =
    QualityStopwords.map("'" + _ + "'").mkString(",")

  /** The q18 composite quality score as a pure Column over a text
    * column — usable identically from the batch oracle query and the
    * streaming clean path (stateless, codegen'd). Ratios are rounded
    * to 4 decimals BEFORE composing, matching the q18 contract. */
  def qualityScore(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => t =!= lit(""))
    val n = size(toks)
    val stopArr = array(QualityStopwords.map(lit(_)): _*)
    val stopRatio =
      round(size(filter(toks, t => array_contains(stopArr, t))) / n.cast("double"), 4)
    val alphaRatio =
      round(size(filter(toks, t => t.rlike("^[a-z]+$"))) / n.cast("double"), 4)
    round(least(lit(1.0), n / lit(100.0)) * alphaRatio *
      (lit(1.0) - stopRatio * 0.5), 4)
  }

  /** q18: quality scoring — length, token stats, stopword/alpha ratios,
    * and a deterministic composite score. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = QualityStopwords
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"),
        length($"text").as("n_chars"))
    d.select(
        $"doc_id", $"n_chars",
        size($"toks").as("n_tokens"),
        round(expr("aggregate(toks, CAST(0.0 AS DOUBLE), (acc, t) -> acc + length(t)) / size(toks)"), 4)
          .as("mean_tok_len"),
        round(expr(s"size(filter(toks, t -> t IN (${stop.map("'" + _ + "'").mkString(",")}))) / CAST(size(toks) AS DOUBLE)"), 4)
          .as("stop_ratio"),
        round(expr("size(filter(toks, t -> t rlike '^[a-z]+$')) / CAST(size(toks) AS DOUBLE)"), 4)
          .as("alpha_ratio"))
      .withColumn("quality",
        round(least(lit(1.0), $"n_tokens" / lit(100.0)) * $"alpha_ratio" *
          (lit(1.0) - $"stop_ratio" * 0.5), 4))
      .orderBy($"doc_id")
  }

  def qualitySql: String = {
    val stopList = QualityStopwordsSql
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks,
       |    length(text) AS n_chars
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
       |    round(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) / len(toks), 4) AS mean_tok_len,
       |    round(len(list_filter(toks, t -> t IN ($stopList))) / CAST(len(toks) AS DOUBLE), 4) AS stop_ratio,
       |    round(len(list_filter(toks, t -> regexp_matches(t, '^[a-z]+$$'))) / CAST(len(toks) AS DOUBLE), 4) AS alpha_ratio
       |  FROM d)
       |SELECT doc_id, n_chars, n_tokens, mean_tok_len, stop_ratio, alpha_ratio,
       |  round(least(1.0, n_tokens / 100.0) * alpha_ratio * (1.0 - stop_ratio * 0.5), 4) AS quality
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** q19: token counting — whitespace tokens, alpha runs (word-ish),
    * digit runs, and a BPE-ish piece count (ceil(len/4) pieces per
    * token: a deterministic stand-in for subword tokenization cost). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"),
        $"text")
      .select(
        $"doc_id",
        size($"toks").as("n_ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n_alpha_runs"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_digit_runs"),
        expr("aggregate(toks, 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))")
          .as("n_bpe_pieces"))
      .orderBy($"doc_id")
  }

  val tokenCountsSql: String =
    """SELECT doc_id,
      |  len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS n_ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_alpha_runs,
      |  len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs,
      |  CAST(list_sum(list_transform(
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> ''),
      |    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_pieces
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q20: document fingerprint — md5 of whitespace-normalized lowercase
    * text (the SQL-checkable digest; the rolling-hash winnowing
    * fingerprints live in analysis.Fingerprints with their own spec). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        md5(regexp_replace(trim(lower($"text")), "\\s+", " ")).as("fp"))
      .orderBy($"doc_id")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- q25: PII redaction ------------------------------------------------
  // Patterns are written in the RE2-compatible subset so the Spark (Java
  // regex) and DuckDB (RE2) engines agree: no backrefs, no lookaround.
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"
  private val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** q25: PII scrub — emails, dashed/spaced phone numbers and IPv4s
    * replaced by typed placeholders; per-doc match counts plus the
    * sha256 of the redacted text (the text itself stays out of the
    * result). A training-data pipeline runs this before anything else.
    * Pure column pipeline (regexp_count / regexp_replace, codegen'd):
    * a map-only pass with NO shuffle — at 100 TB it is bounded by scan
    * bandwidth alone, and the orderBy exists only for the deterministic
    * test-scale contract. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace($"text", EmailPat, "<EMAIL>"),
        PhonePat, "<PHONE>"),
      Ipv4Pat, "<IP>")
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        regexp_count($"text", lit(EmailPat)).cast("long").as("n_emails"),
        regexp_count($"text", lit(PhonePat)).cast("long").as("n_phones"),
        regexp_count($"text", lit(Ipv4Pat)).cast("long").as("n_ips"),
        sha2(redacted, 256).as("redacted_sha"))
      .orderBy($"doc_id")
  }

  val piiRedactSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailPat')) AS n_emails,
       |  len(regexp_extract_all(text, '$PhonePat')) AS n_phones,
       |  len(regexp_extract_all(text, '$Ipv4Pat')) AS n_ips,
       |  sha256(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailPat', '<EMAIL>', 'g'),
       |    '$PhonePat', '<PHONE>', 'g'),
       |    '$Ipv4Pat', '<IP>', 'g')) AS redacted_sha
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- q26: repetition-based quality filters -----------------------------

  /** q26: Gopher/MassiveText-style repetition metrics per doc — the
    * fraction of all word-bigrams taken by the single most frequent
    * bigram, and the fraction of duplicate word-trigrams. Repetitive
    * machine-generated text scores high on both and gets filtered
    * before training. Every stage partial-aggregates map-side
    * (groupBy, not windows); the heaviest shuffle carries
    * (doc_id, gram, partial count) — a pre-combined fraction of the
    * exploded gram stream. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arr = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", split(lower($"text"), "\\s+").as("toks"))
      .select($"doc_id", expr("filter(toks, t -> t <> '')").as("a"))
    val bg = arr.filter(size($"a") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(a)-2), i -> concat(a[i], ' ', a[i+1]))"
      )).as("g"))
    val bstat = bg.groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(round(max($"c") / sum($"c"), 4).as("top_bigram_frac"))
    val tg = arr.filter(size($"a") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(a)-3), i -> concat(a[i], ' ', a[i+1], ' ', a[i+2]))"
      )).as("g"))
    val tstat = tg.groupBy($"doc_id")
      .agg(round(lit(1.0) - countDistinct($"g") / count(lit(1)), 4)
        .as("dup_trigram_frac"))
    spark.read.parquet(s"$dir/documents.parquet").select($"doc_id")
      .join(bstat, Seq("doc_id"), "left")
      .join(tstat, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"top_bigram_frac", lit(0.0)).as("top_bigram_frac"),
        coalesce($"dup_trigram_frac", lit(0.0)).as("dup_trigram_frac"))
      .orderBy($"doc_id")
  }

  /** q29: the composed pre-training clean pipeline in one call —
    * exclude the held-out benchmark slice, drop low-quality docs (q18
    * score), keep the FIRST doc per exact content digest, then drop
    * docs sharing an 8-gram with the benchmark (q27). Each stage is the
    * already-oracle-checked operator; the composition itself is what a
    * real corpus build runs. Scale shape: quality is map-only; the
    * digest dedup shuffles (digest, doc_id) pairs — never text — with
    * map-side partial min; decontamination reuses q27's gram join;
    * survivors join back by doc_id. */
  val CleanMinQuality = 0.05

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cand = docs
      .filter($"doc_id" % graft.operators.Dedup.DecontamBenchMod =!= 0)
      .select($"doc_id", sha2($"text", 256).as("digest"),
        qualityScore($"text").as("quality"))
      .filter($"quality" >= CleanMinQuality)
    val firsts = cand.groupBy($"digest")
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val contaminated = graft.operators.Dedup.decontam(spark, dir)
      .select($"doc_id")
    cand.join(firsts, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"quality")
      .orderBy($"doc_id")
  }

  def cleanCorpusSql: String = {
    val mod = graft.operators.Dedup.DecontamBenchMod
    s"""WITH cand AS (
       |  SELECT doc_id, sha256(text) AS digest, quality
       |  FROM (${qualitySql.replace("ORDER BY doc_id", "")}) q
       |  JOIN documents USING (doc_id)
       |  WHERE doc_id % $mod <> 0 AND quality >= $CleanMinQuality),
       |firsts AS (SELECT min(doc_id) AS doc_id FROM cand GROUP BY digest),
       |contaminated AS (SELECT doc_id FROM (${graft.operators.Dedup.decontamSql
            .replace("ORDER BY doc_id", "")}) c)
       |SELECT doc_id, quality FROM cand
       |JOIN firsts USING (doc_id)
       |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
       |ORDER BY doc_id""".stripMargin
  }

  val repetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS arr
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i+1])) AS g
      |  FROM toks WHERE len(arr) >= 2),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |bstat AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 4) AS top_bigram_frac FROM bgc GROUP BY 1),
      |tg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(arr)-1), i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS g
      |  FROM toks WHERE len(arr) >= 3),
      |tstat AS (SELECT doc_id, round(1.0 - count(DISTINCT g) * 1.0 / count(*), 4) AS dup_trigram_frac FROM tg GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(b.top_bigram_frac, 0.0) AS top_bigram_frac,
      |  coalesce(t.dup_trigram_frac, 0.0) AS dup_trigram_frac
      |FROM documents d LEFT JOIN bstat b USING (doc_id) LEFT JOIN tstat t USING (doc_id)
      |ORDER BY doc_id""".stripMargin
}
