package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    import org.apache.spark.sql.expressions.Window
    val markers = Markers.toDF("lang_pred", "marker")
    val hits = tokens(spark, dir)
      .join(broadcast(markers), $"term" === $"marker")
      .groupBy($"doc_id", $"lang_pred").agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy($"doc_id").orderBy($"hits".desc, $"lang_pred")
    val best = hits.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"doc_id", $"lang_pred", $"hits")
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

  /** q18: quality scoring — length, token stats, stopword/alpha ratios,
    * and a deterministic composite score. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "and", "of", "is", "to", "in")
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
    val stopList = Seq("the", "a", "and", "of", "is", "to", "in")
      .map("'" + _ + "'").mkString(",")
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
}
