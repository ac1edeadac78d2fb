package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q33: reference-model novelty/familiarity scoring — the CCNet-style
  * quality gate the heuristic scorers (q17/q18/q26) don't cover: score
  * each document against a frequency model TRAINED on a trusted
  * reference corpus, so out-of-distribution text (gibberish, wrong
  * domain, machine noise) surfaces even when its lengths/ratios look
  * fine. Real pipelines train a KenLM on Wikipedia and bucket
  * CommonCrawl by perplexity; the sandbox analog keeps the exact same
  * dataflow with a word-trigram count model and integer-exact scoring:
  *
  *   - model: trigram occurrence counts over the reference subset
  *     (deterministic stand-in: doc_id % 5 == 0 — the MECHANISM is the
  *     point, as with q30's mixing rates);
  *   - score: each doc's trigram stream left-joins the model;
  *     `coverage` = fraction of trigrams the model knows,
  *     `familiarity` = mean model count per trigram.
  *
  * All aggregation is on INTEGERS (counts), with exactly one
  * double division per output column rounded at the end — the same
  * cross-engine-exact pattern as q26 (float sums are order-dependent
  * across engines; integer sums are not, so the DuckDB oracle hashes
  * bit-identically). Log-space perplexity would put a float sum per
  * doc inside the aggregate; deliberately avoided.
  *
  * Scale shape: the model is a vocab-sized partial-agg groupBy; the
  * scoring join is key-colocated on the trigram (broadcast under AQE
  * at small model sizes); the per-doc agg is map-side partial. The
  * corpus text is deliberately tokenized twice (once for the model
  * subset, once for the scoring stream) — persisting the trigram
  * stream to skip the second pass would cache a corpus-sized
  * intermediate, which at 100 TB costs more than re-tokenizing. The
  * Zipf head of the model (hot trigrams like "} } }") concentrates
  * join rows per key — AQE skew-join splits those at runtime, and the
  * model row per key is a single long, so even a hot partition streams.
  */
object LmScore {

  /** Reference-subset selector: every 5th doc_id. */
  val RefMod = 5L

  private def trigramStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
      )).as("tg"))
  }

  def trigramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stream = trigramStream(spark, dir)
    val model = stream.filter($"doc_id" % RefMod === 0)
      .groupBy($"tg").agg(count(lit(1)).as("mc"))
    stream.join(model, Seq("tg"), "left")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tg"),
        sum(when($"mc".isNotNull, 1L).otherwise(0L)).as("known"),
        sum(coalesce($"mc", lit(0L))).as("fam_sum"))
      .select($"doc_id", $"n_tg", $"known",
        round($"known" / $"n_tg", 4).as("coverage"),
        round($"fam_sum" / $"n_tg", 4).as("familiarity"))
      .orderBy($"doc_id")
  }

  val trigramNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |stream AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(arr) - 1),
       |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS tg
       |  FROM toks WHERE len(arr) >= 3),
       |model AS (
       |  SELECT tg, count(*) AS mc FROM stream WHERE doc_id % $RefMod = 0 GROUP BY tg)
       |SELECT s.doc_id AS doc_id, count(*) AS n_tg,
       |  -- CAST: DuckDB sum() widens to HUGEINT -> float64 in pandas
       |  CAST(sum(CASE WHEN m.mc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS known,
       |  round(sum(CASE WHEN m.mc IS NOT NULL THEN 1 ELSE 0 END) / count(*), 4) AS coverage,
       |  round(sum(COALESCE(m.mc, 0)) / count(*), 4) AS familiarity
       |FROM stream s LEFT JOIN model m ON s.tg = m.tg
       |GROUP BY s.doc_id
       |ORDER BY s.doc_id""".stripMargin
}
