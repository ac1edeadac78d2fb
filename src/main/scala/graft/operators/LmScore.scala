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

  /** q37: CCNet-style head/middle/tail selection — bucket the corpus by
    * its reference-model score terciles, then keep each bucket at its
    * own deterministic rate (head 1.0 / middle 0.5 / tail 0.25 — the
    * CCNet recipe keeps the reference-like head and progressively
    * drops the unfamiliar tail; the MECHANISM is the point, as with
    * q30's mixing rates).
    *
    * Scale shape — the published CCNet pipeline GLOBALLY SORTS the
    * corpus by perplexity to find tercile boundaries; this never sorts
    * the corpus. The q33 scores are already rounded to 4 decimals, so
    * a `groupBy(score)` HISTOGRAM has <= 10^4 rows at ANY corpus size
    * (partial-agg, one tiny shuffle); the tercile thresholds fall out
    * of the driver-side cumulative scan of that histogram (vocab-bound
    * collect, same discipline as the IVF codebook) and the final
    * bucket+keep decision is a pure map-only function of the row —
    * q30's md5 predicate, so the selection is reproducible across
    * engines, runs, and cluster sizes. Thresholds use ceil(k*n/3)
    * integer arithmetic: exact in both engines, no float percentile.
    *
    * Bucket rule (coverage = fraction of trigrams the reference model
    * knows): tail = lowest tercile (coverage <= t1), middle =
    * (t1, t2], head = rest; t_k = smallest score whose cumulative doc
    * count reaches ceil(k*n/3). Rounded-score ties all land in one
    * histogram row, so bucket membership is exact and deterministic. */
  def noveltySelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // localCheckpoint: the q33 scoring pipeline (model build + trigram
    // join, itself two corpus tokenizations) runs ONCE — the histogram
    // collect below and the returned selection both read the
    // materialized (long, double) rows, doc-count-sized not
    // corpus-text-sized, executor-lifecycle-managed (same pattern as
    // DupClusters' round checkpoints)
    val scores = trigramNovelty(spark, dir)
      .select($"doc_id", $"coverage").localCheckpoint()
    val hist = scores.groupBy($"coverage")
      .agg(count(lit(1)).as("nc"))
      .orderBy($"coverage")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    val (c1, c2) = ((n + 2) / 3, (2 * n + 2) / 3)
    var cum = 0L
    var t1 = Double.NaN; var t2 = Double.NaN
    hist.foreach { case (cov, nc) =>
      cum += nc
      if (t1.isNaN && cum >= c1) t1 = cov
      if (t2.isNaN && cum >= c2) t2 = cov
    }
    val bucket = when($"coverage" <= t1, "tail")
      .when($"coverage" <= t2, "middle")
      .otherwise("head")
    val u = substring(
      md5(concat(lit("graft-ccnet-"), $"doc_id".cast("string"))), 1, 8)
    scores
      .select($"doc_id", $"coverage", bucket.as("bucket"), u.as("u_hex"))
      .filter($"bucket" === "head" ||
        ($"bucket" === "middle" && $"u_hex" < "80000000") ||
        ($"bucket" === "tail" && $"u_hex" < "40000000"))
      .orderBy($"doc_id")
  }

  /** Oracle mirror of [[noveltySelect]]: same trigram scores (the q33
    * CTE), thresholds from the same integer-exact cumulative histogram
    * (window sum over the tiny score-group table — fine in SQL at
    * oracle scale), same md5 keep predicate. */
  val noveltySelectSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |stream AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(arr) - 1),
       |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS tg
       |  FROM toks WHERE len(arr) >= 3),
       |model AS (
       |  SELECT tg, count(*) AS mc FROM stream WHERE doc_id % $RefMod = 0 GROUP BY tg),
       |scores AS (
       |  SELECT s.doc_id AS doc_id,
       |    round(sum(CASE WHEN m.mc IS NOT NULL THEN 1 ELSE 0 END) / count(*), 4) AS coverage
       |  FROM stream s LEFT JOIN model m ON s.tg = m.tg
       |  GROUP BY s.doc_id),
       |hist AS (SELECT coverage, count(*) AS nc FROM scores GROUP BY coverage),
       |cum AS (
       |  SELECT coverage, sum(nc) OVER (ORDER BY coverage) AS cm FROM hist),
       |tot AS (SELECT count(*) AS n FROM scores),
       |thr AS (
       |  SELECT
       |    (SELECT min(coverage) FROM cum, tot WHERE cm >= (n + 2) // 3) AS t1,
       |    (SELECT min(coverage) FROM cum, tot WHERE cm >= (2 * n + 2) // 3) AS t2),
       |sel AS (
       |  SELECT s.doc_id, s.coverage,
       |    CASE WHEN s.coverage <= thr.t1 THEN 'tail'
       |         WHEN s.coverage <= thr.t2 THEN 'middle'
       |         ELSE 'head' END AS bucket,
       |    substr(md5('graft-ccnet-' || CAST(s.doc_id AS VARCHAR)), 1, 8) AS u_hex
       |  FROM scores s, thr)
       |SELECT doc_id, coverage, bucket, u_hex FROM sel
       |WHERE bucket = 'head'
       |   OR (bucket = 'middle' AND u_hex < '80000000')
       |   OR (bucket = 'tail' AND u_hex < '40000000')
       |ORDER BY doc_id""".stripMargin

  /** Hashed-feature buckets for [[dsirSelect]] (also its Laplace
    * constant). 64 keeps the sf0.01 histogram dense; a production run
    * uses 10^4-10^5 buckets — the table stays broadcast-sized either
    * way, which is the point of hashing the features. */
  val DsirBuckets = 64

  /** q52: DSIR-style importance selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by whether its hashed n-gram features look more
    * like a TARGET distribution than like the corpus background, keep
    * docs on the target side. Target stand-in: the `lang = 'en'` slice
    * (real pipelines point this at a trusted domain corpus).
    *
    * DSIR's per-feature weight is log((tgt_b+λ)/(cor_b+λ)) summed over
    * a doc's features — a float sum whose accumulation order differs
    * across engines. This implementation quantizes the log-ratio to its
    * SIGN, decided by the INTEGER cross-product
    * (tgt_b+1)·(cor_tot+B) > (cor_b+1)·(tgt_tot+B) (Laplace-smoothed
    * "is this bucket target-enriched?"), so a doc's score is
    * Σ count·(±1) — pure integer arithmetic, bit-exact in any engine,
    * same selection direction as the full-precision weight. The margin
    * is reported, so a consumer needing graded weights re-scales it.
    *
    * Scale shape: bigrams hash to [[DsirBuckets]] buckets at scan time
    * (feature space is FIXED, independent of vocabulary); per-(doc,
    * bucket) counts partial-aggregate map-side; both histograms are
    * B-row aggregates and the sign table rides a broadcast back. The
    * corpus shuffles only (doc_id, bucket, count) triples — bounded by
    * B per doc, not by document length. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = DsirBuckets
    val stream = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"lang",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", $"lang", explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"
      )).as("g"))
    val bucket = (ascii(substring(md5($"g"), 1, 1)) * 13 +
      ascii(substring(md5($"g"), 2, 1))) % b
    val perDoc = stream
      .select($"doc_id", $"lang", bucket.cast("long").as("b"))
      .groupBy($"doc_id", $"lang", $"b").agg(count(lit(1)).as("c"))
    val hist = perDoc.groupBy($"b").agg(
      sum($"c").as("cor_b"),
      sum(when($"lang" === "en", $"c").otherwise(0L)).as("tgt_b"))
    val tots = hist.agg(sum($"cor_b").as("cor_tot"), sum($"tgt_b").as("tgt_tot"))
    val sgn = hist.crossJoin(tots).select($"b",
      when(($"tgt_b" + 1) * ($"cor_tot" + b) > ($"cor_b" + 1) * ($"tgt_tot" + b),
        1L).otherwise(-1L).as("sgn"))
    perDoc.join(broadcast(sgn), "b")
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_bigrams"), sum($"c" * $"sgn").as("margin"))
      .select($"doc_id", $"n_bigrams", $"margin",
        ($"margin" > 0).cast("int").as("kept"))
      .orderBy($"doc_id")
  }

  val dsirSelectSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |stream AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i+1])) AS g
       |  FROM toks WHERE len(arr) >= 2),
       |pd AS (
       |  SELECT doc_id, lang,
       |    (ascii(substr(md5(g), 1, 1)) * 13 + ascii(substr(md5(g), 2, 1))) % $DsirBuckets AS b,
       |    count(*) AS c
       |  FROM stream GROUP BY doc_id, lang, b),
       |hist AS (
       |  SELECT b, CAST(sum(c) AS BIGINT) AS cor_b,
       |    CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) AS tgt_b
       |  FROM pd GROUP BY b),
       |tots AS (
       |  SELECT CAST(sum(cor_b) AS BIGINT) AS cor_tot,
       |    CAST(sum(tgt_b) AS BIGINT) AS tgt_tot FROM hist),
       |sgn AS (
       |  SELECT b,
       |    CASE WHEN (tgt_b + 1) * (cor_tot + $DsirBuckets)
       |            > (cor_b + 1) * (tgt_tot + $DsirBuckets)
       |         THEN 1 ELSE -1 END AS sgn
       |  FROM hist CROSS JOIN tots)
       |SELECT pd.doc_id AS doc_id,
       |  CAST(sum(pd.c) AS BIGINT) AS n_bigrams,
       |  CAST(sum(pd.c * sgn.sgn) AS BIGINT) AS margin,
       |  CAST(CAST(sum(pd.c * sgn.sgn) AS BIGINT) > 0 AS INT) AS kept
       |FROM pd JOIN sgn ON pd.b = sgn.b
       |GROUP BY pd.doc_id
       |ORDER BY pd.doc_id""".stripMargin

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
