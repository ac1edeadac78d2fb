package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the step AFTER cleaning (q29) in a
  * training-data pipeline: deterministic stratified sampling (data
  * mixing across sources) and fixed-context sequence packing. Both are
  * exact-oracle-checked (DuckDB) and designed for the 100 TB shape:
  * sampling is map-only (zero shuffle, no RNG state — the keep/drop
  * decision is a pure hash of the row), packing is a two-level
  * distributed prefix-sum instead of a single-partition global window.
  */
object Assembly {

  /** q30: deterministic stratified sampling for source mixing.
    *
    * Each source gets a mixing rate cycling (0.25, 0.5, 0.75, 1.0) by
    * its numeric suffix (a stand-in for a real mixing config; the
    * MECHANISM is the point). A row is kept iff the first 8 hex chars
    * of md5("graft-mix-" + doc_id) sort below the rate's hex threshold
    * — a pure function of the row, so the sample is reproducible
    * across runs, engines, and cluster sizes, needs no RNG
    * synchronization, and rerunning on an appended corpus never flips
    * a previous decision (the property `Bernoulli sample via
    * rand()` does NOT have). Plan shape: scan → project → filter; zero
    * exchanges (PlanSpec gate).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = substring(md5(concat(lit("graft-mix-"), $"doc_id".cast("string"))), 1, 8)
    val m = (regexp_extract($"source", "([0-9]+)", 1).cast("int") % 4)
    val rate = (m.cast("double") + 1.0) / 4.0
    // 4th sentinel threshold ("g…" sorts above every 8-char hex string)
    // makes the lookup total for m=3: the m===3 disjunct alone relied on
    // Or short-circuiting to dodge an out-of-bounds element_at, which
    // ANSI mode aborts on if any plan rewrite evaluates the right branch
    val thr = element_at(
      array(lit("40000000"), lit("80000000"), lit("c0000000"),
        lit("g0000000")), m + 1)
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", rate.as("rate"), u.as("u_hex"), m.as("m"))
      .filter($"m" === 3 || $"u_hex" < thr)
      .select($"doc_id", $"source", $"rate", $"u_hex")
      .orderBy($"doc_id")
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, source, rate, u_hex FROM (
      |  SELECT doc_id, source,
      |    (CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4) AS m,
      |    (CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4 + 1.0) / 4.0 AS rate,
      |    substr(md5('graft-mix-' || CAST(doc_id AS VARCHAR)), 1, 8) AS u_hex
      |  FROM documents)
      |WHERE m = 3 OR u_hex < (CASE m WHEN 0 THEN '40000000'
      |                               WHEN 1 THEN '80000000'
      |                               ELSE 'c0000000' END)
      |ORDER BY doc_id""".stripMargin

  /** Context-window size for [[packSequences]] in BPE-ish pieces
    * (ceil(n_chars/4)); small so sf0.01 exercises many bins. */
  val PackCtx = 512L

  /** Floor for docs per prefix-sum bucket (keeps sf0.001 tests
    * exercising many buckets). The effective bucket size is
    * [[packBucketFor]] — scale-aware, not a fixed constant. */
  val PackBucket = 1000L

  /** Docs per prefix-sum bucket, derived from the corpus size: ~sqrt(n)
    * bounds BOTH funnels of the two-level scan — the ledger window sees
    * n/B ≈ sqrt(n) rows in its one task and each within-bucket window
    * partition holds B ≈ sqrt(n) rows (10^11 docs -> ~3.2e5 each, a few
    * MB — where a fixed B=1000 would push a 10^8-row ledger through one
    * task, the same comment-only-scale-story wart the ANN layouts had).
    * Deterministic in the input, so the output (a pure global running
    * sum, bucketing-invariant) and its oracle are unaffected.
    *
    * `floor(doc_id / B)` bucket boundaries assume roughly DENSE doc_ids
    * (true of this engine's ingest, which numbers docs contiguously —
    * corpus/Ingest docId derivation); a sparse 64-bit id space would
    * thin the buckets and re-grow the ledger — there, substitute
    * `repartitionByRange(doc_id)` + `spark_partition_id` as the bucket
    * key (density-free, same two-level math). */
  def packBucketFor(n: Long): Long =
    math.max(PackBucket, math.ceil(math.sqrt(n.toDouble)).toLong)

  /** q31: sequence packing (GPT-style concat-and-split): documents are
    * concatenated in doc_id order and split into fixed [[PackCtx]]-piece
    * context windows; each doc reports its global piece offset and the
    * bin its first piece lands in.
    *
    * The naive formulation is `sum(n_pieces) OVER (ORDER BY doc_id)` —
    * a GLOBAL running sum, which Spark executes as a single-partition
    * window: the whole corpus funnels through one task (the q14-class
    * scale killer). Instead, the classic two-level distributed scan:
    *   1. bucket = doc_id / [[packBucketFor]](n) (~sqrt(n)); per-bucket
    *      piece sums via hash agg (map-side partial, tiny output);
    *   2. running sum over the bucket LEDGER only (single-partition
    *      window over ~sqrt(n) rows);
    *   3. broadcast-join offsets back; within-bucket running sum via a
    *      window PARTITIONED by bucket (bounded: ~sqrt(n) rows per
    *      partition, parallel across buckets).
    * The DuckDB oracle runs the naive global window — same math, so the
    * distributed scan is exact-checked against it, and PlanSpec gates
    * that no unbounded-partition window survives in the plan.
    *
    * Reads only (doc_id, n_chars): column pruning keeps `text` out of
    * the scan entirely.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    // parquet-metadata count: sizes the bucket level before the scan
    val bucketSize = packBucketFor(raw.count())
    val docs = raw
      .select($"doc_id", ceil($"n_chars" / 4.0).cast("long").as("n_pieces"),
        floor($"doc_id" / lit(bucketSize)).cast("long").as("bucket"))
    val ledger = docs.groupBy($"bucket")
      .agg(sum($"n_pieces").as("bucket_pieces"))
    val wLedger = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ledger.select($"bucket",
      coalesce(sum($"bucket_pieces").over(wLedger), lit(0L)).as("bucket_off"))
    val wInBucket = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .join(broadcast(offsets), "bucket")
      .select($"doc_id", $"n_pieces",
        ($"bucket_off" +
          coalesce(sum($"n_pieces").over(wInBucket), lit(0L))).as("start_off"))
      .select($"doc_id", $"n_pieces", $"start_off",
        // floor, not cast: DuckDB CAST(double AS BIGINT) rounds where
        // Spark truncates — floor() agrees in both engines
        floor($"start_off" / lit(PackCtx)).cast("long").as("bin_id"))
      .orderBy($"doc_id")
  }

  /** q38: token-budget corpus selection — "give me exactly B pieces,
    * reproducibly": documents are ranked in a deterministic pseudo-random
    * order (md5 of the row, like q30 — append-stable, engine/cluster
    * independent) and kept while the running piece total stays under the
    * budget (here ceil(total/4), integer-exact in both engines). The
    * last kept doc may straddle the budget; the cut is on the running
    * sum BEFORE the doc, the convention that never emits a partial doc.
    *
    * Scale shape — the naive form is a GLOBAL window over the hash
    * order (single-partition funnel); this is q31's two-level scan
    * transposed to hash order: the bucket key is a LEADING HEX PREFIX
    * of the hash (prefix order == hash order, md5 uniformity keeps
    * buckets balanced at ~sqrt(n) rows), per-bucket sums make a
    * ~sqrt(n)-row ledger, the running sum runs over the ledger only,
    * and within-bucket windows are bounded. Reads only
    * (doc_id, n_chars) — `text` never scans. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val n = math.max(1L, raw.count())
    // hex-prefix length m: 16^m buckets ~ sqrt(n) (m>=1, <=8)
    val m = math.min(8, math.max(1,
      math.round(math.log(math.sqrt(n.toDouble)) / math.log(16.0)).toInt))
    val docs = raw.select(
      $"doc_id",
      ceil($"n_chars" / 4.0).cast("long").as("n_pieces"),
      substring(md5(concat(lit("graft-budget-"), $"doc_id".cast("string"))),
        1, 8).as("u_hex"))
      .withColumn("bucket", substring($"u_hex", 1, m))
    val ledger = docs.groupBy($"bucket")
      .agg(sum($"n_pieces").as("bucket_pieces"))
    val wLedger = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ledger.select($"bucket",
      coalesce(sum($"bucket_pieces").over(wLedger), lit(0L)).as("bucket_off"))
    // budget from the LEDGER (16^m rows), not a second corpus pass
    val total = ledger.agg(coalesce(sum($"bucket_pieces"), lit(0L)))
      .head().getLong(0)
    val budget = (total + 3) / 4
    val wInBucket = Window.partitionBy($"bucket").orderBy($"u_hex", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .join(broadcast(offsets), "bucket")
      .select($"doc_id", $"n_pieces",
        ($"bucket_off" +
          coalesce(sum($"n_pieces").over(wInBucket), lit(0L))).as("cum_before"),
        $"u_hex")
      .filter($"cum_before" < budget)
      .orderBy($"doc_id")
  }

  /** 32-bit keep-hash space for [[temperatureMix]] thresholds. */
  val TempHashSpace: BigInt = BigInt(1) << 32

  /** Integer-exact per-source keep thresholds for [[temperatureMix]]:
    * given the (source, total-pieces) ledger, source s's expected kept
    * pieces are budget·q_s with q_s ∝ sqrt(w_s) (temperature T=2, the
    * canonical multilingual-mixing α=1/T=0.5), so its per-row keep rate
    * is min(1, budget·sqrt(w_s) / (Σ√·w_s)). All arithmetic after the
    * one floor(sqrt(·)) is BigInt — the threshold is a pure integer
    * function of the ledger, so Spark and the DuckDB oracle (HUGEINT)
    * agree bit-for-bit with NO float rounding to diverge on.
    * floor(sqrt) itself is safe cross-engine: IEEE-754 sqrt is
    * correctly rounded (unlike pow, which is why α is 1/2 and not a
    * knob here; a free-α variant needs a rational-exponent integer
    * power to stay exact). Rates cap at 1 (keep-all sentinel
    * "g0000000" sorts above every hex string, q30's trick):
    * upsampling past 1 is an epoch-count concern, not a row filter. */
  def temperatureThresholds(led: Seq[(String, Long)]): Seq[(String, String)] = {
    if (led.isEmpty) return Seq.empty
    val sqrts = led.map { case (_, w) =>
      BigInt(math.sqrt(math.max(0L, w).toDouble).toLong)
    }
    val sTot = sqrts.sum
    val budget = led.map { case (_, w) => BigInt(w) }.sum / 4
    led.zip(sqrts).map { case ((src, w), ss) =>
      val t =
        if (sTot == 0 || w <= 0) BigInt(0)
        else (TempHashSpace * ss * budget) / (sTot * BigInt(w))
      val hex = if (t >= TempHashSpace) "g0000000" else f"${t.toLong}%08x"
      (src, hex)
    }
  }

  /** q39: temperature-scaled source mixing — the Pile/mC4-style
    * re-balancing pass: sources are re-weighted q_s ∝ w_s^(1/T) (T=2)
    * so small sources punch above their byte count, then rows are kept
    * by q30's deterministic md5 predicate against a per-source
    * threshold. Unlike q30's fixed demo rates, the rates here are
    * COMPUTED from the corpus itself under a total piece budget
    * (Σw/4), which is what a real mixing config is derived from.
    *
    * Scale shape: one partial-agg ledger over (source) — source-count
    * rows, the same vocab-bound-collect class as q36's centroids —
    * then a broadcast join of the tiny threshold table and a map-only
    * filter. `text` never scans (ledger reads n_chars; output reads
    * doc_id/source); the keep decision is a pure function of the row
    * and the ledger, so it is reproducible across engines and cluster
    * sizes and append-stable GIVEN a frozen ledger (re-deriving the
    * ledger on an appended corpus legitimately re-weights — freeze the
    * threshold table to pin decisions across corpus versions). */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val led = docs.groupBy($"source")
      .agg(sum(ceil($"n_chars" / 4.0).cast("long")).as("w"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val thr = temperatureThresholds(led)
    val u = substring(md5(concat(lit("graft-temp-"), $"doc_id".cast("string"))), 1, 8)
    val base = docs.select($"doc_id", $"source", u.as("u_hex"))
    if (thr.isEmpty)
      return base.withColumn("t_hex", lit("")).filter(lit(false))
        .select($"doc_id", $"source", $"t_hex", $"u_hex")
    base.join(broadcast(thr.toDF("source", "t_hex")), "source")
      .filter($"u_hex" < $"t_hex")
      .select($"doc_id", $"source", $"t_hex", $"u_hex")
      .orderBy($"doc_id")
  }

  /** Oracle mirror of [[temperatureMix]]: same ledger, same integer
    * threshold arithmetic in HUGEINT (int128 — exact, like BigInt). */
  val temperatureMixSql: String =
    """WITH pieces AS (
      |  SELECT doc_id, source, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_pieces
      |  FROM documents),
      |led AS (SELECT source, sum(n_pieces) AS w FROM pieces GROUP BY source),
      |par AS (SELECT CAST(sum(w) AS HUGEINT) // 4 AS b,
      |               sum(CAST(floor(sqrt(w)) AS HUGEINT)) AS s_tot FROM led),
      |thr AS (
      |  SELECT source,
      |    CASE WHEN t >= 4294967296::HUGEINT THEN 'g0000000'
      |         ELSE printf('%08x', CAST(t AS BIGINT)) END AS t_hex
      |  FROM (SELECT source,
      |          CASE WHEN s_tot = 0 OR w <= 0 THEN 0::HUGEINT
      |               ELSE (4294967296::HUGEINT * CAST(floor(sqrt(w)) AS HUGEINT) * b)
      |                      // (s_tot * CAST(w AS HUGEINT)) END AS t
      |        FROM led, par) q)
      |SELECT d.doc_id, d.source, t.t_hex,
      |  substr(md5('graft-temp-' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS u_hex
      |FROM documents d JOIN thr t USING (source)
      |WHERE substr(md5('graft-temp-' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t.t_hex
      |ORDER BY d.doc_id""".stripMargin

  /** Oracle mirror of [[tokenBudget]]: the naive global window over the
    * hash order (exact same math the two-level scan distributes). */
  val tokenBudgetSql: String =
    """WITH pieces AS (
      |  SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_pieces,
      |    substr(md5('graft-budget-' || CAST(doc_id AS VARCHAR)), 1, 8) AS u_hex
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, n_pieces, u_hex,
      |    CAST(COALESCE(sum(n_pieces) OVER (ORDER BY u_hex, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM pieces),
      |tot AS (SELECT (sum(n_pieces) + 3) // 4 AS budget FROM pieces)
      |SELECT doc_id, n_pieces, cum_before, u_hex FROM cum, tot
      |WHERE cum_before < budget
      |ORDER BY doc_id""".stripMargin

  val packSequencesSql: String =
    s"""SELECT doc_id, n_pieces, start_off, CAST(floor(start_off / $PackCtx) AS BIGINT) AS bin_id
       |FROM (
       |  SELECT doc_id, n_pieces,
       |    CAST(COALESCE(sum(n_pieces) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM (
       |    SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_pieces
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** q45: GROUP-level quality curation — drop every document from the
    * bottom-quartile SOURCES by mean quality (the C4/RefinedWeb-style
    * "remove low-quality domains wholesale" pass; the doc-level
    * analog is q37's tercile selection). The decision unit is the
    * source, not the document: a mediocre doc from a good source
    * survives, a good doc from a bad source does not — that is the
    * point of domain curation, and no per-doc operator expresses it.
    *
    * Determinism across engines/cluster sizes: per-doc quality is
    * q18's exact rounded column, lifted to integer 1e-4 units
    * (`round(q*10000)` — the q33 integer-exact aggregation pattern),
    * so the per-source sum is a plain long; the mean takes ONE rounded
    * division; sources rank by (mean, source) — a total order — and
    * the bottom floor(nSources/4) are dropped.
    *
    * Scale shape: two column-pruned scans (quality pass reads
    * (source, text); the join pass reads (doc_id, source) — q33's
    * documented two-pass trade vs caching a corpus-sized
    * intermediate). The groupBy(source) partial-aggregates, so the
    * shuffle carries source-count rows PER TASK; ranking runs on the
    * sources-sized ledger only (the q31/q38 single-partition-ledger
    * pattern); the verdict joins back as a BROADCAST. Documents never
    * shuffle. */
  def sourceQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q4 = round(TextAnalysis.qualityScore($"text") * 10000).cast("long")
    val led = docs.select($"source", q4.as("q4"))
      .groupBy($"source")
      .agg(sum($"q4").as("sq"), count(lit(1)).as("n"))
      .withColumn("src_quality", round($"sq" / ($"n" * 10000.0), 4))
    val ranked = led
      .withColumn("rk",
        row_number().over(Window.orderBy($"src_quality", $"source")))
      .withColumn("n_src", count(lit(1)).over(
        Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"source", $"src_quality",
        ($"rk" > floor($"n_src" / 4)).cast("int").as("kept"))
    docs.select($"doc_id", $"source")
      .join(broadcast(ranked), "source")
      .select($"doc_id", $"source", $"src_quality", $"kept")
      .orderBy($"doc_id")
  }

  /** Oracle mirror of [[sourceQualityFilter]]: q18's quality formula
    * verbatim, the same integer-exact ledger, the same
    * (mean, source)-ordered bottom-quartile cut. */
  val sourceQualityFilterSql: String = {
    val stopList = TextAnalysis.QualityStopwordsSql
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source,
       |    CAST(round(round(least(1.0, len(toks) / 100.0)
       |      * round(len(list_filter(toks, t -> regexp_matches(t, '^[a-z]+$$'))) / CAST(len(toks) AS DOUBLE), 4)
       |      * (1.0 - round(len(list_filter(toks, t -> t IN ($stopList))) / CAST(len(toks) AS DOUBLE), 4) * 0.5),
       |      4) * 10000) AS BIGINT) AS q4
       |  FROM d),
       |led AS (
       |  SELECT source, round(sum(q4) / (count(*) * 10000.0), 4) AS src_quality
       |  FROM q GROUP BY source),
       |ranked AS (
       |  SELECT source, src_quality,
       |    row_number() OVER (ORDER BY src_quality, source) AS rk,
       |    count(*) OVER () AS n_src
       |  FROM led)
       |SELECT d.doc_id, d.source, r.src_quality,
       |  CAST(r.rk > (r.n_src // 4) AS INT) AS kept
       |FROM documents d JOIN ranked r USING (source)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Chunk window (tokens) and stride for [[chunkOverlap]]; stride <
    * window so consecutive chunks share window-stride tokens of context
    * — the standard RAG/embedding-prep overlap. Small enough that sf0.01
    * documents produce multi-chunk splits. */
  val ChunkWindow = 64
  val ChunkStride = 48

  /** q50: overlapping fixed-size chunking (RAG / embedding prep).
    * Documents split into [[ChunkWindow]]-token windows every
    * [[ChunkStride]] tokens; the last window is the remainder (shorter,
    * never empty). A doc with n tokens yields floor((n-1)/stride)+1
    * chunks, so every token is covered and every chunk start is < n.
    *
    * Plan shape: scan → project (tokenize once) → generate
    * (explode over the per-doc chunk-count sequence) → project
    * (slice + rejoin). Entirely map-side — NO shuffle anywhere before
    * the presentation sort: chunking is embarrassingly parallel and a
    * 100 TB corpus chunks at scan speed. The token array is computed
    * once per doc and slices share it; output text is bounded by
    * window size, so row width stays bounded regardless of document
    * length (a 1 GB pathological doc becomes many bounded rows, not one
    * unbounded one — the property that keeps downstream embedders'
    * batch memory flat). */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = ChunkWindow
    val s = ChunkStride
    val toks = filter(split(lower($"text"), "\\s+"), t => t =!= "")
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", toks.as("toks"))
      .withColumn("n", size($"toks").cast("long"))
      .filter($"n" > 0)
      .select($"doc_id", $"toks", $"n",
        explode(sequence(lit(0L),
          floor(($"n" - 1L) / lit(s.toLong)).cast("long"))).as("chunk_id"))
      .select(
        $"doc_id",
        $"chunk_id",
        ($"chunk_id" * s).as("chunk_start"),
        size(slice($"toks", ($"chunk_id" * s + 1).cast("int"), lit(w)))
          .cast("long").as("n_tokens"),
        array_join(slice($"toks", ($"chunk_id" * s + 1).cast("int"), lit(w)), " ")
          .as("chunk_text"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Oracle mirror of [[chunkOverlap]] — DuckDB's list_slice is 1-based
    * inclusive-end and clamps like Spark's slice(start, length). */
  val chunkOverlapSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |n AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
       |c AS (SELECT doc_id, toks,
       |        unnest(generate_series(0, (n - 1) // $ChunkStride)) AS chunk_id
       |      FROM n)
       |SELECT doc_id, chunk_id,
       |  chunk_id * $ChunkStride AS chunk_start,
       |  CAST(len(list_slice(toks, chunk_id * $ChunkStride + 1,
       |                      chunk_id * $ChunkStride + $ChunkWindow)) AS BIGINT) AS n_tokens,
       |  array_to_string(list_slice(toks, chunk_id * $ChunkStride + 1,
       |                             chunk_id * $ChunkStride + $ChunkWindow), ' ') AS chunk_text
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin
}
