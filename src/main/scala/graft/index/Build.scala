package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Tokenizer
import graft.query.BM25

/** The index build: the Spark-native replacement of the reference's whole
  * `run_engine` pipeline (reference search_engine.py:18-59 →
  * indexer.py:59-224). SURVEY.md §3.1 maps the stages:
  *
  *   scan (columnar, pruned to doc_id+content)
  *   → tokenizer flatMap (narrow; the one generator)
  *   → staging postings parquet (ONE tokenize pass feeds all consumers)
  *   → doc/term/corpus stats as Catalyst hash aggs   [shuffle 1]
  *   → salted repartition by (term, salt) + sortWithinPartitions
  *     (replaces the manual spill + external k-way merge,
  *     indexer.py:154-168, 376-554 — Spark's sort-merge shuffle IS the
  *     k-way merge)                                   [shuffle 2]
  *   → mapPartitions segment writer (narrow, per-partition checkpoint)
  *
  * Skew (north rule): terms with df ≥ saltDfThreshold (code stopwords,
  * license boilerplate) are salted by docId RANGE, so per-salt block runs
  * are docId-disjoint and concatenate without re-encoding (SURVEY.md M3;
  * hard-part 4). The heavy-term set is tiny by construction (head of the
  * Zipf curve), so it broadcasts at any corpus scale.
  */
object Build {

  final case class Config(
      numPartitions: Int = 32,
      nSalts: Int = 8,
      saltDfThreshold: Long = 100000,
      stagePostings: Boolean = true,
      stagingCodec: String = "uncompressed",
      verifySha: Boolean = true,
      tokenizer: Tokenizer.Config = Tokenizer.default)

  final case class Result(indexDir: String, nDocs: Long, avgdl: Double,
                          totalPostings: Long, shaViolations: Long,
                          lineage: String)

  /** `ts`: the doc's deterministic ingest timestamp (0 when the corpus
    * has no `ingest_ts` column) — rides the posting rows only to reach
    * doc_stats via first(); it is per-doc constant so parquet RLE makes
    * it nearly free in staging. */
  final case class PostingRow(term: String, docId: Long, tf: Int, dl: Int,
                              ts: Long)

  def postingsOf(spark: SparkSession, docs: DataFrame,
                 cfg: Tokenizer.Config): Dataset[PostingRow] =
    postingsVerified(spark, docs, cfg, None)

  /** Tokenize; when `shaViolations` is given, verify the per-row sha256
    * ingest invariant IN the same pass (north rule) — the corpus is
    * scanned once, not once per concern. */
  def postingsVerified(spark: SparkSession, docs: DataFrame,
                       cfg: Tokenizer.Config,
                       shaViolations: Option[org.apache.spark.util.LongAccumulator])
      : Dataset[PostingRow] = {
    import spark.implicits._
    val withSha = shaViolations.isDefined && docs.columns.contains("content_sha256")
    val tsCol =
      if (docs.columns.contains("ingest_ts")) $"ingest_ts".cast("long")
      else lit(0L).as("ingest_ts")
    // column pruning: only the needed columns reach the scan
    val src =
      if (withSha) docs.select($"doc_id".cast("long"), $"content",
        $"content_sha256", tsCol)
      else docs.select($"doc_id".cast("long"), $"content",
        lit(null).cast("string").as("content_sha256"), tsCol)
    src.as[(Long, String, String, Long)].flatMap { case (id, text, sha, ts) =>
      if (withSha && sha != null) {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        if (digest != sha) shaViolations.get.add(1)
      }
      // raw counter path: no per-doc Map / boxed-entry allocation —
      // tokenize dominates build CPU and memory bandwidth (BASELINE.md)
      val (counter, docLen) = Tokenizer.tokenizeRaw(text, cfg)
      val rows = new scala.collection.mutable.ArrayBuffer[PostingRow](counter.size)
      counter.foreachEntry((t, tf) => rows += PostingRow(t, id, tf, docLen, ts))
      rows
    }
  }

  private val verbose = sys.env.contains("GRAFT_BUILD_VERBOSE")
  private def phase[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (verbose) System.err.println(
      f"[build] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def run(spark: SparkSession, docs: DataFrame, indexDir: String,
          cfg: Config = Config()): Result = {
    import spark.implicits._

    val hadDocId = docs.columns.contains("doc_id")
    val docsWithId = graft.corpus.Ingest.withDocId(docs)
    if (!hadDocId) phase("docid-collision-check") {
      // doc_id was derived via xxhash64(repo,path,commit) — a collision
      // would silently merge two documents' postings (Ingest scaladoc)
      val r = docsWithId.agg(countDistinct($"doc_id"), count(lit(1))).head()
      require(r.getLong(0) == r.getLong(1),
        s"doc_id hash collision: ${r.getLong(1) - r.getLong(0)} duplicates")
    }

    // ---- one tokenize pass: sha verify + staging postings ------------
    val shaAcc =
      if (cfg.verifySha) Some(spark.sparkContext.longAccumulator("shaViolations"))
      else None
    val stagingDir = s"$indexDir/staging_postings"
    val postings: DataFrame = phase("tokenize+verify+stage") {
      if (cfg.stagePostings) {
        // default uncompressed staging: snappy's JNI critical sections
        // (GCLocker) stall allocation-heavy tokenizer threads at high
        // parallelism; staging is transient, trading space for
        // wall-clock. lz4 (pure-JVM) is the knob when staging IO volume
        // itself becomes the contention at high core counts.
        postingsVerified(spark, docsWithId, cfg.tokenizer, shaAcc)
          .write.mode(SaveMode.Overwrite)
          .option("compression", cfg.stagingCodec)
          .parquet(stagingDir)
        spark.read.parquet(stagingDir)
      } else postingsVerified(spark, docsWithId, cfg.tokenizer, shaAcc).toDF()
    }
    val shaViol = shaAcc.map(_.value.toLong).getOrElse(0L)
    require(shaViol == 0, s"$shaViol rows fail the sha256 ingest invariant")
    runFromPostings(spark, postings, indexDir, cfg, shaViol)
  }

  /** The post-tokenize build stages over an existing postings frame
    * (term, docId, tf, dl, ts) — lets alternative tokenize profiles
    * (e.g. the tweet capital/entity fold, analysis/TweetIndex) reuse the
    * stats + salted shuffle + segment machinery unchanged. */
  def runFromPostings(spark: SparkSession, postings: DataFrame,
                      indexDir: String, cfg: Config = Config(),
                      shaViol: Long = 0L): Result = {
    import spark.implicits._

    // ---- stats: Catalyst aggregates (north rule); corpus-level stats
    // ride the doc-stats write via observe() — no extra job ------------
    val obs = new org.apache.spark.sql.Observation("corpus_stats")
    phase("doc-stats") {
      postings.groupBy($"docId".as("doc_id"))
        .agg(first($"dl").as("dl"), max($"tf").as("max_tf"),
          count(lit(1)).as("uniq_terms"), first($"ts").as("ingest_ts"))
        .observe(obs, count(lit(1)).as("n"), avg($"dl").as("avgdl"),
          max($"doc_id").as("maxId"), min($"doc_id").as("minId"),
          min($"ingest_ts").as("tsMin"), max($"ingest_ts").as("tsMax"))
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/doc_stats")
    }
    val obsRow = obs.get
    val n = obsRow("n").asInstanceOf[Long]
    val av = obsRow("avgdl").asInstanceOf[Double]
    val maxId = obsRow("maxId").asInstanceOf[Long]
    val tsMin = obsRow("tsMin").asInstanceOf[Long]
    val tsMax = obsRow("tsMax").asInstanceOf[Long]
    require(obsRow("minId").asInstanceOf[Long] >= 0,
      "doc_id must be non-negative (varbyte codec encodes absolute first ids)")

    phase("term-stats") {
      postings.groupBy($"term")
        .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/term_stats")
    }

    // A9: numbers-in-corpus counter (reference persists
    // AMOUNT_OF_NUMBERS_IN_CORPUS, parser_module.py:18 + 519-521,
    // search_engine.py:57) — total emitted number-term occurrences,
    // materialized from the vocab-sized term_stats, not a corpus rescan
    val nNumbers = spark.read.parquet(s"$indexDir/term_stats")
      .filter($"term".rlike(
        "^\\d+(\\.\\d+)?[KMB%$]?$|^\\d+/\\d+$|^\\d+ \\d+/\\d+$"))
      .agg(coalesce(sum($"cf"), lit(0L))).head().getLong(0)

    // ts_min/ts_max let the engine skip loading the per-doc timestamp
    // map entirely when the corpus has no recency signal (all equal)
    Seq((n, av, tsMin, tsMax, nNumbers))
      .toDF("n_docs", "avgdl", "ts_min", "ts_max", "n_number_tokens")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/corpus_stats")

    // ---- heavy-term set for skew salting -----------------------------
    val heavy: Set[String] = phase("heavy-terms") {
      spark.read.parquet(s"$indexDir/term_stats")
        .filter($"df" >= cfg.saltDfThreshold)
        .select($"term").as[String].collect().toSet
    }
    val heavyBc = spark.sparkContext.broadcast(heavy)
    val nSalts = cfg.nSalts
    val lineage = s"docs=$n|avgdl=$av|salts=$nSalts|P=${cfg.numPartitions}|" +
      s"stem=${cfg.tokenizer.stem}|v2"

    // ---- salted term shuffle → sorted runs → segment writer ----------
    val segDir = s"$indexDir/segments"
    SegmentStore.fs(segDir).mkdirs(new org.apache.hadoop.fs.Path(s"$segDir/_markers"))
    val salted = postings
      .select($"term", $"docId", $"tf", $"dl")
      .as[(String, Long, Int, Int)]
      .map { case (term, docId, tf, dl) =>
        // docId/(maxId+1) in double space: ids may span the full 63-bit
        // hashed range, where the old integer `maxId + 1` overflowed
        val salt =
          if (heavyBc.value.contains(term))
            ((docId.toDouble / (maxId.toDouble + 1.0)) * nSalts).toInt
              .min(nSalts - 1).max(0)
          else 0
        (term, salt, docId, tf, dl)
      }

    val entries = salted
      .repartition(cfg.numPartitions, $"_1", $"_2")
      .sortWithinPartitions($"_1", $"_2", $"_3")
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val marker = SegmentStore.writePartition(segDir, pid, lineage,
          it.map { case (t, s, id, tf, dl) => (t, s, Codec.Posting(id, tf, dl)) },
          (tf, dl) => BM25.normPart(tf, dl, av)) // maxU: idf-independent
        marker.entries.iterator
      }

    phase("segments+dict") {
      entries.toDF().write.mode(SaveMode.Overwrite).parquet(s"$indexDir/dict")
    }

    // manifest markers already carry per-partition rows — no extra job
    val totalPostings = (0 until cfg.numPartitions)
      .flatMap(p => SegmentStore.readMarker(segDir, p)).map(_.rows).sum

    Result(indexDir, n, av, totalPostings, shaViol, lineage)
  }
}
