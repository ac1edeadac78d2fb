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
      verifySha: Boolean = true,
      tokenizer: Tokenizer.Config = Tokenizer.default)

  final case class Result(indexDir: String, nDocs: Long, avgdl: Double,
                          totalPostings: Long, shaViolations: Long,
                          lineage: String)

  final case class PostingRow(term: String, docId: Long, tf: Int, dl: Int)

  def postingsOf(spark: SparkSession, docs: DataFrame,
                 cfg: Tokenizer.Config): Dataset[PostingRow] = {
    import spark.implicits._
    // column pruning: only (doc_id, content) reach the scan
    docs.select($"doc_id".cast("long"), $"content").as[(Long, String)]
      .flatMap { case (id, text) =>
        val td = Tokenizer.tokenize(text, cfg)
        td.terms.iterator.map { case (t, tf) => PostingRow(t, id, tf, td.docLen) }
      }
  }

  def run(spark: SparkSession, docs: DataFrame, indexDir: String,
          cfg: Config = Config()): Result = {
    import spark.implicits._

    val shaViol =
      if (cfg.verifySha && docs.columns.contains("content_sha256"))
        graft.corpus.Ingest.shaViolations(docs).count()
      else 0L
    require(shaViol == 0, s"$shaViol rows fail the sha256 ingest invariant")

    val docsWithId = graft.corpus.Ingest.withDocId(docs)

    // ---- one tokenize pass → staging postings ------------------------
    val stagingDir = s"$indexDir/staging_postings"
    val postings: DataFrame =
      if (cfg.stagePostings) {
        postingsOf(spark, docsWithId, cfg.tokenizer)
          .write.mode(SaveMode.Overwrite).parquet(stagingDir)
        spark.read.parquet(stagingDir)
      } else postingsOf(spark, docsWithId, cfg.tokenizer).toDF()

    // ---- stats: Catalyst aggregates (north rule) ---------------------
    val docStats = postings.groupBy($"docId".as("doc_id"))
      .agg(first($"dl").as("dl"), max($"tf").as("max_tf"),
        count(lit(1)).as("uniq_terms"))
    docStats.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/doc_stats")

    val termStats = postings.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
    termStats.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/term_stats")

    val statsRow = spark.read.parquet(s"$indexDir/doc_stats")
      .agg(count(lit(1)), avg($"dl"), max($"doc_id")).head()
    val n = statsRow.getLong(0)
    val av = statsRow.getDouble(1)
    val maxId = statsRow.getLong(2)

    Seq((n, av)).toDF("n_docs", "avgdl")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/corpus_stats")

    // ---- heavy-term set for skew salting -----------------------------
    val heavy: Set[String] = spark.read.parquet(s"$indexDir/term_stats")
      .filter($"df" >= cfg.saltDfThreshold)
      .select($"term").as[String].collect().toSet
    val heavyBc = spark.sparkContext.broadcast(heavy)
    val nSalts = cfg.nSalts
    val lineage = s"docs=$n|avgdl=$av|salts=$nSalts|P=${cfg.numPartitions}|" +
      s"stem=${cfg.tokenizer.stem}|v1"

    // ---- salted term shuffle → sorted runs → segment writer ----------
    val segDir = s"$indexDir/segments"
    SegmentStore.fs(segDir).mkdirs(new org.apache.hadoop.fs.Path(s"$segDir/_markers"))
    val salted = postings
      .select($"term", $"docId", $"tf", $"dl")
      .as[(String, Long, Int, Int)]
      .map { case (term, docId, tf, dl) =>
        val salt =
          if (heavyBc.value.contains(term))
            ((docId.toDouble * nSalts) / (maxId + 1)).toInt.min(nSalts - 1)
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

    entries.toDF().write.mode(SaveMode.Overwrite).parquet(s"$indexDir/dict")

    val totalPostings = spark.read.parquet(s"$indexDir/dict")
      .agg(sum($"df")).head().getLong(0)

    Result(indexDir, n, av, totalPostings, shaViol, lineage)
  }
}
