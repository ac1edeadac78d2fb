package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Tokenizer
import graft.index.Build
import graft.query.Engine
import scala.collection.concurrent.TrieMap

/** Driver-contract surface for the REAL index engine: build the full
  * salted/compressed index over the driver's `documents` table with the
  * SQL-replicable plain tokenizer, query it with block-max WAND, and let
  * DuckDB recompute the same BM25 from first principles — an
  * independent, end-to-end oracle over the codec + salted shuffle +
  * WAND path (SURVEY.md §5 item 5).
  */
object IndexOps {

  val QueryTerms: Seq[String] = Seq("spark", "join", "stream")
  val K = 20

  private val cache = TrieMap.empty[String, String]

  /** Build (once per sfDir per JVM) an index over documents.parquet. */
  def indexFor(spark: SparkSession, dir: String): String =
    cache.getOrElseUpdate(dir, {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text").as("content"))
      // JVM-exit-cleaned: repeated bench/verify runs leave no stray dirs
      val idxDir = graft.TempDirs.create("graft-docs-index")
      // low salt threshold + several salts: the oracle exercises the
      // salted path, not just the plain one
      Build.run(spark, docs, idxDir, Build.Config(
        numPartitions = 16, nSalts = 4, saltDfThreshold = 100,
        verifySha = false, tokenizer = Tokenizer.plainCfg))
      idxDir
    })

  /** Top-k BM25 through the real engine (WAND), as a DataFrame matching
    * TextRelational.bm25TopKSql's column/rounding contract. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eng = new Engine(spark, indexFor(spark, dir), Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    // over-fetch then re-rank on the ROUNDED score (the oracle sorts on
    // its rounded output column): raw-vs-rounded ties at the k-cutoff
    // would otherwise select a different tied member than DuckDB
    val hits = eng.searchWand(QueryTerms.mkString(" "), K * 3)
    eng.close()
    hits.toSeq.toDF("doc_id", "raw")
      .select($"doc_id", round($"raw", 4).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(K)
  }

  val bm25TopKSql: String =
    TextRelational.bm25TopKSql(QueryTerms, K)

  /** q28's query batch: (query_num, query text, the terms DuckDB should
    * score). Query 4 is deliberately misspelled — the engine's
    * default-on correction must resolve "sparc" to the argmax-df edit-1
    * term "spark", so the DuckDB oracle (written with the corrected
    * term) gates the spell path end-to-end. */
  val DistQueries: Seq[(Int, String, Seq[String])] = Seq(
    (1, "spark join stream", Seq("spark", "join", "stream")),
    (2, "hash merge sort", Seq("hash", "merge", "sort")),
    (3, "window filter vector", Seq("window", "filter", "vector")),
    (4, "sparc agg", Seq("spark", "agg")))

  /** q28: the distributed batch query runner against the real index —
    * queries fan out over executor tasks with the query core on a
    * broadcast (DistributedRunner scaladoc), results re-ranked on the
    * ROUNDED score like q09 so DuckDB's rounded ordering agrees at the
    * k-cutoff. */
  def distBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val idx = indexFor(spark, dir)
    val q = DistQueries.map { case (n, s, _) => (n, s) }
      .toDF("query_num", "query").repartition(4)
    val raw = graft.query.DistributedRunner.run(spark, idx, q, k = K * 3,
      tokCfg = Tokenizer.plainCfg, pruneSingletons = false)
    val w = Window.partitionBy($"query_num")
      .orderBy(round($"score", 4).desc, $"doc_id")
    raw.select($"query_num", $"doc_id", round($"score", 4).as("score"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" <= K).drop("rn")
      .orderBy($"query_num", $"score".desc, $"doc_id")
  }

  val distBm25Sql: String = DistQueries.map { case (n, _, terms) =>
    s"SELECT $n AS query_num, doc_id, score FROM (\n${TextRelational.bm25TopKSql(terms, K)})"
  }.mkString("", "\nUNION ALL\n", "\nORDER BY query_num, score DESC, doc_id")

  /** Hard-negative band for [[hardNegatives]]: list depth and the rank
    * the negatives start at. Ranks 2..HardNegLo-1 are skipped — docs
    * that close to the positive are too often unlabeled positives (the
    * standard DPR-style mining precaution). */
  val HardNegK = 15
  val HardNegLo = 11

  /** q55: hard-negative mining for retrieval training (DPR, Karpukhin
    * et al. 2020): for every training query, the engine's BM25 top-1 is
    * the positive and ranks [[HardNegLo]]..[[HardNegK]] are the hard
    * negatives — lexically confusable documents that teach a dense
    * retriever what BM25 cannot distinguish. Mined through the REAL
    * distributed engine (same fan-out as q28: query core on a
    * broadcast, zero shuffle over the corpus — 10^6 training queries
    * mine at serving throughput); ranks re-computed on the ROUNDED
    * score per q09/q28's k-cutoff tie discipline, so the band edges are
    * engine-independent and the DuckDB oracle reproduces them
    * relationally. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val idx = indexFor(spark, dir)
    val q = DistQueries.map { case (n, s, _) => (n, s) }
      .toDF("query_num", "query").repartition(4)
    val raw = graft.query.DistributedRunner.run(spark, idx, q, k = HardNegK * 3,
      tokCfg = Tokenizer.plainCfg, pruneSingletons = false)
    val w = Window.partitionBy($"query_num")
      .orderBy(round($"score", 4).desc, $"doc_id")
    raw.select($"query_num", $"doc_id", round($"score", 4).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" === 1 || ($"rank" >= HardNegLo && $"rank" <= HardNegK))
      .withColumn("role", when($"rank" === 1, "pos").otherwise("neg"))
      .select($"query_num", $"doc_id", $"rank", $"role", $"score")
      .orderBy($"query_num", $"rank")
  }

  val hardNegativesSql: String = DistQueries.map { case (n, _, terms) =>
    s"""SELECT $n AS query_num, doc_id,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank, score
       |FROM (
       |${TextRelational.bm25TopKSql(terms, HardNegK)})""".stripMargin
  }.mkString(
    "SELECT query_num, doc_id, rank,\n" +
      s"  CASE WHEN rank = 1 THEN 'pos' ELSE 'neg' END AS role, score\nFROM (\n",
    "\nUNION ALL\n",
    s"\n) WHERE rank = 1 OR rank BETWEEN $HardNegLo AND $HardNegK\n" +
      "ORDER BY query_num, rank")

  /** q54: boolean-AND retrieval through the real engine — leapfrog
    * postings intersection (EngineCore.searchConjunctive) over the same
    * salted/compressed index q09 queries, BM25-scored on the
    * intersection only. DuckDB recomputes it relationally
    * (HAVING count(DISTINCT term) = n), an independent end-to-end oracle
    * over the conjunctive path. Over-fetch + re-rank on the ROUNDED
    * score for the same k-cutoff tie discipline as q09. */
  def booleanAnd(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eng = new Engine(spark, indexFor(spark, dir), Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    val hits = eng.searchConjunctive(QueryTerms.mkString(" "), K * 3)
    eng.close()
    hits.toSeq.toDF("doc_id", "raw")
      .select($"doc_id", round($"raw", 4).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(K)
  }

  val booleanAndSql: String = TextRelational.booleanAndSql(QueryTerms, K)

  private val posBuilt = TrieMap.empty[String, Boolean]

  /** Ensure the positional sidecar exists on [[indexFor]]'s index (built
    * once per sfDir per JVM — the sidecar is an after-the-fact artifact
    * by design, PosStore scaladoc). */
  def posIndexFor(spark: SparkSession, dir: String): String = {
    val idx = indexFor(spark, dir)
    posBuilt.getOrElseUpdate(dir, {
      if (!graft.index.PosStore.exists(idx)) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text").as("content"))
        Build.buildPosStore(spark, docs, idx, Build.Config(
          numPartitions = 16, nSalts = 4, saltDfThreshold = 100,
          tokenizer = Tokenizer.plainCfg))
      }
      true
    })
    idx
  }

  /** q60: phrase search through the REAL positional index — the
    * [[graft.query.PhraseSearcher]] leapfrog + adjacency sweep over the
    * PosStore sidecar, for the SAME phrase q57 scans relationally; the
    * DuckDB oracle is q57's SQL verbatim, so codec + salted positional
    * shuffle + cursor skips + adjacency logic are all end-to-end
    * hash-gated against an independent engine (the q08/q09 discipline,
    * extended to positions). All-integer output — no float rounding
    * anywhere. */
  def phraseIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val idx = posIndexFor(spark, dir)
    val ps = new graft.query.PhraseSearcher(spark, idx, Tokenizer.plainCfg)
    val hits = try ps.search(TextRelational.PhraseTerms.mkString(" "))
               finally ps.close()
    hits.toSeq.toDF("doc_id", "n_matches", "first_pos")
      .orderBy($"n_matches".desc, $"doc_id")
  }

  val phraseIndexSql: String = TextRelational.phraseMatchSql
}
