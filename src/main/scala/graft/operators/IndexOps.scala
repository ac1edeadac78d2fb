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
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-docs-index").toString
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
}
