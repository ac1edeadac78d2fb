package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analysis.Tokenizer

/** Batch query surface replaying the reference's driver loop
  * (SURVEY S3/S7/Q12):
  *  - queries file in the reference's numbered format
  *    ("N. query text", reference search_engine.py:84-98),
  *  - per-query top-k via the engine,
  *  - results as (query_num, doc_id, rank, score) rows / CSV
  *    (reference search_engine.py:113-123 writes [Query_num, Tweet_id,
  *    Rank]; score added for auditability).
  */
object QueryRunner {

  /** Parse the reference's numbered query-file format. Lines without a
    * "N." prefix are tolerated and numbered by position. */
  def parseQueries(lines: Seq[String]): Seq[(Int, String)] = {
    val numbered = "^\\s*(\\d+)\\.\\s*(.*)$".r
    lines.map(_.trim).filter(_.nonEmpty).zipWithIndex.map {
      case (numbered(n, q), _) => (n.toInt, q)
      case (q, i) => (i + 1, q)
    }
  }

  def readQueriesFile(path: String): Seq[(Int, String)] = {
    val src = scala.io.Source.fromFile(path)
    try parseQueries(src.getLines().toSeq) finally src.close()
  }

  /** Run every query; k capped at 2000 like the reference
    * (ranker.py:48-49). The engine itself spell-corrects unknown terms
    * by default (reference corrects every query, searcher.py:44);
    * `spellDf` remains for callers supplying an external dictionary and
    * feeds corrected TERMS straight to the engine — never rebuilt into a
    * string, which would re-tokenize already-normalized terms (e.g.
    * "15.6K" re-expanding through the identifier split). */
  def run(engine: Engine, queries: Seq[(Int, String)],
          k: Int = 250,
          spellDf: Option[String => Option[Long]] = None,
          tokCfg: Tokenizer.Config = Tokenizer.default,
          mode: String = "or")
      : Seq[(Int, Long, Int, Double)] = {
    val kCapped = math.min(k, 2000)
    queries.flatMap { case (qnum, q) =>
      val terms = Tokenizer.tokenizeQuery(q, tokCfg)
      val corrected = spellDf match {
        case Some(df) => terms.toSeq
          .map { case (t, qtf) => Spell.correct(t, df) -> qtf }
          .groupMapReduce(_._1)(_._2)(_ + _)
        case None => terms
      }
      val hits =
        if (mode == "and") engine.searchConjunctiveQuery(corrected, kCapped)
        else engine.searchWandQuery(corrected, kCapped)
      hits.zipWithIndex.map {
        case ((docId, score), i) => (qnum, docId, i + 1, score)
      }
    }
  }

  def toDF(spark: SparkSession,
           rows: Seq[(Int, Long, Int, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("query_num", "doc_id", "rank", "score")
  }

  def writeCsv(spark: SparkSession, rows: Seq[(Int, Long, Int, Double)],
               path: String): Unit =
    toDF(spark, rows).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
}
