package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q53: hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.
  * 2009) of a lexical BM25 list and a dense embedding-cosine list over
  * the same document ids (the driver's `documents`/`embeddings` tables
  * share the id space). This is the modern search-serving default:
  * lexical recall for exact terms, dense recall for paraphrase, fused
  * rank-only so neither score scale needs calibration:
  *
  *   rrf(d) = Σ_lists 1/(C + rank_list(d)),  C = [[Retrieval.RrfC]]
  *
  * Rank-only fusion is what makes this robust at scale: BM25 scores
  * drift with corpus stats and cosine scores with the embedding model,
  * but ranks are stable, so the fusion needs no re-tuning as the corpus
  * grows.
  *
  * Scale shape: each side is an existing top-k plan — BM25 is q08's
  * (broadcast query-term df table, TakeOrderedAndProject; at serving
  * scale the engine-path q09/q28 produces the same list from the index)
  * and cosine is q15's (broadcast 1-row query, TakeOrderedAndProject;
  * at scale the AnnStore layouts of q16/q24/q34 produce it). The fusion
  * itself joins two [[Retrieval.FuseDepth]]-row lists — driver-trivial
  * at ANY corpus size; depth is a constant, not a corpus function. Both
  * ranks are computed on the ROUNDED scores the oracle sorts on, so
  * list membership and rank are engine-independent.
  */
object Retrieval {

  /** Per-list fusion depth (how deep each retriever's list goes). */
  val FuseDepth = 50

  /** RRF smoothing constant — 60 is the value from the original paper
    * and what Elasticsearch/OpenSearch default to. */
  val RrfC = 60

  /** Fused results returned. */
  val K = 20

  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // both lists are FuseDepth rows AFTER their top-k plans; the rank
    // windows below therefore order constant-size relations, not corpus
    val bm = TextRelational.bm25TopK(spark, dir, k = FuseDepth)
      .select($"doc_id",
        row_number().over(Window.orderBy($"score".desc, $"doc_id"))
          .as("bm25_rank"))
    val cos = Similarity.annBruteForce(spark, dir, k = FuseDepth)
      .select($"vec_id".as("doc_id"),
        row_number().over(Window.orderBy($"cos".desc, $"vec_id"))
          .as("cos_rank"))
    val one = lit(1.0) // double literal: DuckDB side casts to DOUBLE too
    bm.join(cos, Seq("doc_id"), "full_outer")
      .select(
        $"doc_id",
        coalesce($"bm25_rank", lit(0)).as("bm25_rank"),
        coalesce($"cos_rank", lit(0)).as("cos_rank"),
        round(
          coalesce(one / (lit(RrfC) + $"bm25_rank"), lit(0.0)) +
          coalesce(one / (lit(RrfC) + $"cos_rank"), lit(0.0)),
          6).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(K)
  }

  val hybridRrfSql: String =
    s"""WITH bml AS (${TextRelational.bm25TopKSql(k = FuseDepth)}),
       |bmr AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS bm25_rank
       |  FROM bml),
       |cosl AS (
       |  SELECT e.vec_id AS doc_id,
       |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                 CAST(q.qe AS DOUBLE[])), 4) AS cos
       |  FROM embeddings e
       |  CROSS JOIN (SELECT embedding AS qe FROM embeddings
       |              WHERE vec_id = ${Similarity.QueryVecId}) q
       |  WHERE e.vec_id <> ${Similarity.QueryVecId}
       |  ORDER BY cos DESC, doc_id
       |  LIMIT $FuseDepth),
       |cosr AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS cos_rank
       |  FROM cosl)
       |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
       |  COALESCE(b.bm25_rank, 0) AS bm25_rank,
       |  COALESCE(c.cos_rank, 0) AS cos_rank,
       |  round(COALESCE(CAST(1 AS DOUBLE) / ($RrfC + b.bm25_rank), 0)
       |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfC + c.cos_rank), 0), 6) AS rrf
       |FROM bmr b FULL OUTER JOIN cosr c ON b.doc_id = c.doc_id
       |ORDER BY rrf DESC, doc_id
       |LIMIT $K""".stripMargin
}
