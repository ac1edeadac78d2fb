package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, TextRelational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-equivalent in `oracleSql` (same
  * column names, same deterministic ORDER BY) unless the operator is not
  * SQL-expressible. All float outputs are either exact (decimal-derived)
  * doubles or rounded after exact-order computation, so the driver's
  * hash compare is stable across engines.
  */
object SparkEntry {

  /** Flagship: BM25 top-k over the documents table on sf=0.001. */
  def entry(spark: SparkSession): DataFrame =
    TextRelational.bm25TopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational coverage (hash agg / broadcast join / top-k / window)
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q03_top_revenue" -> ((s, d) => Relational.topRevenue(s, d)),
    "q04_supplier_top_parts" -> ((s, d) => Relational.supplierTopParts(s, d)),
    // Fulltext pipeline, SQL-checkable profile (SURVEY §2.2-§2.5)
    "q05_term_tf" -> ((s, d) => TextRelational.termTf(s, d)),
    "q06_term_stats" -> ((s, d) => TextRelational.termStats(s, d)),
    "q07_doc_stats" -> ((s, d) => TextRelational.docStats(s, d)),
    "q08_bm25_topk" -> ((s, d) => TextRelational.bm25TopK(s, d)),
  )

  /** DuckDB equivalents, same column names + total ORDER BY. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.pricingSummarySql,
    "q03_top_revenue" -> Relational.topRevenueSql,
    "q04_supplier_top_parts" -> Relational.supplierTopPartsSql,
    "q05_term_tf" -> TextRelational.termTfSql,
    "q06_term_stats" -> TextRelational.termStatsSql,
    "q07_doc_stats" -> TextRelational.docStatsSql,
    "q08_bm25_topk" -> TextRelational.bm25TopKSql(),
  )
}
