package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.Build

/** A6 end-to-end: a queryable index over tweet-shaped rows through the
  * SAME build machinery as the code profile — the reference does this
  * fold during its merge (indexer.py:180-204, 573-574); here the fold's
  * postings feed Build.runFromPostings (stats aggs, salted shuffle,
  * varbyte segments) and the standard Engine serves it. The engine's
  * case-fold fallback (searcher.py:46-55) resolves lowercase query terms
  * against always-capitalized UPPER index terms, and multi-word entity
  * terms are queryable through the terms-level search entry.
  */
object TweetIndex {

  /** Build over rows with (doc_id | tweet_id), full_text and optional
    * retweet_quoted_text / quoted_text / ingest_ts columns. */
  def build(spark: SparkSession, tweets: DataFrame, indexDir: String,
            cfg: Build.Config = Build.Config()): Build.Result = {
    import spark.implicits._
    val cols = tweets.columns.toSet
    def optCol(n: String) =
      if (cols(n)) col(n).cast("string") else lit(null).cast("string")
    val idCol =
      if (cols("doc_id")) col("doc_id") else col("tweet_id")
    val tsCol =
      if (cols("ingest_ts")) col("ingest_ts").cast("long") else lit(0L)
    // F17 concat with the reference's exact conditional structure
    val textDf = tweets.select(idCol.cast("long").as("doc_id"),
        col("full_text"), optCol("retweet_quoted_text").as("rq"),
        optCol("quoted_text").as("q"), tsCol.as("ingest_ts"))
      .as[(Long, String, String, String, Long)]
      .map { case (id, ft, rq, q, ts) =>
        (id, TweetProfile.concatenateTweets(ft, rq, q), ts) }
      .toDF("doc_id", "text", "ingest_ts")
    TweetProfile.capitalEntityFold(spark, textDf) { folded =>
      val postings = folded
        .select($"term", $"doc_id".as("docId"), $"tf".cast("int").as("tf"),
          $"dl".cast("int").as("dl"), $"ts")
      Build.runFromPostings(spark, postings, indexDir, cfg)
    }
  }
}
