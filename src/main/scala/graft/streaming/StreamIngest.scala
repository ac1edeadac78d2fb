package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.analysis.Tokenizer

/** Structured Streaming ingest: the incremental analog of the batch
  * index build (SURVEY §2.6 lists streaming as absent in the reference —
  * its only hook is `is_last_doc` finalization, indexer.py:36, 142-152;
  * this module is the graft's optional streaming surface, done
  * Spark-first).
  *
  * Dataflow: readStream(docs) → tokenizer flatMap (the same pure
  * function as the batch build — one tokenizer, two runtimes) →
  *  - `termStatsStream`: running (term, df, cf) via stateful agg
  *  - `docRateStream`: per-window ingest metrics with watermarking
  *
  * State is per-term via mapGroupsWithState — the KeyValueGroupedDataset
  * path the builder prompt calls out. Checkpointing is Spark's own
  * (streaming checkpointLocation), complementing the batch build's
  * per-partition manifest.
  */
object StreamIngest {

  final case class DocEvent(doc_id: Long, content: String, ts: java.sql.Timestamp)
  final case class TermUpdate(term: String, df: Long, cf: Long)

  /** Tokenize a stream of docs into (term, docId, tf) posting rows. */
  def postingsStream(docs: Dataset[DocEvent],
                     cfg: Tokenizer.Config = Tokenizer.default): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val td = Tokenizer.tokenize(d.content, cfg)
      td.terms.iterator.map { case (t, tf) => (t, d.doc_id, tf, d.ts) }
    }.toDF("term", "docId", "tf", "ts")
  }

  /** Running term statistics via per-term state (df, cf), emitting an
    * update per term per micro-batch.
    *
    * State bound (explicit): EXACT running totals need one state entry
    * per distinct term ever seen — state is VOCABULARY-sized, not
    * stream-length-sized, which is the same sublinear bound the batch
    * build's term_stats carries and is the correct cost of exact df/cf.
    * A deployment that cannot carry full-vocab state trades exactness
    * for a bound with [[termStatsStreamTtl]] instead; the pipeline
    * front door (`cleanStream`) is already watermark-bounded. */
  def termStatsStream(docs: Dataset[DocEvent],
                      cfg: Tokenizer.Config = Tokenizer.default): Dataset[TermUpdate] = {
    import docs.sparkSession.implicits._
    postingsStream(docs, cfg)
      .as[(String, Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), TermUpdate](GroupStateTimeout.NoTimeout) {
        case (term, rows, state: GroupState[(Long, Long)]) =>
          val (df0, cf0) = state.getOption.getOrElse((0L, 0L))
          var df = df0; var cf = cf0
          rows.foreach { r => df += 1; cf += r._3 }
          state.update((df, cf))
          TermUpdate(term, df, cf)
      }
  }

  /** TTL-bounded variant of [[termStatsStream]]: a term idle for `ttl`
    * of EVENT time has its state EXPIRED (flatMapGroupsWithState +
    * EventTimeTimeout riding the stream's watermark), so state is
    * bounded by the active vocabulary inside the TTL horizon instead of
    * the all-time one. The documented trade: an expired term that
    * reappears RESTARTS its counts — long-tail stats become
    * horizon-local approximations while hot-term stats stay effectively
    * exact (hot terms never idle long enough to expire).
    *
    * Event-time (not processing-time) timers on purpose: processing-time
    * timers make the engine schedule no-data micro-batches continuously
    * while any timer is pending — a full state-store scan per trigger on
    * an IDLE stream, forever. Event-time timers fire inside the data
    * batches that advance the watermark, so an idle stream costs
    * nothing and expiry is deterministic against the stream's own
    * clock. */
  def termStatsStreamTtl(docs: Dataset[DocEvent], ttl: String,
                         watermarkDelay: String = "10 minutes",
                         cfg: Tokenizer.Config = Tokenizer.default): Dataset[TermUpdate] = {
    import docs.sparkSession.implicits._
    postingsStream(docs, cfg)
      .withWatermark("ts", watermarkDelay)
      .as[(String, Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), TermUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (term, rows, state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past TTL: drop state, emit nothing
            Iterator.empty
          } else {
            val (df0, cf0) = state.getOption.getOrElse((0L, 0L))
            var df = df0; var cf = cf0
            var maxTs = Long.MinValue
            rows.foreach { r =>
              df += 1; cf += r._3
              maxTs = math.max(maxTs, r._4.getTime)
            }
            state.update((df, cf))
            // timer = last-seen event time + ttl; clamped above the
            // current watermark (a timestamp at-or-below it is illegal,
            // reachable only via a late row straggling in under the
            // watermark delay)
            val base = math.max(maxTs, state.getCurrentWatermarkMs + 1)
            state.setTimeoutTimestamp(base, ttl)
            Iterator.single(TermUpdate(term, df, cf))
          }
      }
  }

  /** Watermarked per-minute ingest-rate metrics (docs, tokens). */
  def docRateStream(docs: Dataset[DocEvent],
                    cfg: Tokenizer.Config = Tokenizer.default): DataFrame = {
    import docs.sparkSession.implicits._
    docs.map(d => (d.ts, 1L, Tokenizer.tokenize(d.content, cfg).docLen.toLong))
      .toDF("ts", "docs", "tokens")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 minute"))
      .agg(sum($"docs").as("docs"), sum($"tokens").as("tokens"))
  }

  /** Streaming front door of a training-data pipeline: stateless
    * quality filter (the exact q18 composite via
    * `TextAnalysis.qualityScore` — one formula, two runtimes) then
    * exact dedup on the content digest with WATERMARK-BOUNDED state
    * (`dropDuplicatesWithinWatermark`): a duplicate arriving within
    * the watermark horizon is dropped, and digest state is expired
    * past it, so state size is bounded by the horizon's unique-doc
    * count rather than growing with the stream — the property that
    * keeps this runnable forever at ingest scale. */
  def cleanStream(docs: Dataset[DocEvent],
                  minQuality: Double = 0.05,
                  horizon: String = "10 minutes"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .withColumn("quality",
        graft.operators.TextAnalysis.qualityScore($"content"))
      .filter($"quality" >= minQuality)
      .withColumn("digest", sha2($"content", 256))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("digest")
      .select($"doc_id", $"content", $"ts", $"quality", $"digest")
  }

  /** Convenience: run a stream of docs to completion against an
    * in-memory sink; returns the sink table name. */
  def runToMemory[T](ds: Dataset[T], name: String, mode: OutputMode): Unit = {
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }
}
