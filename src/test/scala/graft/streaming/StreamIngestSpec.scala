package graft.streaming

import graft.SparkSpec
import graft.analysis.Tokenizer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming ingest spec: incremental term stats must agree
  * with the batch tokenizer's answer on the same docs. */
class StreamIngestSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("streaming term stats converge to the batch df/cf on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamIngest.DocEvent]
    val updates = StreamIngest.termStatsStream(input.toDS(), Tokenizer.plainCfg)
    val q = updates.writeStream.format("memory").queryName("term_updates")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(StreamIngest.DocEvent(0, "alpha beta alpha", ts(0)))
      q.processAllAvailable()
      input.addData(
        StreamIngest.DocEvent(1, "beta gamma", ts(60)),
        StreamIngest.DocEvent(2, "alpha gamma gamma", ts(120)))
      q.processAllAvailable()
      // latest update per term == batch truth
      val latest = spark.sql(
        """SELECT term, df, cf FROM (
          |  SELECT *, row_number() OVER (PARTITION BY term ORDER BY df DESC) rn
          |  FROM term_updates) WHERE rn = 1""".stripMargin)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(latest == Map(
        "alpha" -> ((2L, 3L)), "beta" -> ((2L, 2L)), "gamma" -> ((2L, 3L))))
    } finally q.stop()
  }

  test("TTL term stats expire idle state: an expired term restarts its counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamIngest.DocEvent]
    // event-time TTL: expiry is driven by the data's own timestamps —
    // no sleeps, no processing-time busy-batches. Timer = last event ts
    // + 30s; it fires in the first batch that STARTS with the watermark
    // (delay 5s) past it. A key with new data in a batch is never
    // "timed out" in that same batch, so the expiry sweep needs a batch
    // of other terms before alpha returns.
    val updates = StreamIngest.termStatsStreamTtl(input.toDS(), ttl = "30 seconds",
      watermarkDelay = "5 seconds", cfg = Tokenizer.plainCfg)
    val q = updates.writeStream.format("memory").queryName("ttl_updates")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(StreamIngest.DocEvent(0, "alpha beta", ts(100)))
      q.processAllAvailable() // alpha/beta timer = 130s; watermark -> 95s
      input.addData(StreamIngest.DocEvent(1, "gamma", ts(200)))
      q.processAllAvailable() // starts at wm 95s (timer alive); wm -> 195s
      input.addData(StreamIngest.DocEvent(2, "delta", ts(210)))
      q.processAllAvailable() // starts at wm 195s > 130s: alpha/beta EXPIRE
      input.addData(StreamIngest.DocEvent(3, "alpha", ts(300)))
      q.processAllAvailable() // state was removed: df restarts at 1
      val alphaDfs = spark.sql(
        "SELECT df FROM ttl_updates WHERE term = 'alpha' ORDER BY df")
        .collect().map(_.getLong(0)).toSeq
      // two updates, BOTH df=1: the second did not resume from the first
      assert(alphaDfs == Seq(1L, 1L), s"expected restart after TTL, got $alphaDfs")
      // beta never returned after expiry: exactly its one original update
      val betaDfs = spark.sql(
        "SELECT df FROM ttl_updates WHERE term = 'beta'")
        .collect().map(_.getLong(0)).toSeq
      assert(betaDfs == Seq(1L), s"got $betaDfs")
    } finally q.stop()
  }

  test("watermarked ingest-rate windows aggregate docs and tokens") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamIngest.DocEvent]
    val rates = StreamIngest.docRateStream(input.toDS(), Tokenizer.plainCfg)
    val q = rates.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        StreamIngest.DocEvent(0, "a b c", ts(10)),
        StreamIngest.DocEvent(1, "d e", ts(20)),
        StreamIngest.DocEvent(2, "f", ts(70)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start, docs, tokens FROM rates ORDER BY 1")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(1) == 2 && rows(0).getLong(2) == 5)
      assert(rows(1).getLong(1) == 1 && rows(1).getLong(2) == 1)
    } finally q.stop()
  }

  test("clean stream: quality filter + watermarked exact dedup keep first-seen good docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamIngest.DocEvent]
    val cleaned = StreamIngest.cleanStream(input.toDS(), minQuality = 0.05)
    val q = cleaned.writeStream.format("memory").queryName("cleaned")
      .outputMode(OutputMode.Append).start()
    try {
      val good = "plenty of sensible lowercase words flowing along here nicely"
      val junk = "@@@@ #### 1234 %%%% !!!!"    // alpha_ratio 0 -> quality 0
      // timestamps sit well above epoch: the initial watermark is 0 and
      // an event AT the watermark is treated as late and dropped
      input.addData(
        StreamIngest.DocEvent(0, good, ts(1000)),
        StreamIngest.DocEvent(1, junk, ts(1001)))
      q.processAllAvailable()
      input.addData(
        StreamIngest.DocEvent(2, good, ts(1030)),  // duplicate within watermark
        StreamIngest.DocEvent(3, good + " varied", ts(1040)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM cleaned ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      // junk filtered (doc 1), duplicate dropped (doc 2), firsts kept
      assert(ids == Seq(0L, 3L), s"got $ids")
      // the streaming score is the batch q18 formula: one formula, two runtimes
      val sq = spark.sql("SELECT quality FROM cleaned WHERE doc_id = 0")
        .head().getDouble(0)
      val bq = spark.range(1)
        .select(graft.operators.TextAnalysis.qualityScore(
          org.apache.spark.sql.functions.lit(good))).head().getDouble(0)
      assert(sq == bq)
    } finally q.stop()
  }
}
