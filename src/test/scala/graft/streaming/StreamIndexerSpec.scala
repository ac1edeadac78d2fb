package graft.streaming

import graft.SparkSpec
import graft.index.Build
import graft.query.Engine
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous indexing: three micro-batches streamed through
  * StreamIndexer must yield a CURRENT index whose WAND results are
  * rank-identical to a one-shot batch build over the same documents —
  * the streamed path reuses the batch build + metadata-only merge, and
  * this spec closes the loop end-to-end (ingest while queryable). */
class StreamIndexerSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  private val batches: Seq[Seq[StreamIngest.DocEvent]] = Seq(
    Seq(StreamIngest.DocEvent(0, "import spark engine alpha", ts(10)),
        StreamIngest.DocEvent(1, "alpha beta engine", ts(20))),
    Seq(StreamIngest.DocEvent(10, "beta gamma spark spark", ts(30)),
        StreamIngest.DocEvent(11, "engine gamma alpha spark", ts(40))),
    Seq(StreamIngest.DocEvent(20, "delta engine import", ts(50))))

  test("streamed snapshots + merges == one-shot batch index (rank-identical WAND)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft-stream-idx")
    val cfg = Build.Config(numPartitions = 4, spellIndex = false)
    val input = MemoryStream[StreamIngest.DocEvent]
    val q = StreamIndexer.start(input.toDS(), root, cfg)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*)
        q.processAllAvailable()
        val cur = StreamIndexer.currentIndex(root)
        assert(cur.isDefined, s"no CURRENT after batch $i")
        // the live index always covers exactly the docs seen so far
        val eng = new Engine(spark, cur.get, preload = true)
        val hits = eng.searchWand("engine", 10).map(_._1).toSet
        val want = batches.take(i + 1).flatten
          .filter(_.content.contains("engine")).map(_.doc_id).toSet
        eng.close()
        assert(hits == want, s"after batch $i: $hits != $want")
      }
    } finally q.stop()

    // final CURRENT vs one-shot batch build over all docs: same ranking
    val all = batches.flatten
    val batchDir = tmpDir("graft-stream-batch")
    Build.run(spark,
      all.map(d => (d.doc_id, d.content, d.ts.getTime / 1000))
        .toDF("doc_id", "content", "ingest_ts"),
      batchDir, Build.Config(numPartitions = 4, spellIndex = false))
    val streamed = new Engine(spark, StreamIndexer.currentIndex(root).get,
      preload = true)
    val oneShot = new Engine(spark, batchDir, preload = true)
    Seq("engine", "spark", "alpha beta", "gamma engine spark", "delta")
      .foreach { query =>
        val a = streamed.searchWand(query, 10).toSeq
        val b = oneShot.searchWand(query, 10).toSeq
        assert(a == b, s"'$query': streamed $a != batch $b")
      }
    streamed.close(); oneShot.close()
  }

  test("epoch replay is idempotent: rebuilds skipped, pointer converges") {
    import spark.implicits._
    val root = tmpDir("graft-stream-replay")
    val cfg = Build.Config(numPartitions = 4, spellIndex = false)
    def run(epoch: Long, docs: Seq[StreamIngest.DocEvent]): Unit =
      StreamIndexer.processBatch(docs.toDS(), epoch, root, cfg)

    run(0, batches(0))
    val cur0 = StreamIndexer.currentIndex(root).get
    run(0, batches(0)) // crash-after-publish replay of epoch 0
    assert(StreamIndexer.currentIndex(root).contains(cur0),
      "epoch-0 replay moved the pointer")

    run(1, batches(1))
    val cur1 = StreamIndexer.currentIndex(root).get
    assert(cur1 != cur0)
    val fs = graft.index.SegmentStore.fs(root)
    val snapDone = new org.apache.hadoop.fs.Path(
      s"$root/snapshots/epoch-1/_DONE")
    val t0 = fs.getFileStatus(snapDone).getModificationTime
    run(1, batches(1)) // crash-after-publish replay of a MERGED epoch:
    // must not re-merge cur with its own snapshot (overlap would throw)
    assert(StreamIndexer.currentIndex(root).contains(cur1),
      "epoch-1 replay moved the pointer")
    assert(fs.getFileStatus(snapDone).getModificationTime == t0,
      "replay rebuilt an already-done snapshot")
    val eng = new Engine(spark, cur1, preload = true)
    assert(eng.searchWand("engine", 10).map(_._1).toSet == Set(0L, 1L, 11L))
    eng.close()
  }
}
