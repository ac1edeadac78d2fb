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

  test("compaction + GC over 12 epochs: bound_scale resets to 1, dir count bounded, ranking unchanged, spell artifact served") {
    import spark.implicits._
    val root = tmpDir("graft-stream-compact")
    val cfg = Build.Config(numPartitions = 2, spellIndex = true,
      tokenizer = graft.analysis.Tokenizer.plainCfg)
    val CompactEvery = 4
    // varying doc lengths per epoch so avgdl drifts and bound_scale
    // genuinely inflates between compactions
    def docsFor(e: Int): Seq[StreamIngest.DocEvent] =
      (0 until 4).map { j =>
        val id = e * 10L + j
        val pad = Seq.tabulate((e % 3) * 3)(p => s"pad${id}x$p").mkString(" ")
        StreamIngest.DocEvent(id, s"shared term${id % 7} epoch$e $pad".trim,
          ts(1000 + e * 10 + j))
      }
    val all = (0 until 12).flatMap(docsFor)
    def scaleOf(dir: String): Double =
      spark.read.parquet(s"$dir/corpus_stats").head()
        .getAs[Double]("bound_scale")
    (0 until 12).foreach { e =>
      StreamIndexer.processBatch(docsFor(e).toDS(), e, root, cfg,
        compactEvery = CompactEvery, gc = true)
      val cur = StreamIndexer.currentIndex(root).get
      if (e > 0 && e % CompactEvery == 0) {
        assert(cur.endsWith(s"compact-$e"), s"epoch $e should publish a compaction")
        assert(scaleOf(cur) == 1.0, s"compaction left bound_scale=${scaleOf(cur)}")
      } else if (e == CompactEvery - 1) {
        assert(scaleOf(cur) > 1.0,
          "fixture should inflate bound_scale between compactions")
      }
      // live index always answers over exactly the docs so far, exactly
      val eng = new Engine(spark, cur, graft.analysis.Tokenizer.plainCfg,
        pruneSingletons = false, preload = true)
      val hits = eng.searchWand("shared", 100).map(_._1).toSet
      eng.close()
      assert(hits == (0 to e).flatMap(docsFor).map(_.doc_id).toSet,
        s"epoch $e coverage")
    }
    // GC bound: only the published target, the grace target, and the
    // last epoch's snapshot survive across the whole root
    val fs = graft.index.SegmentStore.fs(root)
    def gens: Seq[String] = {
      def ls(p: String) = {
        val hp = new org.apache.hadoop.fs.Path(p)
        if (fs.exists(hp)) fs.listStatus(hp).filter(_.isDirectory)
          .map(_.getPath.getName).toSeq
        else Nil
      }
      ls(s"$root/snapshots") ++
        ls(root).filter(n => n.startsWith("merged-") || n.startsWith("compact-"))
    }
    assert(gens.size <= 3, s"GC left ${gens.size} generations: $gens")

    // final ranking == one-shot batch build over all docs; WAND exact;
    // spell queries on the stream-served index hit the ARTIFACT path
    val cur = StreamIndexer.currentIndex(root).get
    assert(graft.query.SpellStore.load(s"$cur/spell").isDefined,
      "stream-served index missing the merged spell artifact")
    val batchDir = tmpDir("graft-stream-compact-batch")
    Build.run(spark, all.map(d => (d.doc_id, d.content, d.ts.getTime / 1000))
      .toDF("doc_id", "content", "ingest_ts"), batchDir, cfg)
    val streamed = new Engine(spark, cur, graft.analysis.Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    val oneShot = new Engine(spark, batchDir, graft.analysis.Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    Seq("shared", "term3", "epoch7 shared", "term1 term2 epoch11", "sharet")
      .foreach { q =>
        val a = streamed.searchWand(q, 25).toSeq
        assert(a == streamed.searchExhaustive(q, 25).toSeq,
          s"'$q': WAND != exhaustive on compacted stream index")
        assert(a == oneShot.searchWand(q, 25).toSeq,
          s"'$q': streamed != one-shot")
      }
    streamed.close(); oneShot.close()
  }

  test("replay with GC keeps the grace generation a pre-crash reader may hold") {
    import spark.implicits._
    val root = tmpDir("graft-stream-replaygc")
    val cfg = Build.Config(numPartitions = 4, spellIndex = false)
    def run(epoch: Long, docs: Seq[StreamIngest.DocEvent]): Unit =
      StreamIndexer.processBatch(docs.toDS(), epoch, root, cfg, gc = true)
    val fs = graft.index.SegmentStore.fs(root)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))

    run(0, batches(0))
    val gen0 = StreamIndexer.currentIndex(root).get // epoch-0 snapshot
    run(1, batches(1))
    val gen1 = StreamIndexer.currentIndex(root).get // merged-1
    assert(exists(gen0), "grace generation deleted at publish")
    // crash-after-publish replay of epoch 1: the in-memory prev now
    // EQUALS the target, so only the persisted PREVIOUS pointer knows
    // which generation a reader that loaded CURRENT just before the
    // pre-crash flip may still hold — GC must not delete it
    run(1, batches(1))
    assert(StreamIndexer.currentIndex(root).contains(gen1))
    assert(exists(gen0),
      "replay GC deleted the grace generation (review finding)")
    // the grace dir is still a fully servable index
    val eng = new Engine(spark, gen0, preload = true)
    assert(eng.searchWand("engine", 10).map(_._1).toSet == Set(0L, 1L))
    eng.close()
    // and it IS collected one epoch later — bounded grace, not a leak
    run(2, batches(2))
    assert(!exists(gen0), "grace generation never collected")
    assert(exists(gen1), "new grace generation missing after epoch 2")
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

  test("incremental bloom dedup per epoch: duplicate batches add zero postings; streamed == one-shot over the unique set") {
    import spark.implicits._
    val root = tmpDir("graft-stream-dedup")
    val cfg = Build.Config(numPartitions = 2, spellIndex = false)
    def nDocs(dir: String): Long =
      spark.read.parquet(s"$dir/corpus_stats").head().getAs[Long]("n_docs")
    // epoch 0: 3 docs, one IN-BATCH duplicate (doc 2 copies doc 0)
    val e0 = Seq(
      StreamIngest.DocEvent(0, "alpha engine spark", ts(10)),
      StreamIngest.DocEvent(1, "beta engine", ts(20)),
      StreamIngest.DocEvent(2, "alpha engine spark", ts(30)))
    StreamIndexer.processBatch(e0.toDS(), 0, root, cfg, dedup = true)
    val cur0 = StreamIndexer.currentIndex(root).get
    assert(nDocs(cur0) == 2, "in-batch duplicate must not be indexed")
    // epoch 1: a pure re-crawl of epoch-0 content under NEW doc_ids —
    // must publish nothing and add zero postings
    val e1 = Seq(
      StreamIngest.DocEvent(10, "alpha engine spark", ts(40)),
      StreamIngest.DocEvent(11, "beta engine", ts(50)))
    StreamIndexer.processBatch(e1.toDS(), 1, root, cfg, dedup = true)
    assert(StreamIndexer.currentIndex(root).contains(cur0),
      "an all-duplicate batch must not move the pointer")
    assert(nDocs(StreamIndexer.currentIndex(root).get) == 2)
    // epoch 2: mixed — one cross-epoch dup, one novel doc
    val e2 = Seq(
      StreamIngest.DocEvent(20, "beta engine", ts(60)),
      StreamIngest.DocEvent(21, "gamma delta engine", ts(70)))
    StreamIndexer.processBatch(e2.toDS(), 2, root, cfg, dedup = true)
    val cur2 = StreamIndexer.currentIndex(root).get
    assert(nDocs(cur2) == 3, "exactly the novel doc joins the index")
    val eng = new Engine(spark, cur2, preload = true,
      pruneSingletons = false) // df-1 probe terms below
    // duplicated content answers under its ORIGINAL doc_id only
    assert(eng.searchWand("beta", 10).map(_._1).toSet == Set(1L))
    assert(eng.searchWand("gamma", 10).map(_._1).toSet == Set(21L))
    // crash-replay of the mixed epoch: fresh slice recomputes from
    // epochs < 2 only, so the replay is a no-op on the pointer
    StreamIndexer.processBatch(e2.toDS(), 2, root, cfg, dedup = true)
    assert(StreamIndexer.currentIndex(root).contains(cur2),
      "dedup-epoch replay moved the pointer")
    assert(nDocs(StreamIndexer.currentIndex(root).get) == 3)
    // streamed-with-dedup == one-shot batch build over the first-wins
    // unique set (rank identity survives the dedup composition)
    val uniq = Seq(e0(0), e0(1), e2(1))
    val batchDir = tmpDir("graft-stream-dedup-batch")
    Build.run(spark,
      uniq.map(d => (d.doc_id, d.content, d.ts.getTime / 1000))
        .toDF("doc_id", "content", "ingest_ts"), batchDir, cfg)
    val oneShot = new Engine(spark, batchDir, preload = true,
      pruneSingletons = false)
    Seq("engine", "alpha spark", "gamma", "beta engine").foreach { q =>
      assert(eng.searchWand(q, 10).toSeq == oneShot.searchWand(q, 10).toSeq,
        s"'$q' diverged from the one-shot build")
    }
    eng.close(); oneShot.close()
  }
}
