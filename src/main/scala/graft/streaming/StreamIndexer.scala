package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.{Build, Merge, SegmentStore}

/** Continuous index maintenance: a Structured Streaming sink that turns
  * a document stream into an always-queryable inverted index. Each
  * micro-batch builds a SNAPSHOT index over just its own documents
  * (the full salted/compressed/resumable build — nothing is
  * re-implemented for streaming), then the published index is re-merged
  * metadata-only and an atomic pointer flips:
  *
  *   root/snapshots/epoch-N/   one complete index per non-empty batch
  *   root/merged-N/            current ∪ epoch-N (hard-linked segments)
  *   root/CURRENT              the live pointer (tmp-write + rename)
  *
  * Per-epoch cost is O(batch) build + O(#segment files) merge — the
  * linkOrCopy merge keeps chained re-merges from re-copying the
  * accumulated posting bytes. Readers open whatever CURRENT names and
  * are never blocked or torn: dirs are immutable once published, and
  * the pointer flip is a rename.
  *
  * The reference's analog is rebuild-the-index-then-restart
  * (search_engine.py:101-102 builds, 62-71 loads); here ingestion and
  * serving coexist. Caller contract (the same one [[Merge.disjoint]]
  * validates): batches carry strictly increasing doc_id ranges, as any
  * snapshot-numbered ingest assigns them.
  *
  * Failure semantics: foreachBatch may replay an epoch after a restart;
  * a replay finds the epoch's `_DONE` marker and skips straight to
  * re-publishing, so snapshots are built exactly once and the pointer
  * converges (idempotent per epoch).
  */
object StreamIndexer {

  /** The live index directory, if any batch has been published. */
  def currentIndex(root: String): Option[String] = readPointer(root, "CURRENT")

  /** The generation CURRENT pointed at before the last flip — the GC
    * grace dir. Persisted (not derived from in-memory state) so a
    * crash-replay of an epoch, where `prev == target`, still knows
    * which generation a pre-crash reader may have loaded. */
  private[streaming] def previousIndex(root: String): Option[String] =
    readPointer(root, "PREVIOUS")

  private def readPointer(root: String, name: String): Option[String] = {
    val fs = SegmentStore.fs(root)
    val p = new Path(s"$root/$name")
    if (!fs.exists(p)) None
    else {
      // open FIRST, then read to EOF from the open stream: sizing a
      // buffer from getFileStatus and opening afterwards races the
      // atomic pointer flip — the old generation's length against the
      // new file yields an EOFException or a TRUNCATED path that can
      // name a long-GC'd generation. The open stream is coherent: the
      // rename is atomic, so the stream sees exactly one generation.
      val in = fs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream(64)
        val buf = new Array[Byte](256)
        var r = in.read(buf)
        while (r >= 0) { bos.write(buf, 0, r); r = in.read(buf) }
        Some(new String(bos.toByteArray, "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writePointer(root: String, name: String, target: String): Unit = {
    val fs = SegmentStore.fs(root)
    val tmp = new Path(s"$root/$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(target.getBytes("UTF-8")) finally out.close()
    // FileContext rename with OVERWRITE: one atomic replace — a plain
    // delete+rename pair would leave a window where a reader finds no
    // pointer at all, breaking the never-torn claim
    org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
      .rename(tmp, new Path(s"$root/$name"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def publish(root: String, target: String): Unit = {
    // record the generation being superseded BEFORE flipping: on a
    // crash-replay of this epoch `currentIndex == target`, so deriving
    // the grace dir from in-memory prev would name the target itself
    // and GC would delete the one generation a pre-crash reader may
    // still hold (review finding) — the persisted pointer survives
    // the replay with the true previous value
    currentIndex(root).filter(_ != target)
      .foreach(old => writePointer(root, "PREVIOUS", old))
    writePointer(root, "CURRENT", target)
  }

  /** One epoch's work: build-if-absent, merge-if-absent,
    * compact-if-due, publish, GC superseded generations. Exposed
    * (package-private) so replay idempotency is directly testable —
    * this is exactly the foreachBatch body.
    *
    * Compaction (`compactEvery` > 0): every that-many epochs the
    * published index is [[Merge.compact]]ed — true block maxes are
    * recomputed so `bound_scale` (which composes per chained re-merge
    * and decays WAND pruning toward exhaustive over a long stream)
    * resets to 1. O(index bytes) streaming rewrite, amortized to
    * O(bytes/compactEvery) per epoch; dict/stats pointers carry over.
    *
    * GC (`gc` = true): snapshot/merged/compact generations the
    * published pointer can no longer reach are deleted after each
    * publish. Hard-linked segments make the live dir self-contained, so
    * only three dirs survive: the new target, the PREVIOUS target (one
    * epoch of grace for a reader that loaded CURRENT just before the
    * flip), and this epoch's snapshot (so a crash-replay of the epoch
    * skips its rebuild). A replay whose snapshot was GC'd in a later
    * epoch rebuilds it idempotently — wasted work, never wrong results. */
  private[streaming] def processBatch(batch: Dataset[StreamIngest.DocEvent],
                                      epochId: Long, root: String,
                                      cfg: Build.Config,
                                      compactEvery: Int = 0,
                                      gc: Boolean = false,
                                      dedup: Boolean = false): Unit = {
    // persist: the batch is consumed by TWO actions (the isEmpty probe
    // and the snapshot build's staging scan) — without it every epoch
    // re-fetches the micro-batch from the source, which is not free for
    // remote-broker/object-storage sources
    batch.persist()
    try {
      if (batch.isEmpty) return
      val spark = batch.sparkSession
      val fs = SegmentStore.fs(root)
      // incremental dedup (q44 composed with the epoch path): index
      // only the never-seen slice; an all-duplicate batch publishes
      // nothing and adds zero postings. The fresh slice is recomputed
      // on replay from epochs < N only, so it is replay-deterministic
      // regardless of which epoch-N artifacts a crash left behind.
      val fresh: DataFrame =
        if (!dedup) batch.toDF()
        else StreamDedup.freshSlice(batch.toDF(), root, epochId)
      if (dedup) fresh.persist()
      try {
        if (dedup && fresh.isEmpty) return
        val snap = s"$root/snapshots/epoch-$epochId"
        val done = new Path(s"$snap/_DONE")
        if (!fs.exists(done)) {
          Build.run(spark, fresh
            .select(col("doc_id"), col("content"),
              col("ts").cast("long").as("ingest_ts")),
            snap, cfg)
          fs.create(done, true).close()
        }
        processBatchPublished(batch, epochId, root, cfg, compactEvery, gc,
          snap)
        if (dedup) StreamDedup.commit(fresh.select(col("h")), root, epochId)
      } finally if (dedup) fresh.unpersist()
    } finally batch.unpersist()
  }

  /** Post-snapshot phase of [[processBatch]]: merge/compact + publish +
    * GC (split out so the persist/unpersist lifecycle above stays a
    * single try/finally around both actions). */
  private def processBatchPublished(batch: Dataset[StreamIngest.DocEvent],
                                    epochId: Long, root: String,
                                    cfg: Build.Config, compactEvery: Int,
                                    gc: Boolean, snap: String): Unit = {
    val spark = batch.sparkSession
    val fs = SegmentStore.fs(root)
    val prev = currentIndex(root)
    val merged = prev match {
      case None => snap
      case Some(cur) if cur == snap => snap // pure replay of epoch 0
      case Some(cur) if cur.endsWith(s"merged-$epochId") => cur // replay
      case Some(cur) if cur.endsWith(s"compact-$epochId") => cur // replay
      case Some(cur) =>
        val m = s"$root/merged-$epochId"
        if (!fs.exists(new Path(s"$m/_DONE"))) {
          Merge.disjoint(spark, Seq(cur, snap), m, spellIndex = cfg.spellIndex)
          fs.create(new Path(s"$m/_DONE"), true).close()
        }
        m
    }
    val target =
      if (compactEvery > 0 && epochId > 0 && epochId % compactEvery == 0 &&
          merged.startsWith(s"$root/merged-")) {
        val c = s"$root/compact-$epochId"
        if (!fs.exists(new Path(s"$c/_DONE"))) {
          Merge.compact(spark, merged, c)
          fs.create(new Path(s"$c/_DONE"), true).close()
        }
        c
      } else merged
    publish(root, target)
    // keep: the new target, its merge inputs (merged/snap), and the
    // persisted PREVIOUS generation — one epoch of grace for a reader
    // that loaded CURRENT just before the flip. PREVIOUS (not the
    // in-memory `prev`) is what survives a crash-replay, where
    // prev == target and the grace dir would otherwise be deleted.
    if (gc) gcSuperseded(root, keepNames =
      (Set(target, merged, snap) ++ prev ++ previousIndex(root))
        .map(p => new Path(p).getName))
  }

  /** Delete snapshot/merged/compact generations whose dir NAME is not in
    * `keepNames`. Names are unique across the three families (epoch-N /
    * merged-N / compact-N), and name-comparison sidesteps the
    * qualified-vs-plain URI mismatch of Path.toString. */
  private def gcSuperseded(root: String, keepNames: Set[String]): Unit = {
    val fs = SegmentStore.fs(root)
    def dirs(p: Path): Seq[Path] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq
    val candidates =
      dirs(new Path(s"$root/snapshots")) ++
        dirs(new Path(root)).filter { p =>
          p.getName.startsWith("merged-") || p.getName.startsWith("compact-")
        }
    candidates.filterNot(p => keepNames.contains(p.getName))
      .foreach(p => fs.delete(p, true))
  }

  /** Start the indexing sink on `docs`; returns the streaming query.
    * `cfg` is the same Build.Config the batch path takes; see
    * [[processBatch]] for `compactEvery` / `gc`. */
  def start(docs: Dataset[StreamIngest.DocEvent], root: String,
            cfg: Build.Config = Build.Config(),
            compactEvery: Int = 0, gc: Boolean = false,
            dedup: Boolean = false): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", s"$root/checkpoint")
      .foreachBatch { (batch: Dataset[StreamIngest.DocEvent], epochId: Long) =>
        processBatch(batch, epochId, root, cfg, compactEvery, gc, dedup)
      }
      .start()
  }
}
