package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset
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
  def currentIndex(root: String): Option[String] = {
    val fs = SegmentStore.fs(root)
    val p = new Path(s"$root/CURRENT")
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try { in.readFully(buf); Some(new String(buf, "UTF-8").trim) }
      finally in.close()
    }
  }

  private def publish(root: String, target: String): Unit = {
    val fs = SegmentStore.fs(root)
    val tmp = new Path(s"$root/CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(target.getBytes("UTF-8")) finally out.close()
    // FileContext rename with OVERWRITE: one atomic replace — a plain
    // delete+rename pair would leave a window where a reader finds no
    // CURRENT at all, breaking the never-torn claim
    org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
      .rename(tmp, new Path(s"$root/CURRENT"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** One epoch's work: build-if-absent, merge-if-absent, publish.
    * Exposed (package-private) so replay idempotency is directly
    * testable — this is exactly the foreachBatch body. */
  private[streaming] def processBatch(batch: Dataset[StreamIngest.DocEvent],
                                      epochId: Long, root: String,
                                      cfg: Build.Config): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fs = SegmentStore.fs(root)
    val snap = s"$root/snapshots/epoch-$epochId"
    val done = new Path(s"$snap/_DONE")
    if (!fs.exists(done)) {
      Build.run(spark, batch.toDF()
        .select(col("doc_id"), col("content"),
          col("ts").cast("long").as("ingest_ts")),
        snap, cfg)
      fs.create(done, true).close()
    }
    val target = currentIndex(root) match {
      case None => snap
      case Some(cur) if cur == snap => snap // pure replay of epoch 0
      case Some(cur) if cur.endsWith(s"merged-$epochId") => cur // replay
      case Some(cur) =>
        val merged = s"$root/merged-$epochId"
        if (!fs.exists(new Path(s"$merged/_DONE"))) {
          Merge.disjoint(spark, Seq(cur, snap), merged)
          fs.create(new Path(s"$merged/_DONE"), true).close()
        }
        merged
    }
    publish(root, target)
  }

  /** Start the indexing sink on `docs`; returns the streaming query.
    * `cfg` is the same Build.Config the batch path takes. */
  def start(docs: Dataset[StreamIngest.DocEvent], root: String,
            cfg: Build.Config = Build.Config()): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", s"$root/checkpoint")
      .foreachBatch { (batch: Dataset[StreamIngest.DocEvent], epochId: Long) =>
        processBatch(batch, epochId, root, cfg)
      }
      .start()
  }
}
