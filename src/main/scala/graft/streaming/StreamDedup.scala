package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.SegmentStore

/** Incremental exact dedup for the continuous-indexing path: each
  * micro-batch is deduped against everything ALREADY ingested before it
  * is indexed — the q44 Bloom-prefilter + exact-confirm pattern
  * ([[graft.operators.Dedup.bloomDedup]], Dolma-style) composed with
  * [[StreamIndexer]], which is how a production crawl actually runs:
  * re-offered content must add zero postings, not re-index.
  *
  * Artifacts (append-only, replay-idempotent, under `root/dedup/`):
  *
  *   digests/epoch-N/   parquet of the content digests epoch N indexed
  *                      (its FRESH slice only — dup content is already
  *                      present in an earlier epoch's file)
  *   bloom-N.bin        cumulative Bloom filter after epoch N =
  *                      bloom-(prior) ∪ bloom(epoch N's fresh digests)
  *
  * Every per-epoch bloom is built with the SAME fixed (items, bits)
  * parameters, so the serialized sketches stay merge-compatible
  * (`BloomFilter.mergeInPlace` requires identical bit width and hash
  * count) — the filter is built once per generation and merged forward,
  * never rebuilt over the accumulated corpus.
  *
  * Per-epoch cost and why it scales: the batch is hashed map-only; the
  * cumulative bloom (1 MiB at the default 2^23 bits) prunes the
  * candidate set to |true dups| + fpp·|novel| BEFORE any I/O against
  * history; the exact confirm then scans ONLY the prior digest files
  * (16 B per ingested doc — narrow by construction) against the
  * broadcast candidates, so a false positive can never drop a novel
  * document and the result is independent of the bloom's fpp, exactly
  * like q44. The indexed corpus itself is never re-read. At 10^12
  * ingested keys the same two knobs apply as in bloomDedup's scaladoc:
  * shard the bloom by digest prefix, and compact the per-epoch digest
  * files the way the index segments are compacted.
  *
  * Epoch N's own artifacts never feed its own dedup (only epochs < N
  * are consulted), so a crash-replay recomputes the identical fresh
  * slice from the identical inputs no matter which artifact writes
  * survived the crash.
  */
object StreamDedup {

  /** Fixed sketch shape for every epoch bloom: 2^20 expected items over
    * 2^23 bits (1 MiB serialized) — fixed so sketches merge; undersizing
    * only raises fpp (more confirm probes), never wrongness. */
  val BloomItems: Long = 1L << 20
  val BloomBits: Long = 1L << 23

  private def dedupDir(root: String) = s"$root/dedup"
  private def digestsDir(root: String) = s"${dedupDir(root)}/digests"
  private def epochDigests(root: String, e: Long) =
    s"${digestsDir(root)}/epoch-$e"
  private def bloomPath(root: String, e: Long) =
    new Path(s"${dedupDir(root)}/bloom-$e.bin")

  /** Epochs strictly before `epochId` that committed digests. */
  private def priorEpochs(root: String, epochId: Long): Seq[Long] = {
    val fs = SegmentStore.fs(root)
    val d = new Path(digestsDir(root))
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("epoch-") => n.stripPrefix("epoch-").toLong }
      .filter(_ < epochId).sorted
  }

  /** The newest committed cumulative bloom before `epochId`. */
  private def priorBloom(root: String, epochId: Long): Option[Array[Byte]] = {
    val fs = SegmentStore.fs(root)
    val d = new Path(dedupDir(root))
    if (!fs.exists(d)) return None
    val ks = fs.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.startsWith("bloom-") && n.endsWith(".bin") =>
        n.stripPrefix("bloom-").stripSuffix(".bin").toLong }
      .filter(_ < epochId)
    if (ks.isEmpty) None
    else {
      val p = bloomPath(root, ks.max)
      val in = fs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream(1 << 16)
        val buf = new Array[Byte](1 << 16)
        var r = in.read(buf)
        while (r >= 0) { bos.write(buf, 0, r); r = in.read(buf) }
        Some(bos.toByteArray)
      } finally in.close()
    }
  }

  /** The never-seen slice of a micro-batch, first-wins within the batch
    * (smallest doc_id keeps each digest). Input needs (doc_id, content)
    * columns; output carries the input columns plus `h` (the digest —
    * [[commit]] wants it back). */
  def freshSlice(batch: DataFrame, root: String, epochId: Long): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val withH = batch.withColumn("h", md5($"content"))
    // within-batch exact dedup: min doc_id per digest (a replayed
    // crawl frame can carry its own internal copies)
    val firsts = withH.groupBy($"h").agg(min($"doc_id").as("doc_id"))
    val batchDedup = withH.join(firsts, Seq("h", "doc_id"), "left_semi")
    priorBloom(root, epochId) match {
      case None => batchDedup // nothing ever ingested
      case Some(bloom) =>
        val cand = batchDedup
          .filter(graft.operators.Dedup.bloomMightContain(bloom, $"h"))
          .select($"h").distinct()
        val eps = priorEpochs(root, epochId)
        if (eps.isEmpty) batchDedup
        else {
          val seen = spark.read
            .parquet(eps.map(e => epochDigests(root, e)): _*)
            .join(broadcast(cand), Seq("h"), "left_semi").distinct()
          batchDedup.join(seen, Seq("h"), "left_anti")
        }
    }
  }

  /** Record epoch N's fresh digests and extend the cumulative bloom.
    * Idempotent: a replay overwrites both artifacts with identical
    * content. Call only for a non-empty fresh slice. */
  def commit(freshH: DataFrame, root: String, epochId: Long): Unit = {
    val spark = freshH.sparkSession
    import spark.implicits._
    val digests = freshH.select($"h").distinct()
    digests.write.mode("overwrite").parquet(epochDigests(root, epochId))
    // epoch bloom from the just-written artifact (one narrow read, and
    // the bloom provably covers exactly what the digest file claims)
    val mine = graft.operators.Dedup.corpusBloom(
      spark.read.parquet(epochDigests(root, epochId)),
      BloomItems, BloomBits)
    if (mine != null) {
      val merged = priorBloom(root, epochId) match {
        case None => mine
        case Some(pb) =>
          val a = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(pb))
          val b = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(mine))
          a.mergeInPlace(b)
          val bos = new java.io.ByteArrayOutputStream(mine.length)
          a.writeTo(bos)
          bos.toByteArray
      }
      val fs = SegmentStore.fs(root)
      fs.mkdirs(new Path(dedupDir(root)))
      val fin = bloomPath(root, epochId)
      val tmp = new Path(fin.toString + s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(merged) finally out.close()
      if (fs.exists(fin)) fs.delete(fin, false)
      fs.rename(tmp, fin)
    }
  }
}
