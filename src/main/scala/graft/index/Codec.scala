package graft.index

import scala.collection.mutable.ArrayBuffer

/** Posting-list codec: delta-gap docIds + variable-byte encoding, in
  * independently-decodable blocks with per-block skip metadata (last
  * docId + max BM25 score) for block-max WAND (SURVEY.md §2.4-§2.5;
  * north rule: "sorted delta-gap + variable-byte compressed posting
  * lists").
  *
  * Replaces the reference's pickled `Map[term, List[(docId, tf,
  * tf/max)]]` segments (reference indexer.py:551-578). Each block holds
  * ≤ BlockSize postings: varbyte(first docId, then gaps), varbyte(tfs),
  * varbyte(dls) — dl stored inline so the query path needs no join
  * against doc_stats (SURVEY.md §2.6).
  *
  * Blocks are self-contained (first docId absolute), so per-salt block
  * runs from the skew-salted shuffle concatenate by firstDocId without
  * re-encoding (SURVEY.md M3).
  */
object Codec {

  val BlockSize = 128

  final case class Posting(docId: Long, tf: Int, dl: Int)

  /** One encoded block + skip metadata. */
  final case class Block(bytes: Array[Byte], n: Int,
                         firstDocId: Long, lastDocId: Long,
                         maxTf: Int, maxScore: Double)

  def varbyteEncode(values: Array[Long], out: ArrayBuffer[Byte]): Unit = {
    var i = 0
    while (i < values.length) {
      var v = values(i)
      require(v >= 0, s"varbyte requires non-negative, got $v")
      while ((v & ~0x7FL) != 0) {
        out += ((v & 0x7F) | 0x80).toByte
        v >>>= 7
      }
      out += v.toByte
      i += 1
    }
  }

  /** Decode `n` varbyte longs from `bytes` starting at `pos`; returns the
    * new position. */
  def varbyteDecode(bytes: Array[Byte], pos0: Int, n: Int,
                    out: Array[Long], outOff: Int): Int = {
    var pos = pos0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7FL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      v |= (b & 0x7FL) << shift
      out(outOff + i) = v
      i += 1
    }
    pos
  }

  /** Encode one block of docId-sorted postings. `scoreOf(tf, dl)` supplies
    * the BM25 term score used for the block-max bound — it must be the
    * SAME parameterization the query engine scores with (SURVEY.md §7.4
    * hard-part 3). */
  def encodeBlock(ps: Array[Posting], from: Int, until: Int,
                  scoreOf: (Int, Int) => Double): Block = {
    val n = until - from
    val buf = new ArrayBuffer[Byte](n * 4)
    val ids = new Array[Long](n)
    val tfs = new Array[Long](n)
    val dls = new Array[Long](n)
    var i = 0
    var prev = 0L
    var maxTf = 0
    var maxScore = 0.0
    while (i < n) {
      val p = ps(from + i)
      ids(i) = if (i == 0) p.docId else {
        require(p.docId > prev, s"postings not strictly docId-sorted at ${p.docId}")
        p.docId - prev
      }
      prev = p.docId
      tfs(i) = p.tf.toLong
      dls(i) = p.dl.toLong
      if (p.tf > maxTf) maxTf = p.tf
      val sc = scoreOf(p.tf, p.dl)
      if (sc > maxScore) maxScore = sc
      i += 1
    }
    varbyteEncode(ids, buf)
    varbyteEncode(tfs, buf)
    varbyteEncode(dls, buf)
    Block(buf.toArray, n, ps(from).docId, ps(until - 1).docId, maxTf, maxScore)
  }

  def encode(ps: Array[Posting],
             scoreOf: (Int, Int) => Double): Array[Block] = {
    val out = ArrayBuffer.empty[Block]
    var i = 0
    while (i < ps.length) {
      val until = math.min(i + BlockSize, ps.length)
      out += encodeBlock(ps, i, until, scoreOf)
      i = until
    }
    out.toArray
  }

  def decodeBlock(b: Block): Array[Posting] = {
    val ids = new Array[Long](b.n)
    val tfs = new Array[Long](b.n)
    val dls = new Array[Long](b.n)
    var pos = varbyteDecode(b.bytes, 0, b.n, ids, 0)
    pos = varbyteDecode(b.bytes, pos, b.n, tfs, 0)
    varbyteDecode(b.bytes, pos, b.n, dls, 0)
    val out = new Array[Posting](b.n)
    var i = 0
    var acc = 0L
    while (i < b.n) {
      acc = if (i == 0) ids(0) else acc + ids(i)
      out(i) = Posting(acc, tfs(i).toInt, dls(i).toInt)
      i += 1
    }
    out
  }

  def decode(blocks: Seq[Block]): Array[Posting] =
    blocks.sortBy(_.firstDocId).iterator.flatMap(decodeBlock).toArray
}
