package graft.operators

import org.apache.hadoop.fs.Path
import graft.index.SegmentStore

/** Persistence for the ANN vector-index layouts (round-3 review #5):
  * the partitioned parquet layouts built by [[Similarity]] lived in
  * per-JVM temp dirs keyed by an in-memory TrieMap — correct lifecycle
  * locally, but "build once, query many" across JVMs needs a
  * caller-chosen persistent root plus a small manifest, mirroring the
  * text index's marker/artifact discipline (SegmentStore markers,
  * SpellStore delete-index artifact).
  *
  * Layout on disk, per (kind, config):
  *   `<root>/<kind>-<configKey>/` — the partitionBy(bucket|list) parquet
  *   `<root>/<kind>-<configKey>/_graft_ann.bin` — the manifest
  *
  * The manifest is the COMMIT MARKER (written tmp+rename AFTER the
  * parquet data, read before any serve): a crashed build leaves parquet
  * without a manifest and is simply rebuilt. It carries everything a
  * fresh serving JVM needs besides the parquet rows — the config echo
  * (validated against the caller's config so a stale dir never serves a
  * different geometry), the trained coarse centroids (ivfLists × dim
  * doubles, probe selection) and the PQ sub-codebooks (pqM × pqK ×
  * dim/pqM doubles, the ADC LUT inputs). LSH planes are pure functions
  * of the config so the manifest stores only the config echo + dim.
  * Codebooks are KBs at any corpus scale (they are broadcast variables
  * elsewhere), so one sequential read warms a cold executor.
  *
  * Goes through Hadoop FileSystem like the posting segments — file://,
  * HDFS or S3A all work. A corrupt or mismatched manifest reads as None
  * and the caller rebuilds; it never fails the query path.
  */
object AnnStore {

  private val Magic = 0x4741_4E4E // "GANN"
  private val Version = 2 // v2 adds the source-table echo

  /** `source` is the embedding table the layout was built FROM (the
    * caller's `dir`): it keys the layout path and is validated on read,
    * so two different tables sharing one root can never serve each
    * other's vectors (a kind+config-only key aliased them — silent
    * wrong vec_ids, found in round-4 review). Content-level staleness
    * stays the caller's contract, as with any secondary index: rebuild
    * under a fresh root (or delete the layout) when the table changes. */
  final case class Manifest(kind: String, cfg: AnnConfig, source: String,
                            dim: Int,
                            coarse: Option[Array[Array[Double]]],
                            pq: Option[Array[Array[Array[Double]]]])

  private def hex(s: String): String =
    java.lang.Long.toHexString(graft.corpus.Synth.mix(
      s.foldLeft(1125899906842597L)((h, c) => 31 * h + c)))

  /** Stable directory key for a config: geometry fields only, in a
    * fixed order — two runs with the same knobs share one layout. */
  def configKey(cfg: AnnConfig): String =
    hex(s"${cfg.nBits}-${cfg.multiProbe}-${cfg.ivfLists}-" +
      s"${cfg.ivfProbes}-${cfg.ivfIters}-${cfg.pqM}-${cfg.pqK}")

  def layoutDir(root: String, kind: String, cfg: AnnConfig,
                source: String): String =
    s"$root/$kind-${configKey(cfg)}-${hex(source)}"

  private def manifestPath(dir: String) = new Path(s"$dir/_graft_ann.bin")

  private def writeMatrix(out: java.io.DataOutputStream,
                          m: Array[Array[Double]]): Unit = {
    out.writeInt(m.length)
    out.writeInt(if (m.isEmpty) 0 else m(0).length)
    m.foreach(_.foreach(out.writeDouble))
  }

  private def readMatrix(in: java.io.DataInputStream): Array[Array[Double]] = {
    val rows = in.readInt(); val cols = in.readInt()
    Array.fill(rows)(Array.fill(cols)(in.readDouble()))
  }

  def write(dir: String, m: Manifest): Unit = {
    val fs = SegmentStore.fs(dir)
    val p = manifestPath(dir)
    val tmp = new Path(p.toString + s".tmp-${java.util.UUID.randomUUID()}")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16))
    try {
      out.writeInt(Magic); out.writeInt(Version)
      out.writeUTF(m.kind)
      out.writeUTF(m.source)
      out.writeInt(m.cfg.nBits); out.writeInt(m.cfg.multiProbe)
      out.writeInt(m.cfg.ivfLists); out.writeInt(m.cfg.ivfProbes)
      out.writeInt(m.cfg.ivfIters); out.writeInt(m.cfg.pqM)
      out.writeInt(m.cfg.pqK)
      out.writeInt(m.dim)
      out.writeBoolean(m.coarse.isDefined)
      m.coarse.foreach(writeMatrix(out, _))
      out.writeBoolean(m.pq.isDefined)
      m.pq.foreach { cbs =>
        out.writeInt(cbs.length)
        cbs.foreach(writeMatrix(out, _))
      }
    } finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** None when absent, corrupt, a different kind, source table, or
    * config than the caller's — all of which mean "rebuild", never
    * "fail". */
  def read(dir: String, kind: String, cfg: AnnConfig,
           source: String): Option[Manifest] =
    try {
      val fs = SegmentStore.fs(dir)
      val p = manifestPath(dir)
      if (!fs.exists(p)) None
      else {
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(fs.open(p), 1 << 16))
        try {
          if (in.readInt() != Magic || in.readInt() != Version) None
          else {
            val k = in.readUTF()
            val src = in.readUTF()
            val c = AnnConfig(in.readInt(), in.readInt(), in.readInt(),
              in.readInt(), in.readInt(), in.readInt(), in.readInt())
            val dim = in.readInt()
            val coarse = if (in.readBoolean()) Some(readMatrix(in)) else None
            val pq = if (in.readBoolean())
              Some(Array.fill(in.readInt())(readMatrix(in))) else None
            if (k != kind || c != cfg || src != source) None
            else Some(Manifest(k, c, src, dim, coarse, pq))
          }
        } finally in.close()
      }
    } catch { case _: Exception => None }
}
