package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt training-data pipeline
  * ops): image/audio payloads as opaque `binary` columns with typed
  * metadata, processed batch-at-a-time in `mapPartitions`.
  *
  * The decode step is a clearly-marked deterministic FAKE (no
  * image/audio codecs exist in this sandbox — builder prompt permits a
  * stub): `fakeDecode` derives "pixels" from the payload bytes. The
  * Spark-side plumbing is real and is what the tests pin down: binary
  * schema, per-partition batch processing, feature schema, and the
  * partition-count-independent determinism of the output.
  *
  * Scale notes: payloads never pass through a groupBy — feature
  * extraction is a narrow mapPartitions; metadata-only queries prune the
  * binary column at the parquet scan (columnar pruning is the whole
  * point of separating `media` from its metadata).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, format: String, width: Int,
                            height: Int, media: Array[Byte])
  /** `feat` is serialized as a JSON array string (not Array[Double]):
    * the driver's rows-compare sorts every output column and arrays are
    * unhashable there — a string column is compare-friendly while
    * keeping the payload lossless and deterministic. */
  final case class MediaFeatures(doc_id: Long, format: String,
                                 n_bytes: Int, mean_byte: Double,
                                 frames: Int, feat: String)

  /** Deterministic synthetic media table derived from documents: payload
    * bytes are a pure function of doc_id (stands in for real image
    * bytes; the plumbing doesn't care). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long")).as[Long]
      .map { id =>
        val r = new graft.corpus.Synth.Rng(graft.corpus.Synth.mix(0x3ED1AL ^ id))
        val fmts = Array("png", "jpeg", "wav")
        val fmt = fmts(r.nextInt(3))
        val w = 8 + r.nextInt(24)
        val h = 8 + r.nextInt(24)
        val bytes = Array.fill((w * h).min(512))(r.nextLong().toByte)
        MediaRow(id, fmt, w, h, bytes)
      }.toDF()
  }

  /** STUB decode (deterministic fake): real deployments swap this for an
    * actual codec; everything around it is production plumbing. */
  def fakeDecode(media: Array[Byte], width: Int, height: Int): Array[Double] = {
    // pretend: 4-bin "histogram" of the payload
    val bins = new Array[Double](4)
    media.foreach(b => bins((b & 0xFF) >> 6) += 1.0)
    bins.map(_ / math.max(1, media.length))
  }

  /** q21: batch feature extraction over the binary column. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .mapPartitions { it =>
        // batch shape: decode partition-at-a-time (the mapInPandas
        // analog); per-element state stays off the driver
        it.map { m =>
          val px = fakeDecode(m.media, m.width, m.height)
          val mean = if (m.media.isEmpty) 0.0
                     else m.media.map(b => (b & 0xFF).toDouble).sum / m.media.length
          val frames = if (m.format == "wav") m.media.length / 64 else 1
          MediaFeatures(m.doc_id, m.format, m.media.length,
            math.rint(mean * 10000) / 10000, frames,
            px.map(v => math.rint(v * 10000) / 10000)
              .mkString("[", ",", "]"))
        }
      }.toDF()
      .orderBy($"doc_id")
  }

  /** Metadata-only projection — exists to prove the binary column is
    * pruned at the scan (checked by plan inspection in the spec). */
  def metaOnly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .groupBy($"format")
      .agg(count(lit(1)).as("cnt"), avg($"width").as("avg_w"))
      .orderBy($"format")
  }
}
