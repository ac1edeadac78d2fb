package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingest: schema validation, per-row sha256 invariant, doc_id
  * assignment. The read seam is `spark.read.parquet` over an
  * Iceberg-compatible snapshot layout (SURVEY.md §7.6 — swap to
  * `format("iceberg")` where the runtime jar exists; everything
  * downstream sees only the DataFrame schema).
  *
  * Replaces the reference's recursive directory walk + pandas
  * materialization (reference reader.py:9-30) with a columnar,
  * partition-parallel scan — nothing is collected to the driver.
  */
object Ingest {

  /** The BASELINE.json input_hint schema. */
  val schema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = false)))

  /** Read a snapshot dir; validate required columns exist. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(dir)
    val missing = schema.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty, s"corpus at $dir missing columns: ${missing.mkString(",")}")
    df
  }

  /** Per-row ingest invariant (north rule): recomputed sha2(content, 256)
    * equals the stored content_sha256. Returns violating rows — empty is
    * the pass condition; the build records the count per partition. */
  def shaViolations(docs: DataFrame): DataFrame =
    docs.filter(col("content_sha256").isNotNull &&
      sha2(col("content"), 256) =!= col("content_sha256"))
      .select("repo", "path", "commit")

  /** Ensure a deterministic non-negative doc_id. If the table carries
    * one (synth does), keep it; otherwise derive a stable id from the
    * natural key — xxhash64 over (repo, path, commit), sign bit masked
    * off (varbyte block encoding requires non-negative ids and writes a
    * block's first docId absolute). The masked 63-bit id space is
    * collision-checked at build time rather than using zipWithIndex (a
    * full-scan barrier at 10^12 rows). */
  def withDocId(docs: DataFrame): DataFrame =
    if (docs.columns.contains("doc_id")) docs
    else docs.withColumn("doc_id",
      xxhash64(col("repo"), col("path"), col("commit"))
        .bitwiseAND(lit(Long.MaxValue)))
}
