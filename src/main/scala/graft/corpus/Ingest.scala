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

  /** Optional columns a snapshot MAY carry beyond the hint schema: a
    * pre-assigned id, the sha256 ingest-invariant echo, and the recency
    * timestamp. Enforced-schema reads (json/csv below) must name them
    * or the scan would silently drop them. */
  val optionalFields: Seq[StructField] = Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("content_sha256", StringType, nullable = true),
    StructField("ingest_ts", LongType, nullable = true))

  /** Read a snapshot dir; validate required columns exist.
    *
    * `format`: "parquet" (default — the Iceberg-snapshot seam above);
    * "json" reads JSONL, the crawl-dump interchange format; "csv"
    * expects a header row. Non-parquet formats get the hint schema
    * (plus [[optionalFields]]) ENFORCED at the scan — schema inference
    * would be a full extra pass over the corpus, and a 100 TB JSONL
    * drop with one malformed shard must fail loudly per row
    * (PERMISSIVE nulls on required columns are rejected by the
    * null-content filter downstream) rather than re-type a column.
    * Everything downstream sees only the DataFrame, so formats are
    * interchangeable per snapshot. */
  def read(spark: SparkSession, dir: String,
           format: String = "parquet"): DataFrame = {
    val df = format match {
      case "parquet" => spark.read.parquet(dir)
      case "json" =>
        spark.read.schema(StructType(schema ++ optionalFields)).json(dir)
      case "csv" =>
        // multiLine: source-code content embeds newlines, which arrive
        // quoted — without it every such row shears apart. The price is
        // per-FILE parallelism (a multiLine csv file is unsplittable),
        // so csv is the compat path, not the scale path.
        spark.read.option("header", "true").option("multiLine", "true")
          .schema(StructType(schema ++ optionalFields)).csv(dir)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported corpus format: $other (parquet | json | csv)")
    }
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
