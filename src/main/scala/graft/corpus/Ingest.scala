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

  /** First data line of the first non-hidden file under `dir` — the
    * driver-side O(one record) peek that decides which OPTIONAL columns
    * a json/csv snapshot actually carries (reading them untested would
    * materialize all-null doc_id/ingest_ts columns that defeat every
    * downstream presence check and crash the non-nullable decodes).
    * Crawl dumps are column-homogeneous, so the first record decides
    * for the snapshot (documented contract). */
  private def firstLine(spark: SparkSession, dir: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val it = fs.listFiles(path, true)
    var first: Option[org.apache.hadoop.fs.Path] = None
    while (it.hasNext && first.isEmpty) {
      val st = it.next()
      val n = st.getPath.getName
      if (st.isFile && st.getLen > 0 && !n.startsWith("_") && !n.startsWith("."))
        first = Some(st.getPath)
    }
    first.flatMap { p =>
      val in = fs.open(p)
      try {
        // compressed snapshots (.gz/.bz2/... JSONL is common) must be
        // decoded for the peek exactly as Spark's line reader will
        // decode them — raw bytes would yield garbage keys and silently
        // drop every optional column
        val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(
          spark.sparkContext.hadoopConfiguration).getCodec(p)
        val stream: java.io.InputStream =
          if (codec == null) in else codec.createInputStream(in)
        val br = new java.io.BufferedReader(new java.io.InputStreamReader(
          stream, java.nio.charset.StandardCharsets.UTF_8))
        // closing br closes the codec stream too, which returns the
        // pooled Decompressor (native zlib state) to Hadoop's
        // CodecPool — closing only `in` would leak one per peek
        try Option(br.readLine())
        finally br.close()
      } finally in.close()
    }
  }

  /** Read a snapshot dir; validate required columns exist.
    *
    * `format`: "parquet" (default — the Iceberg-snapshot seam above);
    * "json" reads JSONL, the crawl-dump interchange format; "csv"
    * expects a header row. Non-parquet formats get the hint schema
    * ENFORCED at the scan — schema inference would be a full extra
    * pass over the corpus — plus whichever [[optionalFields]] the
    * snapshot's first record actually carries (a one-record driver
    * peek; enforcing absent optionals would read back all-null columns
    * that silently disable withDocId/ingest_ts derivation downstream).
    * Reads run FAILFAST: one malformed line in a 100 TB drop aborts
    * with the offending record named, instead of PERMISSIVE-nulling a
    * row into the index. CSV headers are validated against the schema
    * (enforceSchema=false + schema built in header order), so a
    * reordered or unknown column fails loudly rather than mis-assigning
    * fields positionally. Everything downstream sees only the
    * DataFrame, so formats are interchangeable per snapshot. */
  def read(spark: SparkSession, dir: String,
           format: String = "parquet"): DataFrame = {
    val df = format match {
      case "parquet" => spark.read.parquet(dir)
      case "json" =>
        val keys: Set[String] = firstLine(spark, dir).map { line =>
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
          val it = node.fieldNames()
          val b = Set.newBuilder[String]
          while (it.hasNext) b += it.next()
          b.result()
        }.getOrElse(Set.empty)
        val present = optionalFields.filter(f => keys.contains(f.name))
        spark.read.option("mode", "FAILFAST")
          .schema(StructType(schema ++ present)).json(dir)
      case "csv" =>
        // multiLine: source-code content embeds newlines, which arrive
        // quoted — without it every such row shears apart. The price is
        // per-FILE parallelism (a multiLine csv file is unsplittable),
        // so csv is the compat path, not the scale path.
        val header = firstLine(spark, dir).getOrElse(
          throw new IllegalArgumentException(s"csv corpus at $dir has no header"))
        val names = header.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        val byName = (schema ++ optionalFields).map(f => f.name -> f).toMap
        val unknown = names.filterNot(byName.contains)
        require(unknown.isEmpty,
          s"csv corpus at $dir has unknown columns: ${unknown.mkString(",")}")
        spark.read.option("header", "true").option("multiLine", "true")
          .option("enforceSchema", "false").option("mode", "FAILFAST")
          .schema(StructType(names.map(byName).toSeq)).csv(dir)
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
