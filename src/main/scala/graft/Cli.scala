package graft

import org.apache.spark.sql.SparkSession

/** `spark-submit` entry point — the user-facing surface of the engine,
  * the analog of running the reference's scripts (SearchEngine's
  * main.py builds from a corpus dir; search_engine.py answers a
  * numbered queries file into a ranked CSV):
  *
  * {{{
  * spark-submit --class graft.Cli graft.jar \
  *   build <corpusDir> <indexDir> [--format parquet|json|csv]
  *         [--partitions N] [--no-sha-verify]
  *   query <indexDir> <queriesFile> <outCsvDir> [--k N] [--driver]
  *   merge <indexOut> <indexPart> <indexPart> [...]
  *   dedup-labels <corpusDir> <outDir>
  * }}}
  *
  * `dedup-labels` materializes the near-dup cluster-label table
  * (doc_id, cluster_id) at a caller-chosen path — the shared artifact
  * every downstream curation decision keys off (clustering report,
  * leakage-safe splits, canonical selection); in-JVM consumers get the
  * same table through [[operators.DupClusters.labels]]'s per-JVM cache,
  * this command is the cross-job persistent form.
  *
  * Cluster-model notes:
  *  - the session comes from `SparkSession.builder().getOrCreate()`
  *    with NO master/size overrides — spark-submit's `--master`,
  *    `--num-executors`, `--conf` own the cluster shape (the north
  *    rule's N vs 4N runs are two submits of this same class);
  *  - `--partitions` sets BOTH the build's posting-shuffle width and
  *    `spark.sql.shuffle.partitions`; when absent, the build defaults
  *    to the session's current shuffle parallelism rather than a
  *    hard-coded constant;
  *  - `query` fans the queries out over executors through
  *    [[query.DistributedRunner]] (broadcast-core, rank-identical to
  *    the driver engine — gated in QuerySurfaceSpec); `--driver`
  *    forces the single-process replay path, the exact reference
  *    behavior, useful on a laptop against a small index.
  */
object Cli {

  private val usageText =
    """usage:
      |  build <corpusDir> <indexDir> [--format parquet|json|csv] [--partitions N] [--no-sha-verify] [--positions]
      |  query <indexDir> <queriesFile> <outCsvDir> [--k N] [--driver] [--mode or|and|phrase]
      |  merge <indexOut> <indexPart> <indexPart> [...]
      |  dedup-labels <corpusDir> <outDir>""".stripMargin

  /** Bad invocation → exception, not sys.exit: run() is test-drivable
    * on a shared session, and main's `finally spark.stop()` must still
    * execute on the usage path. main translates this to exit code 2. */
  private def usage(): Nothing = throw new IllegalArgumentException(usageText)

  /** (flag value | default) from a `--flag value` tail; flags may come
    * in any order after the positional args. A flag present WITHOUT a
    * value (end of args) is a usage error, never a silent default. */
  private def opt(rest: List[String], flag: String): Option[String] =
    rest.dropWhile(_ != flag) match {
      case `flag` :: v :: _ => Some(v)
      case `flag` :: Nil    => usage()
      case _                => None
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("graft").getOrCreate()
    val badUsage =
      try { run(spark, args); false }
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); true
      }
      finally spark.stop()
    if (badUsage) sys.exit(2)
  }

  /** The command dispatch, session-agnostic (tests drive it on the
    * shared local session; main owns the session lifecycle). */
  def run(spark: SparkSession, args: Array[String]): Unit =
    args.toList match {
      case "build" :: corpusDir :: indexDir :: rest =>
        val fmt = opt(rest, "--format").getOrElse("parquet")
        val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
        val parts = opt(rest, "--partitions").map(_.toInt)
          .getOrElse(prevShuffle.toInt)
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        // Scope the override to the build: on spark-submit the session
        // dies with main anyway, but run() is also test-driven on a
        // shared session where a leaked conf would poison later suites.
        val res =
          try {
            val docs = corpus.Ingest.read(spark, corpusDir, fmt)
            index.Build.run(spark, docs, indexDir,
              index.Build.Config(numPartitions = parts,
                verifySha = !rest.contains("--no-sha-verify")))
          } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        // opt-in positional sidecar (phrase queries; PosStore scaladoc)
        if (rest.contains("--positions")) {
          val docs = corpus.Ingest.read(spark, corpusDir, fmt)
          index.Build.buildPosStore(spark, docs, indexDir,
            index.Build.Config(numPartitions = parts))
        }
        // Build.run itself enforces shaViolations == 0; printed here as
        // evidence of the gate, not as a second enforcement point.
        println(s"BUILD_OK docs=${res.nDocs} avgdl=${res.avgdl} " +
          s"postings=${res.totalPostings} shaViolations=${res.shaViolations}")

      case "query" :: indexDir :: queriesFile :: outDir :: rest =>
        val k = opt(rest, "--k").map(_.toInt).getOrElse(250)
        // "or" = ranked disjunctive WAND (default); "and" = conjunctive
        // boolean retrieval (EngineCore.searchConjunctive); "phrase" =
        // exact-adjacency retrieval over the positional sidecar (score
        // column = occurrence count)
        val mode = opt(rest, "--mode").getOrElse("or")
        if (mode != "or" && mode != "and" && mode != "phrase") usage()
        val queries = query.QueryRunner.readQueriesFile(queriesFile)
        if (mode == "phrase" && rest.contains("--driver")) {
          val ps = new query.PhraseSearcher(spark, indexDir)
          try {
            ps.preload(queries.map(_._2)) // one dict read for the batch
            val kc = math.min(k, 2000)
            val rows = queries.flatMap { case (qn, q) =>
              ps.search(q).sortBy { case (id, n, _) => (-n, id) }.take(kc)
                .zipWithIndex.map { case ((id, n, _), i) =>
                  (qn, id, i + 1, n.toDouble) }
            }
            query.QueryRunner.writeCsv(spark, rows, outDir)
          } finally ps.close()
        } else if (rest.contains("--driver")) {
          val engine = new query.Engine(spark, indexDir)
          try {
            val rows = query.QueryRunner.run(engine, queries, k, mode = mode)
            query.QueryRunner.writeCsv(spark, rows, outDir)
          } finally engine.close()
        } else {
          import spark.implicits._
          val qdf = queries.toDF("query_num", "query")
          val res =
            if (mode == "phrase")
              query.DistributedRunner.runPhrase(spark, indexDir, qdf, k)
            else query.DistributedRunner.run(spark, indexDir, qdf, k, mode = mode)
          res.coalesce(1).write.mode("overwrite")
            .option("header", "true").csv(outDir)
        }
        println(s"QUERY_OK queries=${queries.size} out=$outDir")

      case "merge" :: outDir :: parts if parts.size >= 2 =>
        index.Merge.disjoint(spark, parts, outDir)
        println(s"MERGE_OK parts=${parts.size} out=$outDir")

      case "dedup-labels" :: corpusDir :: outDir :: Nil =>
        operators.DupClusters.computeLabels(spark, corpusDir)
          .write.mode("overwrite").parquet(outDir)
        println(s"LABELS_OK out=$outDir")

      case _ => usage()
    }
}
