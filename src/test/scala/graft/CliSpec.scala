package graft

import graft.corpus.Synth
import graft.query.{Engine, QueryRunner}

/** End-to-end spec for the spark-submit CLI surface: `build` over a
  * synth corpus snapshot, `query` through BOTH the distributed and
  * driver paths, `merge` of two disjoint CLI-built indexes — all
  * rank-identical to the directly-driven engine on the same index. */
class CliSpec extends SparkSpec {

  private val queriesText = Seq(
    "1. the license apache",
    "2. getUserConfig parse_query_string",
    "3. import return if the")

  private def writeQueries(dir: String): String = {
    val f = s"$dir/queries.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      queriesText.mkString("\n").getBytes("UTF-8"))
    f
  }

  private def readCsv(outDir: String): Seq[(Int, Long, Int, Double)] = {
    import spark.implicits._
    spark.read.option("header", "true").csv(outDir)
      .select($"query_num".cast("int"), $"doc_id".cast("long"),
        $"rank".cast("int"), $"score".cast("double"))
      .as[(Int, Long, Int, Double)].collect().toSeq
      .sortBy(r => (r._1, r._3))
  }

  test("cli bad invocations throw (no sys.exit) and never leak session conf") {
    // unknown subcommand and flag-without-value both raise
    // IllegalArgumentException — run() must be safe to drive from a
    // shared test JVM, so it never calls sys.exit itself
    intercept[IllegalArgumentException] {
      Cli.run(spark, Array("frobnicate", "a", "b"))
    }
    intercept[IllegalArgumentException] {
      Cli.run(spark, Array("build", "a", "b", "--partitions"))
    }
    intercept[IllegalArgumentException] {
      Cli.run(spark, Array("query", "a", "b", "c", "--k"))
    }
    // --partitions must not permanently mutate the shared session's
    // shuffle parallelism (later suites assert plan shapes against it)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val corpusDir = tmpDir("cli-conf-corpus")
    Synth.write(spark, 40, corpusDir)
    Cli.run(spark, Array("build", s"$corpusDir/snapshot-0",
      tmpDir("cli-conf-idx"), "--partitions", "3"))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "cli build leaked spark.sql.shuffle.partitions into the session")
  }

  test("cli build + query (distributed and --driver) are rank-identical to the direct engine") {
    val corpusDir = tmpDir("cli-corpus")
    Synth.write(spark, 150, corpusDir)
    val idx = tmpDir("cli-idx")
    Cli.run(spark, Array("build", s"$corpusDir/snapshot-0", idx,
      "--partitions", "4"))

    val qFile = writeQueries(tmpDir("cli-q"))
    val outDist = tmpDir("cli-out-dist")
    Cli.run(spark, Array("query", idx, qFile, outDist, "--k", "20"))
    val outDrv = tmpDir("cli-out-drv")
    Cli.run(spark, Array("query", idx, qFile, outDrv, "--k", "20",
      "--driver"))

    val eng = new Engine(spark, idx)
    val want = try QueryRunner.run(eng,
      QueryRunner.parseQueries(queriesText), k = 20)
    finally eng.close()
    val wantSorted = want.sortBy(r => (r._1, r._3))

    assert(readCsv(outDist) == wantSorted, "distributed CLI path drifted")
    assert(readCsv(outDrv) == wantSorted, "driver CLI path drifted")
    assert(wantSorted.nonEmpty && wantSorted.exists(_._1 == 1))
  }

  test("cli merge of two disjoint CLI-built indexes answers like a single build over the union") {
    import org.apache.spark.sql.functions._
    val corpusDir = tmpDir("cli-m-corpus")
    Synth.write(spark, 120, corpusDir)
    val docs = spark.read.parquet(s"$corpusDir/snapshot-0")
    val docsId = graft.corpus.Ingest.withDocId(docs)
    // split the corpus into two id-disjoint halves, write each as a
    // corpus dir, CLI-build each, CLI-merge
    val med = docsId.stat.approxQuantile("doc_id", Array(0.5), 0.0)(0).toLong
    val dirA = tmpDir("cli-m-a"); val dirB = tmpDir("cli-m-b")
    docsId.filter(col("doc_id") <= med).write.mode("overwrite").parquet(dirA)
    docsId.filter(col("doc_id") > med).write.mode("overwrite").parquet(dirB)
    val idxA = tmpDir("cli-m-idxa"); val idxB = tmpDir("cli-m-idxb")
    Cli.run(spark, Array("build", dirA, idxA, "--partitions", "4"))
    Cli.run(spark, Array("build", dirB, idxB, "--partitions", "4"))
    val merged = tmpDir("cli-m-merged") + "/idx"
    Cli.run(spark, Array("merge", merged, idxA, idxB))

    val qFile = writeQueries(tmpDir("cli-m-q"))
    val out = tmpDir("cli-m-out")
    Cli.run(spark, Array("query", merged, qFile, out, "--k", "20"))

    // oracle: one build over the whole corpus, same queries
    val idxAll = tmpDir("cli-m-idxall")
    Cli.run(spark, Array("build", s"$corpusDir/snapshot-0", idxAll,
      "--partitions", "4"))
    val eng = new Engine(spark, idxAll)
    val want = try QueryRunner.run(eng,
      QueryRunner.parseQueries(queriesText), k = 20)
    finally eng.close()
    assert(readCsv(out).map(r => (r._1, r._2, r._3)) ==
      want.sortBy(r => (r._1, r._3)).map(r => (r._1, r._2, r._3)),
      "merged-index CLI ranking drifted from the single-build oracle")
  }

  test("cli dedup-labels persists the label table at a caller-chosen path") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir("cli-labels-out")
    Cli.run(spark, Array("dedup-labels", dir, out))
    val persisted = spark.read.parquet(out)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val inJvm = graft.operators.DupClusters.labels(spark, dir)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(persisted == inJvm,
      "persisted label table diverged from the in-JVM artifact")
    assert(persisted.nonEmpty)
  }
}
