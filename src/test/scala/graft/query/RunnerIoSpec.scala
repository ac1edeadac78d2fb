package graft.query

import graft.SparkSpec
import graft.analysis.Tokenizer
import graft.index.Build

/** IO paths of the query surface: queries file on disk, CSV results
  * sink, and the preload=false (per-query pushdown scan) engine path. */
class RunnerIoSpec extends SparkSpec {

  test("readQueriesFile parses a real file in the reference format") {
    val f = java.nio.file.Files.createTempFile("queries", ".txt")
    java.nio.file.Files.write(f,
      "1. alpha beta\n\n2. gamma\n".getBytes("UTF-8"))
    assert(QueryRunner.readQueriesFile(f.toString) ==
      Seq((1, "alpha beta"), (2, "gamma")))
  }

  test("writeCsv produces a readable header'd CSV of ranked results") {
    val out = tmpDir("runner-csv")
    QueryRunner.writeCsv(spark,
      Seq((1, 10L, 1, 2.5), (1, 11L, 2, 1.5)), s"$out/results")
    val back = spark.read.option("header", "true").csv(s"$out/results")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.toSet == Set(("1", "10", "1"), ("1", "11", "2")))
  }

  test("preload=false engine path (per-query pushdown scans) matches preload=true") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha"), (1L, "beta gamma"), (2L, "alpha gamma gamma")
    ).toDF("doc_id", "content")
    val idx = tmpDir("runner-noPreload")
    Build.run(spark, docs, idx, Build.Config(numPartitions = 2,
      verifySha = false, tokenizer = Tokenizer.plainCfg))
    val hot = new Engine(spark, idx, Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    val cold = new Engine(spark, idx, Tokenizer.plainCfg,
      pruneSingletons = false, preload = false)
    for (q <- Seq("alpha", "beta gamma", "alpha beta gamma", "nothere")) {
      assert(cold.searchWand(q, 10).toSeq == hot.searchWand(q, 10).toSeq, q)
    }
    hot.close(); cold.close()
  }
}
