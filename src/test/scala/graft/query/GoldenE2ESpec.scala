package graft.query

import graft.SparkSpec
import graft.corpus.Synth
import graft.index.Build

/** End-to-end golden replay (SURVEY §5 item 4): fixture corpus +
  * reference-format queries.txt → (query_num, doc_id, rank, score) rows
  * compared against a committed golden. Regenerate explicitly with
  * GRAFT_REGEN_GOLDEN=1 after an intentional semantic change — the diff
  * then documents the change in review. */
class GoldenE2ESpec extends SparkSpec {

  private val goldenPath = "src/test/resources/golden_e2e.csv"

  private val queriesText = Seq(
    "1. the license apache",
    "2. getUserConfig parse_query_string",
    "3. 15600 covid-19",
    "4. zzznotaword",
    "5. import return if the")

  test("fixture corpus + queries.txt replay matches the committed golden") {
    val corpusDir = tmpDir("golden-corpus")
    Synth.write(spark, 200, corpusDir)
    val idx = tmpDir("golden-idx")
    Build.run(spark, spark.read.parquet(s"$corpusDir/snapshot-0"), idx,
      Build.Config(numPartitions = 4, nSalts = 2, saltDfThreshold = 40))
    val eng = new Engine(spark, idx, preload = true)
    val rows = QueryRunner.run(eng,
      QueryRunner.parseQueries(queriesText), k = 20)
    eng.close()
    val got = rows.map { case (q, id, r, s) =>
      f"$q,$id,$r,${math.rint(s * 1e6) / 1e6}%s" }
    val goldenFile = new java.io.File(goldenPath)
    if (!goldenFile.exists() || sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.write(goldenFile.toPath,
        got.mkString("\n").getBytes("UTF-8"))
      info(s"golden (re)generated at $goldenPath — commit it")
    } else {
      val want = scala.io.Source.fromFile(goldenFile).getLines().toSeq
      assert(got == want,
        s"e2e drift vs golden (first diff: ${got.zipAll(want, "<none>", "<none>")
          .find(p => p._1 != p._2)})")
    }
  }
}
