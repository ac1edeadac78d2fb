package graft.index

import graft.SparkSpec
import graft.analysis.Tokenizer
import graft.corpus.Synth
import graft.query.Engine

/** Metadata-only snapshot merge: merged index must answer queries
  * rank-identically to a full rebuild over the union, and WAND must
  * stay exact under the inflated (bound_scale) block maxes. */
class MergeSpec extends SparkSpec {

  test("disjoint merge == full rebuild; WAND stays rank-identical under scaled bounds") {
    import spark.implicits._
    // two snapshots with deliberately different avgdl (bound_scale > 1)
    val docsA = (0L until 120L).map(i =>
      (i, Synth.content(i).linesIterator.take(8).mkString(" ")))
      .toDF("doc_id", "content")
    val docsB = (200L until 320L).map(i =>
      (i, Synth.content(i))).toDF("doc_id", "content")

    def build(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val d = tmpDir(name)
      Build.run(spark, df, d, Build.Config(numPartitions = 4, nSalts = 2,
        saltDfThreshold = 60, verifySha = false))
      d
    }
    val idxA = build(docsA, "merge-a")
    val idxB = build(docsB, "merge-b")
    val idxFull = build(docsA.unionByName(docsB), "merge-full")
    val merged = tmpDir("merge-out")
    Merge.disjoint(spark, Seq(idxA, idxB), merged)

    val engM = new Engine(spark, merged, preload = true)
    val engF = new Engine(spark, idxFull, preload = true)
    assert(engM.nDocs == engF.nDocs)
    assert(math.abs(engM.avgdl - engF.avgdl) < 1e-9)
    assert(engM.boundScale > 1.0, "fixture should exercise bound inflation")

    val queries = Seq("the", "if return", "license apache the", "import",
      "the if return import license apache")
    for (q <- queries; k <- Seq(3, 25, 200)) {
      // WAND exactness on the merged index (inflated bounds)
      val wandM = engM.searchWand(q, k)
      assert(wandM.toSeq == engM.searchExhaustive(q, k).toSeq,
        s"merged WAND != merged exhaustive: q=$q k=$k")
      // merged results == full-rebuild results (scores to float noise)
      val full = engF.searchWand(q, k)
      assert(wandM.map(_._1).toSeq == full.map(_._1).toSeq,
        s"merged ids != rebuild ids: q=$q k=$k")
      wandM.zip(full).foreach { case ((_, sm), (_, sf)) =>
        assert(math.abs(sm - sf) < 1e-9)
      }
    }
    engM.close(); engF.close()
  }

  test("overlapping docId ranges are rejected") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, "alpha beta")).toDF("doc_id", "content")
    val a = tmpDir("ov-a"); val b = tmpDir("ov-b"); val o = tmpDir("ov-out")
    Build.run(spark, docs, a, Build.Config(numPartitions = 2,
      verifySha = false, tokenizer = Tokenizer.plainCfg))
    Build.run(spark, docs, b, Build.Config(numPartitions = 2,
      verifySha = false, tokenizer = Tokenizer.plainCfg))
    assertThrows[IllegalArgumentException](
      Merge.disjoint(spark, Seq(a, b), o))
  }
}
