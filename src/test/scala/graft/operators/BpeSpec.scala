package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for q61, the distributed BPE trainer: exactness against an
  * in-memory from-first-principles replay on real data, a
  * hand-verifiable planted corpus, and bit-identical retraining. */
class BpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Reference BPE, straight from the Sennrich formulation, sharing
    * only the greedy applyMerge kernel with the operator. */
  private def refBpe(words: Map[String, Long], n: Int)
      : Seq[(Int, String, String, Long)] = {
    var tbl: Seq[(Array[String], Long)] =
      words.toSeq.map { case (w, c) =>
        (w.map(_.toString).toArray :+ BpeTrainer.EndMark, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    var stop = false
    while (round < n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= BpeTrainer.MinPairCount =>
          out += ((round + 1, l, r, c))
          tbl = tbl.map { case (syms, cc) =>
            (BpeTrainer.applyMerge(syms, l, r), cc) }
          round += 1
        case _ => stop = true
      }
    }
    out.toSeq
  }

  private def wordCounts(d: String): Map[String, Long] = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(lower($"text"), "\\s+")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
  }

  test("q61 learned merge table equals the from-first-principles replay on real data") {
    val got = BpeTrainer.train(spark, dir, numMerges = 15)
    val expected = refBpe(wordCounts(dir), 15)
    assert(got == expected)
    assert(got.size == 15, "sf0.001 must support 15 head merges")
    assert(got.map(_._1) == (1 to 15), "ranks are consecutive")
  }

  test("q61 planted corpus: merges are the hand-derivable sequence") {
    import spark.implicits._
    val pdir = tmpDir("bpe-planted")
    Seq((1L, "ab ab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$pdir/documents.parquet")
    val got = BpeTrainer.train(spark, pdir)
    // word "ab" x3 -> pairs (a,b):3 and (b,</w>):3 tie; lexical tiebreak
    // picks (a,b); then (ab,</w>):3; then a single symbol remains.
    assert(got == Seq((1, "a", "b", 3L), (2, "ab", BpeTrainer.EndMark, 3L)))
  }

  test("q61 applyMerge is greedy left-to-right (the reference BPE behavior)") {
    assert(BpeTrainer.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(BpeTrainer.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
    assert(BpeTrainer.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("q61 training is deterministic across runs") {
    val a = BpeTrainer.train(spark, dir, numMerges = 8)
    val b = BpeTrainer.train(spark, dir, numMerges = 8)
    assert(a == b)
  }

  test("q61 full default run stays flat-cost per round (lineage truncation)") {
    // regression gate for the plan blow-up the first cut hit: persist-
    // only generation chaining made round ~25+ cost MINUTES of driver
    // plan bookkeeping (each cached plan embedded its predecessor's).
    // With per-round checkpoint truncation the full default run is
    // seconds; the generous bound still fails the quadratic regime.
    val t0 = System.nanoTime()
    val got = BpeTrainer.train(spark, dir)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.nonEmpty)
    assert(secs < 120.0, f"default ${BpeTrainer.NumMerges}-round train took $secs%.1f s")
  }
}
