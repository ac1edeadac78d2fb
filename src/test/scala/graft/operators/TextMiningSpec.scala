package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the round-5 text-mining operators: q57 positional phrase
  * match and q59 PMI collocations — exact driver-side replays of each
  * operator's math on real test data plus the plan shapes that make
  * them scale. */
class TextMiningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def toksOf(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def docTokens(): Map[Long, Array[String]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> toksOf(t) }.toMap
  }

  // ---- q57 phrase match --------------------------------------------------

  test("q57 phrase match equals a brute-force sliding-window scan") {
    import spark.implicits._
    val phrase = TextRelational.PhraseTerms.toArray
    val expected = docTokens().flatMap { case (id, toks) =>
      val hits = (0 to toks.length - phrase.length).filter(i =>
        phrase.indices.forall(j => toks(i + j) == phrase(j)))
      if (hits.isEmpty) None
      else Some((id, hits.size.toLong, hits.min.toLong))
    }.toSet
    val got = TextRelational.phraseMatch(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture phrase must occur in the test corpus")
  }

  test("q57 plan: no join — the phrase k-gram stream dies at the scan stage") {
    val plan = TextRelational.phraseMatch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"phrase match must be scan→generate→filter→agg, no join:\n$plan")
  }

  // ---- q59 PMI collocations ----------------------------------------------

  /** Exact replay of the PMI math with the same double expression tree. */
  private def pmiExpected(): Seq[(String, String, Long, Long, Long, Double)] = {
    val docs = docTokens().values.toSeq
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    var nBi = 0L
    docs.foreach { toks =>
      toks.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      if (toks.length >= 2) {
        nBi += toks.length - 1
        toks.sliding(2).foreach { w =>
          val k = (w(0), w(1)); bi(k) = bi.getOrElse(k, 0L) + 1
        }
      }
    }
    val nUni = uni.values.sum
    bi.toSeq
      .filter(_._2 >= TextRelational.PmiMinCount)
      .map { case ((x, y), cxy) =>
        val raw = math.log((cxy.toDouble * nUni * nUni) /
          (nBi.toDouble * uni(x) * uni(y)))
        val pmi = BigDecimal(raw)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (x, y, cxy, uni(x), uni(y), pmi)
      }
      .sortBy { case (x, y, _, _, _, pmi) => (-pmi, x, y) }
      .take(TextRelational.PmiTopK)
  }

  test("q59 PMI equals an exact driver-side replay (values AND order)") {
    import spark.implicits._
    val got = TextRelational.pmiCollocations(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val expected = pmiExpected()
    assert(got.size == expected.size)
    // exact tuple identity — same counts, same rounded PMI
    assert(got.toSet == expected.toSet)
    // presentation order: pmi desc, then (x, y); rows tied on all three
    // sort keys are identical rows, so sequence equality must hold
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 must yield collocations above the count floor")
  }

  test("q59 plan: unigram joins broadcast; top-k is TakeOrdered, not a global sort") {
    val plan = TextRelational.pmiCollocations(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab-sized unigram tables must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join should survive for vocab-sized sides:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject:\n$plan")
  }
}
