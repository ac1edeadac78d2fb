package graft.operators

import graft.SparkSpec

/** q33 reference-model scoring: planted-fixture semantics (a reference
  * doc covers itself; gibberish scores zero; a half-familiar doc lands
  * exactly between) plus whole-fixture invariants. The DuckDB oracle
  * (q33 in CORRECTNESS) pins the full computation independently. */
class LmScoreSpec extends SparkSpec {

  private def score(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Double, Double)] = {
    import spark.implicits._
    val dir = tmpDir("graft-lm")
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    LmScore.trigramNovelty(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("planted fixture: self-coverage, gibberish, half-familiar, short-doc drop") {
    // doc 0 (ref, doc_id%5==0): trains the model
    // doc 1: identical text -> coverage 1.0, familiarity == model count
    // doc 2: unique gibberish -> coverage 0.0, familiarity 0.0
    // doc 3: 4 tokens = 2 trigrams, one from doc 0, one novel -> 0.5
    // doc 4: two tokens -> no trigrams, dropped from output
    val out = score(Seq(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma delta",
      2L -> "zig zag zog zug",
      3L -> "alpha beta gamma zuul",
      4L -> "too short"))
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    // doc 0: 2 trigrams (abg, bgd), each once in the model
    assert(out(0L) == ((2L, 2L, 1.0, 1.0)), s"ref self-coverage: ${out(0L)}")
    assert(out(1L) == ((2L, 2L, 1.0, 1.0)), s"duplicate of ref: ${out(1L)}")
    assert(out(2L) == ((2L, 0L, 0.0, 0.0)), s"gibberish: ${out(2L)}")
    assert(out(3L) == ((2L, 1L, 0.5, 0.5)), s"half-familiar: ${out(3L)}")
  }

  test("repeated reference trigram raises familiarity above coverage") {
    // model doc repeats "a b c" three times -> mc("a b c") counts every
    // occurrence of the trigram in the reference STREAM (an LM counts
    // occurrences, not the distinct set)
    val out = score(Seq(
      0L -> "a b c a b c a b c", // trigrams: abc,bca,cab,abc,bca,cab,abc
      7L -> "a b c x"))          // abc (known, mc=3), bcx (novel)
    assert(out(7L)._1 == 2 && out(7L)._2 == 1)
    assert(out(7L)._3 == 0.5, s"coverage: ${out(7L)}")
    assert(out(7L)._4 == 1.5, s"familiarity = (3+0)/2: ${out(7L)}")
  }

  test("fixture corpus invariants: ref docs self-cover, bounds hold") {
    import spark.implicits._
    val out = LmScore.trigramNovelty(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nTg, known, cov, fam) =>
      assert(known <= nTg, s"doc $id: known > n_tg")
      assert(cov >= 0 && cov <= 1, s"doc $id: coverage $cov")
      assert(fam >= cov - 1e-9, s"doc $id: familiarity $fam < coverage $cov")
      if (id % LmScore.RefMod == 0)
        assert(cov == 1.0, s"reference doc $id must self-cover, got $cov")
    }
    // the score separates: not every non-ref doc is fully covered
    assert(out.exists { case (id, _, _, cov, _) => id % LmScore.RefMod != 0 && cov < 1.0 },
      "fixture gives no separation — every doc fully covered")
  }

  test("q37 ccnet selection == independent sort-based terciles + md5 keep predicate") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val scores = LmScore.trigramNovelty(spark, dir)
      .select($"doc_id", $"coverage").as[(Long, Double)].collect()
    // independent threshold formulation: FULL SORT of the per-doc
    // scores (the operator uses the histogram-cumulative form precisely
    // to avoid this sort at scale; at test scale the sort IS the oracle)
    val sorted = scores.map(_._2).sorted
    val n = sorted.length
    val t1 = sorted(((n + 2) / 3 - 1).toInt)
    val t2 = sorted(((2 * n + 2) / 3 - 1).toInt)
    assert(t1 <= t2)
    def uHex(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-ccnet-$id".getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val expected = scores.flatMap { case (id, cov) =>
      val bucket =
        if (cov <= t1) "tail" else if (cov <= t2) "middle" else "head"
      val keep = bucket match {
        case "head"   => true
        case "middle" => uHex(id) < "80000000"
        case "tail"   => uHex(id) < "40000000"
      }
      if (keep) Some(id -> bucket) else None
    }.toMap
    val got = LmScore.noveltySelect(spark, dir)
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(got == expected,
      s"selection mismatch: extra=${got.toSet.diff(expected.toSet)} " +
        s"missing=${expected.toSet.diff(got.toSet)}")
    // all three buckets must be populated for the test to mean anything
    assert(got.values.toSet == Set("head", "middle", "tail"),
      s"fixture exercises ${got.values.toSet} only")
    // tercile bound: the tail holds at least ceil(n/3) of the CORPUS
    val tailAll = scores.count(_._2 <= t1)
    assert(tailAll >= (n + 2) / 3)
  }
}
