package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the round-5 retrieval/selection operators (q50-q54): exact
  * driver-side replays of each operator's math on real test data, the
  * conjunctive engine path's semantics against ground truth, and the
  * plan shapes that make them scale. */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def toksOf(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def round(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docTokens(): Map[Long, Array[String]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> toksOf(t) }.toMap
  }

  // ---- q50 chunking ------------------------------------------------------

  test("q50 chunks tile every document: start grid, clamped last window, full coverage") {
    import spark.implicits._
    val w = Assembly.ChunkWindow
    val s = Assembly.ChunkStride
    val docs = docTokens()
    val chunks = Assembly.chunkOverlap(spark, dir)
      .select($"doc_id", $"chunk_id", $"chunk_start", $"n_tokens", $"chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    assert(chunks.keySet == docs.filter(_._2.nonEmpty).keySet)
    chunks.foreach { case (id, cs) =>
      val n = docs(id).length.toLong
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until ((n - 1) / s + 1)).toSeq,
        s"doc $id chunk ids not the full grid")
      sorted.foreach { case (_, ci, start, nt, text) =>
        assert(start == ci * s)
        assert(nt == math.min(w.toLong, n - start), s"doc $id chunk $ci width")
        // the chunk text IS the token slice, rejoined
        assert(text == docs(id).slice(start.toInt, (start + nt).toInt).mkString(" "))
      }
      // coverage: last chunk ends at n, so every token is in >=1 chunk
      val last = sorted.last
      assert(last._3 + last._4 == n, s"doc $id tail tokens uncovered")
    }
  }

  test("q50 chunking is map-side only: no hash-partition exchange anywhere") {
    val p = Assembly.chunkOverlap(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"chunking grew a shuffle:\n${p.take(800)}")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan reads more than (doc_id, text)")
  }

  // ---- q51 TF-IDF keywords ----------------------------------------------

  test("q51 keywords == exact driver replay of tf-idf top-3 per doc") {
    import spark.implicits._
    val docs = docTokens().filter(_._2.nonEmpty)
    val tf = docs.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.length.toLong) } }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val n = docs.size.toLong
    val expect = tf.groupBy(_._1).flatMap { case (id, rows) =>
      rows.map { case (_, t, f) =>
        (id, t, f, df(t), round(f * math.log((n + 1.0) / (df(t) + 1.0)), 4)) }
        .sortBy { case (_, t, _, _, sc) => (-sc, t) }
        .take(TextRelational.KeywordsPerDoc)
        .zipWithIndex.map { case ((i, t, f, d, sc), rk) => (i, t, f, d, sc, rk + 1) }
    }.toSet
    val got = TextRelational.tfidfKeywords(spark, dir)
      .as[(Long, String, Long, Long, Double, Int)].collect().toSet
    assert(got == expect)
  }

  test("q51 plan: per-doc window is PARTITIONED (never a global sort) and tf agg is partial") {
    val p = TextRelational.tfidfKeywords(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(doc_id"),
      s"keyword window lost its doc_id partitioning:\n${p.take(800)}")
    assert(p.contains("partial_count"), "tf aggregation is not map-side partial")
  }

  // ---- q52 DSIR selection -------------------------------------------------

  test("q52 DSIR margin == integer replay; kept iff margin > 0; bigram totals conserved") {
    import spark.implicits._
    val b = LmScore.DsirBuckets
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Int = {
      val h = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (h.charAt(0).toInt * 13 + h.charAt(1).toInt) % b
    }
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val grams = rows.map { case (id, lang, t) =>
      val ts = toksOf(t)
      (id, lang, ts.sliding(2).filter(_.length == 2)
        .map(p => bucket(p(0) + " " + p(1))).toArray)
    }.filter(_._3.nonEmpty)
    val cor = Array.fill(b)(0L); val tgt = Array.fill(b)(0L)
    grams.foreach { case (_, lang, bs) =>
      bs.foreach { k => cor(k) += 1; if (lang == "en") tgt(k) += 1 } }
    val corTot = cor.sum; val tgtTot = tgt.sum
    val sgn = Array.tabulate(b)(k =>
      if ((tgt(k) + 1) * (corTot + b) > (cor(k) + 1) * (tgtTot + b)) 1L else -1L)
    val expect = grams.map { case (id, _, bs) =>
      id -> ((bs.length.toLong, bs.map(sgn(_)).sum)) }.toMap
    val got = LmScore.dsirSelect(spark, dir)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.map(_._1).toSet == expect.keySet)
    got.foreach { case (id, nb, margin, kept) =>
      assert((nb, margin) == expect(id), s"doc $id")
      assert(kept == (if (margin > 0) 1 else 0))
    }
    // the selection is non-degenerate on the real table: both sides occur
    assert(got.exists(_._4 == 1) && got.exists(_._4 == 0),
      "DSIR selection is degenerate on sf0.001 (all kept or all dropped)")
  }

  test("q52 plan: sign table joins back via an explicit broadcast; counts partial-aggregate") {
    val df = LmScore.dsirSelect(spark, dir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("strategy=broadcast"), "sign-table broadcast hint lost")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "per-(doc,bucket) counts are not map-side partial")
  }

  // ---- q53 hybrid RRF ------------------------------------------------------

  test("q53 fused ranking == exact replay from the two top-50 lists") {
    import spark.implicits._
    val c = Retrieval.RrfC
    val bm = TextRelational.bm25TopK(spark, dir, k = Retrieval.FuseDepth)
      .as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val cos = Similarity.annBruteForce(spark, dir, k = Retrieval.FuseDepth)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val expect = (bm.keySet ++ cos.keySet).toSeq.map { id =>
      val r = bm.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0) +
        cos.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0)
      (id, bm.getOrElse(id, 0), cos.getOrElse(id, 0), round(r, 6))
    }.sortBy { case (id, _, _, r) => (-r, id) }.take(Retrieval.K)
    val got = Retrieval.hybridRrf(spark, dir)
      .as[(Long, Int, Int, Double)].collect().toSeq
    assert(got == expect)
    // fusion is real on this data: the fused list draws from both sides
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0),
      "one retriever contributed nothing — fixture no longer exercises fusion")
  }

  // ---- q54 conjunctive engine ---------------------------------------------

  test("q54 engine conjunctive == relational boolean-AND on real data") {
    import spark.implicits._
    val eng = IndexOps.booleanAnd(spark, dir).as[(Long, Double)].collect().toSeq
    val rel = TextRelational.booleanAnd(spark, dir).as[(Long, Double)].collect().toSeq
    assert(eng == rel)
    assert(eng.nonEmpty, "conjunctive fixture matches nothing at sf0.001")
  }

  test("conjunctive search: intersection semantics, exhaustive-score identity, AND-strictness") {
    import spark.implicits._
    val docsRaw = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "alpha beta gamma beta"), (4L, "delta epsilon"), (5L, "alpha gamma"))
    val docs = docsRaw.toDF("doc_id", "content")
    val idx = tmpDir("graft-conj-idx")
    graft.index.Build.run(spark, docs, idx, graft.index.Build.Config(
      numPartitions = 2, verifySha = false,
      tokenizer = graft.analysis.Tokenizer.plainCfg))
    val eng = new graft.query.Engine(spark, idx, graft.analysis.Tokenizer.plainCfg,
      pruneSingletons = false, preload = true)
    try {
      val conj = eng.searchConjunctive("alpha beta", 10).toMap
      val expectIds = docsRaw.filter { case (_, t) =>
        val ts = t.split(" ").toSet; ts("alpha") && ts("beta") }.map(_._1).toSet
      assert(conj.keySet == expectIds)
      // scores are the SAME BM25 the disjunctive paths compute
      val exh = eng.searchExhaustive("alpha beta", 10).toMap
      conj.foreach { case (id, s) => assert(s == exh(id), s"doc $id score") }
      // strict AND: an unresolvable token empties the result (no
      // best-effort fallback to the resolvable subset)
      assert(eng.searchConjunctive("alpha zzqqzzqq", 10).isEmpty)
      // and the intersection is a strict subset of the union here
      assert(conj.keySet.subsetOf(exh.keySet) && conj.size < exh.size)
    } finally eng.close()
  }

  test("--mode and: distributed runner == driver runner == engine, per query") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "alpha beta gamma beta"), (4L, "delta epsilon"))
      .toDF("doc_id", "content")
    val idx = tmpDir("graft-conj-dist-idx")
    graft.index.Build.run(spark, docs, idx, graft.index.Build.Config(
      numPartitions = 2, verifySha = false,
      tokenizer = graft.analysis.Tokenizer.plainCfg))
    val qs = Seq((1, "alpha beta"), (2, "beta gamma"), (3, "alpha zzqq"))
    val dist = graft.query.DistributedRunner.run(spark, idx,
        qs.toDF("query_num", "query"), k = 10,
        tokCfg = graft.analysis.Tokenizer.plainCfg,
        pruneSingletons = false, mode = "and")
      .as[(Int, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val eng = new graft.query.Engine(spark, idx,
      graft.analysis.Tokenizer.plainCfg, pruneSingletons = false)
    val drv =
      try graft.query.QueryRunner.run(eng, qs, k = 10,
        tokCfg = graft.analysis.Tokenizer.plainCfg, mode = "and")
      finally eng.close()
    assert(dist == drv.sortBy(r => (r._1, r._3)))
    // AND of an unresolvable term returns nothing for that query only
    assert(!dist.exists(_._1 == 3) && dist.exists(_._1 == 1) && dist.exists(_._1 == 2))
  }

  // ---- q55 hard-negative mining -------------------------------------------

  test("q55 engine-mined bands == relational BM25 replay; one pos + the 11-15 neg band per query") {
    import spark.implicits._
    val expect = IndexOps.DistQueries.flatMap { case (n, _, terms) =>
      TextRelational.bm25TopK(spark, dir, terms, IndexOps.HardNegK)
        .as[(Long, Double)].collect()
        .sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, s), i) =>
          (n, id, i + 1, if (i == 0) "pos" else "neg", s) }
        .filter { case (_, _, r, _, _) =>
          r == 1 || (r >= IndexOps.HardNegLo && r <= IndexOps.HardNegK) }
    }.sortBy(r => (r._1, r._3))
    val got = IndexOps.hardNegatives(spark, dir)
      .as[(Int, Long, Int, String, Double)].collect().toSeq
    assert(got == expect)
    IndexOps.DistQueries.foreach { case (n, _, _) =>
      val rows = got.filter(_._1 == n)
      assert(rows.count(_._4 == "pos") == 1, s"query $n pos count")
      assert(rows.filter(_._4 == "neg").map(_._3).sorted ==
        (IndexOps.HardNegLo to IndexOps.HardNegK).toSeq, s"query $n neg band")
      // negatives never outscore the positive
      val pos = rows.find(_._4 == "pos").get._5
      assert(rows.filter(_._4 == "neg").forall(_._5 <= pos), s"query $n scores")
    }
  }

  // ---- q56 contrastive positive pairs -------------------------------------

  test("q56 pairs are the anchor-star of every multi-member dup cluster, nothing else") {
    import spark.implicits._
    val lab = DupClusters.labels(spark, dir)
      .as[(Long, Long)].collect().toMap // doc_id -> cluster
    val byCluster = lab.groupBy(_._2)
    val expect = byCluster.filter(_._2.size > 1).toSeq.flatMap { case (cid, m) =>
      assert(m.keys.min == cid, "anchor must be the cluster min")
      m.keys.filter(_ != cid).map(p => (cid, p, m.size.toLong))
    }.sortBy(r => (r._1, r._2))
    val got = DupClusters.contrastivePairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty, "fixture has no multi-member clusters")
    // anchor-star linearity: pair count == sum(size-1) over real clusters
    assert(got.size == byCluster.values.map(m => math.max(0, m.size - 1)).sum)
  }
}
