package graft

import org.apache.spark.sql.functions._

/** Pins the scaled-corpus builder behind the data-size scaling ladder
  * ([[DataScale.writeScaled]]): the 4× rung must be a DETERMINISTIC,
  * linearly-grown corpus — disjoint id spaces, per-copy-identical text
  * statistics, exactly-preserved embedding geometry within each copy —
  * or the ladder's throughput-retention numbers measure the wrong thing.
  */
class DataScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val srcDir: String = {
    val d = tmpDir("datascale-src")
    Seq(
      (0L, "alpha beta gamma", "en", "web", 16L),
      (1L, "alpha beta gamma", "en", "web", 16L), // exact dup of doc 0
      (2L, "one two three four", "en", "book", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.6f, 0.8f, 0.0f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("4x rung: exact row counts, disjoint stride-offset id spaces") {
    val out = tmpDir("datascale-x4")
    val (d, v) = DataScale.writeScaled(spark, srcDir, out, 4)
    assert(d == 12 && v == 12)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == 12)
    // stride = max+1 = 3: copy c occupies [3c, 3c+2]
    assert(docs.agg(min("doc_id"), max("doc_id")).head() ==
      org.apache.spark.sql.Row(0L, 11L))
  }

  test("per-copy text disguise: intra-copy dup structure identical, " +
    "cross-copy token overlap nil, LENGTH-preserving, n_chars recomputed") {
    val out = tmpDir("datascale-x4b")
    DataScale.writeScaled(spark, srcDir, out, 4)
    val docs = spark.read.parquet(s"$out/documents.parquet")
      .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    // copy 1 of docs 0/1 (ids 3,4) are still exact duplicates of EACH
    // OTHER but share no token with copy 0 — and are the SAME length
    // (byte-level shuffle comparability across copies)
    assert(docs(3)._2 == docs(4)._2)
    assert(docs(3)._2 != docs(0)._2)
    assert(docs(3)._2.length == docs(0)._2.length)
    (1 to 3).foreach { c =>
      val tok0 = docs(0)._2.split(" ").toSet
      val tokC = docs(3 * c)._2.split(" ").toSet
      assert(tok0.intersect(tokC).isEmpty, s"copy $c collides with copy 0")
    }
    // distinct copies are distinct from each other too (7c mod 26 ≠ 0)
    assert(Seq(0, 3, 6, 9).map(docs(_)._2).distinct.size == 4)
    assert(docs.forall { case (_, t, n) => n == t.length.toLong })
    // the rotation is a bijection (disguise never merges tokens)
    val (from, to) = DataScale.rotAlphabet(2)
    assert(from.length == to.length && to.toSet.size == to.length)
  }

  test("embedding rotation: norms and intra-copy cosines exact, ids strided") {
    val out = tmpDir("datascale-x4c")
    DataScale.writeScaled(spark, srcDir, out, 4)
    val vecs = spark.read.parquet(s"$out/embeddings.parquet")
      .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
    assert(vecs.length == 12)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    // copy 2 (ids 6..8) = rotate-left-2 of copy 0: norms exact
    (0 to 2).foreach { i =>
      assert(math.abs(dot(vecs(i)._2, vecs(i)._2) -
        dot(vecs(i + 6)._2, vecs(i + 6)._2)) < 1e-12)
    }
    // intra-copy cosine(0,1) preserved exactly under rotation
    assert(math.abs(dot(vecs(0)._2, vecs(1)._2) -
      dot(vecs(6)._2, vecs(7)._2)) < 1e-12)
    // rotation content check: [1,0,0,0] rotl2 = [0,0,1,0]
    assert(vecs(6)._2.toSeq == Seq(0.0f, 0.0f, 1.0f, 0.0f))
    // labels carried through
    assert(vecs(8)._3 == 1)
  }

  test("digit tokens are disguised too: no cross-copy collision, " +
    "digit-ness and length preserved") {
    val d = tmpDir("datascale-digits-src")
    Seq((0L, "price 42 usd 1999", "en", "web", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq((0L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = tmpDir("datascale-digits-x4")
    DataScale.writeScaled(spark, d, out, 4)
    val texts = spark.read.parquet(s"$out/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1).map(_._2)
    val tok0 = texts(0).split(" ").toSet
    (1 to 3).foreach { c =>
      val tokC = texts(c).split(" ").toSet
      assert(tok0.intersect(tokC).isEmpty,
        s"digit tokens collide between copy 0 and copy $c")
      assert(texts(c).length == texts(0).length)
      // digit-ness preserved: per-copy number statistics stay identical
      assert(texts(c).count(_.isDigit) == texts(0).count(_.isDigit))
    }
    // digit rotation is a bijection for every copy
    (1 to 3).foreach { c =>
      val (from, to) = DataScale.rotAlphabet(c)
      assert(from.length == to.length && to.toSet.size == to.length)
      assert(from.length == 62) // a-z + A-Z + 0-9
    }
  }

  test("q11 pair kernel shuffles the shingle relation ONCE: total " +
    "shuffle records bounded by 2.5x the distinct shingle rows") {
    // The ladder's round-5 finding: without the persist pin in
    // jaccardPairsAll, Catalyst re-executed the scan->explode->dedup
    // exchange up to 3x (PushDownLeftSemiAntiJoin rewrites the
    // anti-join's copy, so ReusedExchange can't collapse it) — a
    // phantom 12x shuffle-record read on the 4x corpus rung. This gate
    // pins the fix: one dedup exchange + the combined hot-set agg +
    // cap-bounded pair shuffles must stay under 2.5x the shingle rows
    // (the old recompute plan measured >= 3x + extras).
    val d = tmpDir("datascale-q11-gate")
    val docs = (0 until 300).map { i =>
      // 40 tokens per doc: unique spine + a shared boilerplate tail so
      // the hot-set path (df > 50) is exercised too
      val spine = (0 until 30).map(j => s"w${i}_$j").mkString(" ")
      val boiler = "the quick brown fox jumps over the lazy dog again"
      (i.toLong, s"$spine $boiler", "en", "web", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val recs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        recs.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    val shingleRows = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", split(lower($"text"), "\\s+").as("toks"))
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"
      )).as("sh")).distinct().count()
    org.apache.spark.graftshim.CoreShim
      .waitListenerBusEmpty(spark.sparkContext, 30000)
    spark.sparkContext.addSparkListener(listener)
    try {
      val rows = graft.operators.Dedup.ngramJaccard(spark, d).count()
      assert(rows >= 0)
      org.apache.spark.graftshim.CoreShim
        .waitListenerBusEmpty(spark.sparkContext, 30000)
      assert(recs.get() <= (shingleRows * 2.5).toLong,
        s"q11 shuffled ${recs.get()} records for $shingleRows shingle rows " +
          "— the shingle relation is being recomputed/reshuffled")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("factor=1 is a faithful rewrite (row-identical to the source)") {
    val out = tmpDir("datascale-x1")
    DataScale.writeScaled(spark, srcDir, out, 1)
    val a = spark.read.parquet(s"$srcDir/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$out/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
