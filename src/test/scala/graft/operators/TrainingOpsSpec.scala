package graft.operators

import graft.SparkSpec
import graft.analysis.Fingerprints

/** Specs for the training-data pipeline operators that have no SQL
  * oracle (q12/q13/q16/q21): semantics pinned against brute force on
  * corpora with PLANTED duplicates, plus plan-shape checks. */
class TrainingOpsSpec extends SparkSpec {

  /** A small corpus with planted near-duplicate pairs, written as a
    * documents.parquet so the operators run unmodified. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val r = new scala.util.Random(42)
    def text(n: Int) = Seq.fill(n)("w" + r.nextInt(400)).mkString(" ")
    val originals = (0L until 40L).map(i => (i, text(120)))
    // plant: docs 1000+i are docs i with ~5% token edits
    val dups = originals.take(15).map { case (i, t) =>
      val toks = t.split(" ")
      val mut = toks.map(tk => if (r.nextDouble() < 0.05) "mut" + r.nextInt(100) else tk)
      (1000L + i, mut.mkString(" "))
    }
    val d = tmpDir("graft-planted")
    (originals ++ dups).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q12 MinHash+LSH finds every planted near-dup pair and nothing below threshold") {
    val pairs = Dedup.minhashLsh(spark, plantedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force oracle: exact jaccard over all pairs
    val docs = spark.read.parquet(s"$plantedDir/documents.parquet")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      j = Fingerprints.jaccard(
        Fingerprints.shingles(ta, 2), Fingerprints.shingles(tb, 2))
      if j >= Dedup.LshJaccardMin
    } yield (a, b)).toSet
    assert(truth.size >= 10, s"expected planted dups in truth, got ${truth.size}")
    // verified-LSH output must be a subset of truth (no false positives
    // survive verification) and recall must be 1.0 at this similarity
    // level (8 bands x 4 rows at j>=0.8 -> p_miss < 1e-6)
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val high = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      j = Fingerprints.jaccard(
        Fingerprints.shingles(ta, 2), Fingerprints.shingles(tb, 2))
      if j >= 0.8
    } yield (a, b)).toSet
    assert(high.subsetOf(got), s"missed high-sim pairs: ${high.diff(got)}")
  }

  test("q13 simhash chunk-join finds exactly the brute-force pairs at hamming<=3") {
    val got = Dedup.simhashPairs(spark, plantedDir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val docs = spark.read.parquet(s"$plantedDir/documents.parquet")
      .collect().map(r => (r.getLong(0), Fingerprints.simhash(r.getString(1))))
    val truth = (for {
      (a, fa) <- docs; (b, fb) <- docs if a < b
      h = Fingerprints.hamming(fa, fb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == truth)
    assert(truth.nonEmpty, "planted dups should land within hamming 3")
  }

  test("simhash 6-choose-3 key scheme: chunks tile 64 bits; collision GUARANTEED at hamming<=3") {
    // the chunk split must cover [0,64) exactly once — a gap or overlap
    // silently voids the pigeonhole guarantee
    val covered = Dedup.SimChunkOffsets.zip(Dedup.SimChunkBits)
      .flatMap { case (o, w) => o until (o + w) }.sorted.toSeq
    assert(covered == (0 until 64), "chunk split must tile the 64 bits")
    // property: ANY <=3 bit flips leave >=1 of the 20 combo keys equal
    val r = new scala.util.Random(123)
    (1 to 2000).foreach { _ =>
      val fp = r.nextLong()
      val flips = r.nextInt(4) // 0..3
      val fp2 = (1 to flips).foldLeft(fp)((f, _) => f ^ (1L << r.nextInt(64)))
      val shared = Dedup.simKeys(fp).toSet intersect Dedup.simKeys(fp2).toSet
      assert(shared.nonEmpty,
        f"no shared key at hamming<=3: fp=$fp%016x fp2=$fp2%016x")
    }
    // adversarial worst case: exactly 3 flips in 3 DIFFERENT chunks —
    // only the one untouched-triple combo survives
    val fp = 0x0123456789abcdefL
    val fp3 = fp ^ (1L << 0) ^ (1L << 11) ^ (1L << 22) // chunks 0,1,2
    val shared = Dedup.simKeys(fp).toSet intersect Dedup.simKeys(fp3).toSet
    assert(shared.size == 1, s"want exactly the (3,4,5) combo, got $shared")
  }

  test("q16 LSH ANN re-ranks candidates with exact cosine and overlaps brute force") {
    val dir = "/root/testdata/sf0.001"
    val brute = Similarity.annBruteForce(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.annLsh(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // any id both return must carry the IDENTICAL exact cosine
    brute.keySet.intersect(lsh.keySet).foreach { id =>
      assert(brute(id) == lsh(id), s"cos mismatch for $id")
    }
    // the sf0.001 embeddings are UNIFORM RANDOM (top-20 cosines 0.23-
    // 0.33, i.e. ~72 degrees): per-bit agreement is only ~0.6, so the
    // hamming<=2 multi-probe (37/256 buckets, ~14% of vectors) has a
    // ~0.31 expected recall ceiling — measured 0.30. High recall on
    // neighbor-free data would mean NO pruning; the planted-cluster
    // fixture below is where a real >=0.8 target applies.
    val recall = brute.keySet.intersect(lsh.keySet).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("q24 IVF ANN re-ranks with exact cosine and overlaps brute force") {
    val dir = "/root/testdata/sf0.001"
    val brute = Similarity.annBruteForce(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.annIvf(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    brute.keySet.intersect(ivf.keySet).foreach { id =>
      assert(brute(id) == ivf(id), s"cos mismatch for $id")
    }
    // trained codebook, 4/16 lists probed = 27% coverage on this
    // uniform-random table; measured recall 0.55 is a 2x lift over
    // coverage — the honest ceiling here (0.8 recall needs >50%
    // coverage on neighbor-free data = no pruning). The >=0.8 target
    // is gated on the planted-cluster fixture below.
    val recall = brute.keySet.intersect(ivf.keySet).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
    // probing must prune: candidate set smaller than the corpus
    assert(ivf.size == Similarity.K)
  }

  /** 20 tight clusters x 25 vectors (dim 64): data where ANN recall is
    * meaningful. vec 0's true top-20 are exactly its cluster-mates. */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    import graft.corpus.Synth
    val rows = for (c <- 0 until 20; m <- 0 until 25) yield {
      val rc = new Synth.Rng(Synth.mix(0xC1A5L ^ c.toLong))
      val center = Array.fill(64)(rc.nextDouble() * 2 - 1)
      val rm = new Synth.Rng(Synth.mix(0x3E3BL ^ (c * 25L + m)))
      val v = center.map(x => (x + 0.05 * (rm.nextDouble() * 2 - 1)).toFloat)
      (c * 25L + m, v, c)
    }
    val d = tmpDir("graft-clustered")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("q16+q24 on planted clusters: recall >= 0.8 against brute force (real neighbor structure)") {
    val brute = Similarity.annBruteForce(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSet
    // sanity: the true top-20 are cluster-0 mates
    assert(brute.forall(_ < 25L), s"brute top-k not cluster-mates: $brute")
    val lsh = Similarity.annLsh(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSet
    val ivf = Similarity.annIvf(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSet
    val lshRecall = brute.intersect(lsh).size.toDouble / brute.size
    val ivfRecall = brute.intersect(ivf).size.toDouble / brute.size
    assert(lshRecall >= 0.8, s"LSH recall=$lshRecall")
    assert(ivfRecall >= 0.8, s"IVF recall=$ivfRecall")
  }

  test("q16/q24/q34 rows carry measured recall_at_k — committed goldens; serving path skips the eval pass") {
    val d = "/root/testdata/sf0.001"
    def rec(df: org.apache.spark.sql.DataFrame): Double = {
      val vs = df.select("recall_at_k").collect().map(_.getDouble(0)).distinct
      assert(vs.length == 1, "recall must be one literal across all rows")
      vs.head
    }
    // committed goldens on the FIXED uniform-random corpus (the honest
    // no-neighbor-structure ceilings analyzed in the q16/q24 tests
    // above); planted-structure >= 0.8 is gated on clusteredDir below
    assert(rec(Similarity.annLsh(spark, d)) == 0.3)
    assert(rec(Similarity.annIvf(spark, d)) == 0.55)
    assert(rec(Similarity.annIvfPq(spark, d)) == 0.2)
    // with real neighbor structure the emitted column itself reads >=0.8
    assert(rec(Similarity.annLsh(spark, clusteredDir)) >= 0.8)
    // serving path: no recall column => no extra exact pass at scale
    assert(!Similarity.annLsh(spark, d, withRecall = false)
      .columns.contains("recall_at_k"))
    assert(!Similarity.annIvf(spark, d, withRecall = false)
      .columns.contains("recall_at_k"))
    assert(!Similarity.annIvfPq(spark, d, withRecall = false)
      .columns.contains("recall_at_k"))
  }

  test("q16+q24 recall holds at a NON-DEFAULT AnnConfig (nothing pins nBits=8 / ivfLists=16)") {
    // round-2 review: the bucketing constants were fixed vals; prove the
    // operators are correct at a second setting, not pinned to the default
    val cfg = AnnConfig(nBits = 6, multiProbe = 2, ivfLists = 8, ivfProbes = 3)
    val brute = Similarity.annBruteForce(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSet
    val lsh = Similarity.annLsh(spark, clusteredDir, cfg).collect()
      .map(_.getLong(0)).toSet
    val ivf = Similarity.annIvf(spark, clusteredDir, cfg).collect()
      .map(_.getLong(0)).toSet
    val lshRecall = brute.intersect(lsh).size.toDouble / brute.size
    val ivfRecall = brute.intersect(ivf).size.toDouble / brute.size
    assert(lshRecall >= 0.8, s"LSH recall=$lshRecall at $cfg")
    assert(ivfRecall >= 0.8, s"IVF recall=$ivfRecall at $cfg")
  }

  test("q34 IVF-PQ on planted clusters: ADC over packed codes recovers the true neighbors") {
    val brute = Similarity.annBruteForce(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSet
    val pq = Similarity.annIvfPq(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF-PQ recall=$recall")
    // and at a non-default shape: 4 subspaces of 16 dims, 8 centroids
    // (3-bit codes) — nothing pins pqM=8/pqK=16
    val cfg = AnnConfig(ivfLists = 8, ivfProbes = 3, pqM = 4, pqK = 8)
    val pq2 = Similarity.annIvfPq(spark, clusteredDir, cfg).collect()
      .map(_.getLong(0)).toSet
    val recall2 = brute.intersect(pq2).size.toDouble / brute.size
    assert(recall2 >= 0.7, s"IVF-PQ recall=$recall2 at $cfg (coarser codes)")
  }

  test("q34 layout is the compressed serving format: no embedding column, codes fit their bits") {
    import spark.implicits._
    val layout = spark.read.parquet(
      Similarity.pqLayout(spark, clusteredDir))
    assert(layout.columns.sorted.toSeq == Seq("code", "list", "norm", "vec_id"),
      s"layout carries extra columns: ${layout.columns.toSeq}")
    // every packed code decodes to sub-codes < pqK (4-bit lanes)
    val codes = layout.select($"code").as[Long].collect()
    assert(codes.nonEmpty)
    codes.foreach { c =>
      (0 until 8).foreach { m =>
        val k = (c >> (4 * m)) & 15
        assert(k >= 0 && k < 16, s"lane $m of code $c out of range")
      }
    }
    // norms are the exact vector norms (spot-check vs raw table)
    val raw = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    layout.select($"vec_id".cast("long"), $"norm").as[(Long, Float)]
      .collect().take(50).foreach { case (id, n) =>
        val v = raw(id).map(_.toDouble)
        assert(math.abs(n - math.sqrt(v.map(x => x * x).sum)) < 1e-3,
          s"vec $id: stored norm $n")
      }
  }

  test("ANN layouts persist as first-class indexes: build in JVM A, serve in JVM B from the manifest with no rebuild") {
    val root = tmpDir("graft-annroot")
    def runAll(): Seq[Seq[String]] = Seq(
      Similarity.annLsh(spark, clusteredDir, root = Some(root)),
      Similarity.annIvf(spark, clusteredDir, root = Some(root)),
      Similarity.annIvfPq(spark, clusteredDir, root = Some(root)))
      .map(_.collect().map(_.toString).toSeq)
    // "JVM A": build all three layouts under the persistent root
    val a = runAll()
    a.foreach(r => assert(r.nonEmpty))
    val builds = Similarity.layoutBuilds.get()
    val hits = Similarity.manifestHits.get()
    // "JVM B": every in-memory memo (resolved layouts, trained
    // codebooks) dropped; only the on-disk artifact remains
    Similarity.clearJvmCaches()
    val b = runAll()
    assert(b == a, "artifact-served results differ from build-JVM results")
    assert(Similarity.layoutBuilds.get() == builds,
      "serving JVM rebuilt a layout despite the manifest")
    assert(Similarity.manifestHits.get() >= hits + 3,
      "expected a manifest hit per layout kind")
    // config echo: a manifest never serves a different geometry
    val ivfDir = AnnStore.layoutDir(root, "ivf", Similarity.DefaultAnn,
      clusteredDir)
    assert(AnnStore.read(ivfDir, "ivf", Similarity.DefaultAnn,
      clusteredDir).isDefined)
    assert(AnnStore.read(ivfDir, "ivf", AnnConfig(ivfLists = 8),
      clusteredDir).isEmpty)
    assert(AnnStore.read(ivfDir, "lsh", Similarity.DefaultAnn,
      clusteredDir).isEmpty)
    // source echo: a manifest never serves a DIFFERENT table's vectors
    // (a kind+config-only key aliased two tables under one root)
    assert(AnnStore.read(ivfDir, "ivf", Similarity.DefaultAnn,
      clusteredDir + "-other").isEmpty)
    assert(AnnStore.layoutDir(root, "ivf", Similarity.DefaultAnn,
      clusteredDir + "-other") != ivfDir,
      "two source tables must get distinct layout dirs under one root")
    // a corrupt manifest reads as a miss and the layout rebuilds —
    // degraded to a rebuild, never a query failure
    val mf = new java.io.File(ivfDir, "_graft_ann.bin")
    java.nio.file.Files.write(mf.toPath, Array[Byte](1, 2, 3))
    Similarity.clearJvmCaches()
    val c = Similarity.annIvf(spark, clusteredDir, root = Some(root))
      .collect().map(_.toString).toSeq
    assert(c == a(1), "rebuild after corrupt manifest changed results")
    assert(Similarity.layoutBuilds.get() == builds + 1)
  }

  test("q14 blocking factor derives from corpus size and never changes results") {
    // derivation: smallest block count whose block-pairs fit the
    // per-task vector budget, floored at 8 for test-scale parallelism
    assert(Dedup.cosBlocksFor(500) == 8)
    assert(Dedup.cosBlocksFor(1L << 20) == 32)
    import spark.implicits._
    val d = tmpDir("graft-zeronorm")
    Seq(
      (0L, Array(1f, 0f, 0f), 0), (1L, Array(1f, 0.01f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 1), (3L, Array(0f, 0f, 0f), 1),
      (4L, Array(-1f, 0f, 0.5f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val a = Dedup.embeddingCosine(spark, d, blocks = 2).collect().map(_.toString).toSeq
    val b = Dedup.embeddingCosine(spark, d, blocks = 5).collect().map(_.toString).toSeq
    assert(a == b, s"blocking changed results:\n$a\n$b")
    assert(a.nonEmpty)
    // the zero-norm vector (id 3) has undefined cosine against everything
    // — it is dropped before replication and appears in no pair
    val ids = Dedup.embeddingCosine(spark, d).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(3L), s"zero-norm vector leaked into pairs: $ids")
  }

  test("q14/q43 triangle blocking handles negative vec_ids (floorMod, not %)") {
    // regression: `id % nb` is negative for negative ids in Scala, so
    // the right-side emission range is empty and every pair involving
    // that vector silently vanished from both operators
    import spark.implicits._
    val d = tmpDir("graft-negid")
    Seq(
      (-7L, Array(1f, 0f, 0f)), (-2L, Array(1f, 0.01f, 0f)),
      (3L, Array(0.99f, 0.02f, 0f)), (11L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // q14: all three near-parallel vectors pair up, including both
    // negative ids; pairs are (min, max) ordered
    val pairs = Dedup.embeddingCosine(spark, d, blocks = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((-7L, -2L), (-7L, 3L), (-2L, 3L)),
      s"negative-id pairs missing: $pairs")
    // q43: every vector (negative ids included) gets k=1 neighbor rows
    val knnIds = Similarity.knnJoin(spark, d, k = 1, blocks = 3)
      .collect().map(_.getLong(0)).toSet
    assert(knnIds == Set(-7L, -2L, 3L, 11L),
      s"negative-id vectors missing from kNN output: $knnIds")
  }

  test("q45 source filter drops WHOLE bottom-quartile sources, doc quality notwithstanding") {
    import spark.implicits._
    val d = tmpDir("graft-srcq")
    // 5 sources: "junk" is all low-quality (short, symbol-heavy);
    // the others carry long alpha-heavy docs. One GOOD doc is planted
    // INSIDE junk and one BAD doc inside src-a: group-level curation
    // must drop the good-doc-in-bad-source and keep the reverse.
    def good(i: Long) = Seq.fill(120)("alpha" + i).mkString(" ")
    def bad(i: Long) = s"@@ ## $i %%"
    val rows =
      (0L until 10L).map(i => (i, good(i), "src-a")) ++
      (10L until 20L).map(i => (i, good(i), "src-b")) ++
      (20L until 30L).map(i => (i, good(i), "src-c")) ++
      (30L until 40L).map(i => (i, good(i), "src-d")) ++
      (40L until 49L).map(i => (i, bad(i), "junk")) :+
      ((49L, good(49L), "junk")) :+ ((9L + 100L, bad(109L), "src-a"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Assembly.sourceQualityFilter(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // floor(5/4)=1 source dropped: junk, in its entirety — including
    // the planted good doc 49
    val dropped = out.filter(_._3 == 0)
    assert(dropped.nonEmpty && dropped.forall(_._2 == "junk"),
      s"expected exactly source 'junk' dropped: ${dropped.take(5).toSeq}")
    assert(dropped.exists(_._1 == 49L),
      "the good doc inside the bad source must be dropped with its source")
    // the bad doc inside src-a survives (its source's mean stays top-3/4)
    assert(out.exists(r => r._1 == 109L && r._3 == 1),
      "the bad doc inside a good source must survive group curation")
    assert(out.count(_._3 == 1) == 41)
  }

  test("q21 multimodal features are deterministic with a valid feature schema; real formats decode") {
    val a = Multimodal.features(spark, "/root/testdata/sf0.001").collect()
    val b = Multimodal.features(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getInt(2) > 0) // n_bytes
      // feat is a JSON array string (driver-compare-friendly)
      val s = r.getString(5)
      assert(s.startsWith("[") && s.endsWith("]"), s)
      val feat = s.drop(1).dropRight(1).split(',').map(_.toDouble)
      assert(feat.length == 4, s)
      r.getString(1) match {
        case "png" | "jpeg" =>
          // fake 4-bin byte histogram sums to 1 (4 * 5e-5 rounding slack)
          assert(math.abs(feat.sum - 1.0) <= 2.5e-4, s)
          assert(r.getInt(4) == 1) // frames
        case "wav" =>
          // real PCM decode: [mean, rms, min, max] over [-1,1) samples
          assert(r.getInt(4) > 0, "wav must report real frame count")
          assert(feat.forall(v => v >= -1.0 && v <= 1.0), s)
          assert(feat(1) >= 0 && feat(2) <= feat(3), s) // rms>=0, min<=max
        case "ppm" | "bmp" =>
          // real raster decode: [meanR, meanG, meanB, meanLum] / 255
          assert(r.getInt(4) == 1)
          assert(feat.forall(v => v >= 0.0 && v <= 1.0), s)
        case other => fail(s"unexpected format $other")
      }
    }
    // every REAL format decoded (frames = -1 is the parse-failure
    // sentinel; synthesized payloads are all well-formed)
    assert(!a.exists(_.getInt(4) == -1), "a synthesized payload failed to parse")
    Seq("png", "jpeg", "wav", "ppm", "bmp").foreach { f =>
      assert(a.exists(_.getString(1) == f), s"format $f absent from fixture")
    }
  }

  test("q21 WAV golden: hand-built RIFF/PCM bytes decode exactly (16-bit stereo, skipped chunk, 8-bit mono)") {
    // hand-assembled, NOT via encodeWavPcm16 — the golden must catch an
    // encoder/decoder colluding bug. 2 ch x 2 frames of 16-bit PCM with
    // a LIST chunk of ODD length before data (RIFF pads chunks to even).
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    val list = ascii("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd len + pad
    val samples = Seq(-32768, 0, 16384, -16384)
    val data = ascii("data") ++ le32(8) ++ samples.flatMap(le16(_)).toArray
    val body = ascii("WAVE") ++ fmt ++ list ++ data
    val wav = ascii("RIFF") ++ le32(body.length) ++ body
    val (ch, rate, bits, s) = Multimodal.decodeWav(wav)
    assert((ch, rate, bits) == ((2, 8000, 16)))
    assert(s.toSeq == Seq(-1.0, 0.0, 0.5, -0.5))
    // 8-bit mono: unsigned bytes, (b-128)/128
    val data8 = ascii("data") ++ le32(4) ++ Array[Byte](0, 128.toByte, 192.toByte, 255.toByte)
    val fmt8 = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(4000) ++ le32(4000) ++ le16(1) ++ le16(8)
    val body8 = ascii("WAVE") ++ fmt8 ++ data8
    val wav8 = ascii("RIFF") ++ le32(body8.length) ++ body8
    val (ch8, _, bits8, s8) = Multimodal.decodeWav(wav8)
    assert(ch8 == 1 && bits8 == 8)
    assert(s8.toSeq == Seq(-1.0, 0.0, 0.5, 127.0 / 128))
    // the encoder round-trips through the same decoder byte-exactly
    val enc = Multimodal.encodeWavPcm16(2, 8000,
      samples.map(_.toShort).toArray)
    assert(Multimodal.decodeWav(enc)._4.toSeq == s.toSeq)
  }

  test("q21 PPM/BMP goldens: hand-built bytes decode exactly (comments, bottom-up rows, padding)") {
    def ascii(s: String) = s.getBytes("US-ASCII")
    // P6 with a comment line; 2x1 pixels: red, then (1,2,3)
    val ppm = ascii("P6\n# a comment\n2 1\n255\n") ++
      Array[Byte](255.toByte, 0, 0, 1, 2, 3)
    val (pw, ph, prgb) = Multimodal.decodePpm(ppm)
    assert((pw, ph) == ((2, 1)))
    assert(prgb.toSeq == Seq[Byte](255.toByte, 0, 0, 1, 2, 3))
    // hand-built 3x2 BMP, bottom-up BGR rows padded 9 -> 12 bytes.
    // top-down RGB target: row0 = (1,2,3),(4,5,6),(7,8,9)
    //                      row1 = (10,11,12),(13,14,15),(16,17,18)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def bgr(r: Int, g: Int, b: Int) = Array[Byte](b.toByte, g.toByte, r.toByte)
    val pad = Array[Byte](0, 0, 0)
    val rowBottom = bgr(10, 11, 12) ++ bgr(13, 14, 15) ++ bgr(16, 17, 18) ++ pad
    val rowTop = bgr(1, 2, 3) ++ bgr(4, 5, 6) ++ bgr(7, 8, 9) ++ pad
    val raster = rowBottom ++ rowTop // bottom row stored FIRST
    val bmp = ascii("BM") ++ le32(54 + raster.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(3) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ raster
    val (bw, bh, brgb) = Multimodal.decodeBmp(bmp)
    assert((bw, bh) == ((3, 2)))
    assert(brgb.toSeq == (1 to 18).map(_.toByte).toSeq)
    // encoder round-trip (top-down RGB in == top-down RGB out)
    val enc = Multimodal.encodeBmp24(3, 2, (1 to 18).map(_.toByte).toArray)
    assert(Multimodal.decodeBmp(enc)._3.toSeq == (1 to 18).map(_.toByte).toSeq)
    assert(Multimodal.decodePpm(
      Multimodal.encodePpm(2, 1, prgb))._3.toSeq == prgb.toSeq)
  }

  test("q21 malformed payloads fall back to the fake path with frames = -1 (poison-pill, not job-kill)") {
    def feat(fmt: String, bytes: Array[Byte]) =
      Multimodal.decodeFeatures(Multimodal.MediaRow(1L, fmt, 4, 4, bytes))
    // truncated / wrong-magic / compressed-bmp payloads must not throw
    assert(feat("wav", "RIFFxxxx".getBytes("US-ASCII"))._1 == -1)
    assert(feat("wav", Array[Byte](1, 2, 3))._1 == -1)
    assert(feat("ppm", "P5\n2 1\n255\n??".getBytes("US-ASCII"))._1 == -1)
    assert(feat("bmp", Array.fill[Byte](60)(0))._1 == -1)
    val (f, v) = feat("wav", Array[Byte](1, 2, 3))
    assert(f == -1 && v.length == 4) // fake histogram shape
  }

  test("multimodal metadata query prunes the binary column from the scan") {
    val plan = Multimodal.metaOnly(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    // the media payload must not survive column pruning into the scan
    assert(!plan.contains("media#") ||
      !plan.split("Relation").last.contains("media"),
      s"binary column not pruned:\n$plan")
  }

  test("q11 jaccard pairs on planted corpus surface the planted dups first") {
    import spark.implicits._
    val top = Dedup.ngramJaccard(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.nonEmpty)
    // the most similar pairs should be (i, 1000+i) plants
    assert(top.take(5).forall { case (a, b) => b == a + 1000 },
      s"top pairs not the planted dups: ${top.take(5).toSeq}")
  }

  test("q12 oversized band buckets: candidates stay O(cluster), star links to the representative, q32 recovers the cluster") {
    import spark.implicits._
    // plant a dup cluster LARGER than MaxBandBucket — the crawl-corpus
    // regime LSH dedup exists for. All members identical => every band
    // bucket holds the whole cluster, so naive enumeration would emit
    // n(n-1)/2 ≈ 719k candidate pairs through each of 8 band keys.
    val n = 1200
    require(n > Dedup.MaxBandBucket)
    val dupText = (0 until 20).map(i => "tok" + i).mkString(" ")
    val r = new scala.util.Random(7)
    val uniq = (0 until 10).map(i =>
      (100000L + i, Seq.fill(25)("u" + r.nextInt(5000)).mkString(" ")))
    val d = tmpDir("graft-bigbucket")
    ((0L until n.toLong).map(i => (i, dupText)) ++ uniq)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // candidate rows: (rep, member) star edges only — O(cluster), never
    // O(cluster^2)
    val candCount = Dedup.lshCandidates(spark, d, Dedup.MaxBandBucket).count()
    assert(candCount >= (n - 1).toLong, s"star edges missing: $candCount")
    assert(candCount <= (n - 1).toLong + 50,
      s"candidate blowup: $candCount rows for a $n-member cluster")
    // verified output: every member linked to the bucket-min rep at j=1
    val pairs = Dedup.minhashLsh(spark, d).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1), rr.getDouble(2)))
    val star = pairs.filter(p => p._1 == 0L && p._2 < n)
    assert(star.length == n - 1, s"expected ${n - 1} star pairs, got ${star.length}")
    assert(star.forall(_._3 == 1.0))
    // q32 path: star contraction over the q12 edge list recovers the
    // FULL cluster even though q12 never enumerated member×member pairs
    val edges = pairs.toSeq.toDF("a", "b", "j").select($"a", $"b")
    val lab = DupClusters.starContract(edges).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1))).toMap
    (1L until n.toLong).foreach { id =>
      assert(lab(id) == 0L, s"doc $id not clustered to 0: ${lab.get(id)}")
    }
  }

  test("q11 giant-cluster regime: clusters > MaxShingleDf are invisible to q11 by design; q12+q32 own them") {
    import spark.implicits._
    // a near-dup cluster larger than MaxShingleDf caps away ALL its
    // shingles (each shingle's df >= cluster size), so q11 reports no
    // pairs inside it — pinned here so the recall boundary is explicit.
    val n = 60
    require(n > Dedup.MaxShingleDf)
    val dupText = (0 until 20).map(i => "gc" + i).mkString(" ")
    val r = new scala.util.Random(11)
    val uniq = (0 until 15).map(i =>
      (100000L + i, Seq.fill(30)("v" + r.nextInt(5000)).mkString(" ")))
    val d = tmpDir("graft-giantcluster")
    ((0L until n.toLong).map(i => (i, dupText)) ++ uniq)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val q11 = Dedup.jaccardPairsAll(spark, d).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1)))
    assert(!q11.exists { case (a, b) => a < n && b < n },
      s"q11 unexpectedly found pairs inside the giant cluster: ${q11.take(3).toSeq}")
    // q12 (bucket size 60 < MaxBandBucket -> full enumeration) finds it
    val q12 = Dedup.minhashLsh(spark, d).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1)))
      .filter { case (a, b) => a < n && b < n }
    assert(q12.length == n * (n - 1) / 2,
      s"q12 should see all cluster pairs, got ${q12.length}")
    val edges = q12.toSeq.toDF("a", "b")
    val lab = DupClusters.starContract(edges).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1))).toMap
    (1L until n.toLong).foreach(id => assert(lab(id) == 0L))
  }

  test("q35 duplicated-span coverage: shared spans, self-repeats and boundaries measured exactly") {
    import spark.implicits._
    val d = tmpDir("graft-spans")
    // docs 0+1 share a 12-token span (cross-doc duplication); doc 2
    // repeats its own 10-token phrase (intra-doc duplication counts —
    // the span occurs twice in the corpus); doc 3 is unique; doc 4 is
    // shorter than the 8-token window (no grams at all)
    val shared = (0 until 12).map(i => s"s$i").mkString(" ")
    val selfrep = (0 until 10).map(i => s"r$i").mkString(" ")
    Seq(
      (0L, s"a0 a1 a2 $shared a3 a4"),
      (1L, s"b0 $shared b1 b2 b3"),
      (2L, s"$selfrep c0 c1 $selfrep"),
      (3L, (0 until 30).map(i => s"u$i").mkString(" ")),
      (4L, "x y z"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val m = Dedup.dupSpans(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // interval union recovers EXACTLY the shared 12 tokens (grams that
    // straddle the span boundary are unique to one doc and contribute
    // nothing)
    assert(m(0L) == ((17L, 12L, 0.7059)), s"doc0: ${m(0L)}")
    assert(m(1L) == ((16L, 12L, 0.75)), s"doc1: ${m(1L)}")
    // both copies of the self-repeated phrase count: two 10-token islands
    assert(m(2L) == ((22L, 20L, 0.9091)), s"doc2: ${m(2L)}")
    assert(m(3L) == ((30L, 0L, 0.0)), s"doc3: ${m(3L)}")
    assert(m(4L) == ((3L, 0L, 0.0)), s"doc4: ${m(4L)}")
  }

  test("q25 PII redaction scrubs planted emails/phones/IPs and counts them") {
    import spark.implicits._
    val d = tmpDir("graft-pii")
    Seq(
      (0L, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
      (1L, "call +1 555-123-4567 or 555 987 6543 now"),
      (2L, "server at 10.0.0.1 and 192.168.255.254 up"),
      (3L, "no pii here at all"),
      (4L, "mix a@b.io 123-456-7890 8.8.8.8 end")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.piiRedact(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(0L) == ((2L, 0L, 0L)), s"emails: ${rows(0L)}")
    assert(rows(1L) == ((0L, 2L, 0L)), s"phones: ${rows(1L)}")
    assert(rows(2L) == ((0L, 0L, 2L)), s"ips: ${rows(2L)}")
    assert(rows(3L) == ((0L, 0L, 0L)))
    assert(rows(4L) == ((1L, 1L, 1L)), s"mixed: ${rows(4L)}")
    // redaction replaces, never leaks: rebuild the redacted text and check
    val red = org.apache.spark.sql.functions.sha2(
      org.apache.spark.sql.functions.lit(
        "contact <EMAIL> or <EMAIL> today"), 256)
    val expect = spark.range(1).select(red).head().getString(0)
    val got = TextAnalysis.piiRedact(spark, d).filter($"doc_id" === 0L)
      .head().getString(4)
    assert(got == expect, "redacted sha mismatch for planted email doc")
  }

  test("q25 PII redaction is a map-only plan: no shuffle, no window") {
    val p = TextAnalysis.piiRedact(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the orderBy is the test-scale contract sort; everything before it
    // must be exchange-free (scan -> project)
    assert(!p.contains("Window"))
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"PII pass should add no shuffle beyond the contract sort:\n${p.take(800)}")
  }

  test("q26 repetition metrics separate repetitive from diverse docs") {
    import spark.implicits._
    val d = tmpDir("graft-rep")
    val diverse = (0 until 200).map(i => s"tok$i").mkString(" ")
    val loopy = Seq.fill(50)("badger badger mushroom").mkString(" ")
    Seq((0L, diverse), (1L, loopy), (2L, "a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val m = TextAnalysis.repetition(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m(0L)._1 < 0.02 && m(0L)._2 == 0.0, s"diverse doc flagged: ${m(0L)}")
    assert(m(1L)._1 > 0.3, s"loopy doc top-bigram too low: ${m(1L)}")
    assert(m(1L)._2 > 0.9, s"loopy doc dup-trigram too low: ${m(1L)}")
    // 2-token doc: one bigram (frac 1.0), no trigrams (frac 0.0 via coalesce)
    assert(m(2L) == ((1.0, 0.0)), s"short doc: ${m(2L)}")
  }

  test("q27 decontamination flags exactly the docs sharing an 8-gram with the benchmark") {
    import spark.implicits._
    val d = tmpDir("graft-decontam")
    val bench = (0 until 30).map(i => s"b$i").mkString(" ") // doc 0: benchmark (0 % 7 == 0)
    val leaked = "x y z " + (10 until 18).map(i => s"b$i").mkString(" ") + " q r"
    val clean = (0 until 30).map(i => s"c$i").mkString(" ")
    Seq((0L, bench), (1L, leaked), (2L, clean), (3L, "short doc only"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dedup.decontam(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L)),
      s"expected only doc 1 flagged with exactly its 1 leaked 8-gram: ${got.toSeq}")
  }

  test("q17 lang-id argmax is a partial aggregation, not a window") {
    val p = TextAnalysis.langId(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "argmax regressed to a row_number window")
    assert(p.contains("partial_min"), "struct-min argmax is not map-side partial")
  }

  test("q30 sample keeps EXACTLY the rows whose md5 clears the source's threshold") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    def u8(docId: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s"graft-mix-$docId".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
    }
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val expected = all.filter { case (id, src) =>
      val m = "([0-9]+)".r.findFirstIn(src).get.toInt % 4
      m == 3 || u8(id) < Seq("40000000", "80000000", "c0000000")(m)
    }.map(_._1).sorted.toSeq
    val got = Assembly.stratifiedSample(spark, dir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == expected, s"sample mismatch: got ${got.size}, expected ${expected.size}")
    // determinism across runs (no RNG state): second run identical
    assert(Assembly.stratifiedSample(spark, dir)
      .select($"doc_id").as[Long].collect().toSeq == expected)
  }

  test("q31 bucket-size derivation bounds BOTH prefix-sum funnels") {
    // floor keeps small fixtures multi-bucket-capable; sqrt takes over
    // once it dominates
    assert(Assembly.packBucketFor(500L) == Assembly.PackBucket)
    assert(Assembly.packBucketFor(1000L * 1000) == Assembly.PackBucket)
    assert(Assembly.packBucketFor(4L * 1000 * 1000) == 2000L)
    // at 10^11 docs neither the ledger window nor a within-bucket
    // partition may exceed ~sqrt(n) rows
    val n = 100000000000L
    val b = Assembly.packBucketFor(n)
    assert(b <= 400000L, s"bucket size $b")
    assert(n / b <= 400000L, s"ledger rows ${n / b}")
  }

  test("q31 packing offsets are the exact global running sum (distributed scan == naive)") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val rows = Assembly.packSequences(spark, dir)
      .select($"doc_id", $"n_pieces", $"start_off", $"bin_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    rows.foreach { case (id, n, off, bin) =>
      assert(off == cum, s"doc $id: start_off $off != running sum $cum")
      assert(bin == off / Assembly.PackCtx, s"doc $id: bin $bin")
      cum += n
    }
    assert(rows.nonEmpty && cum > Assembly.PackCtx,
      "fixture too small to exercise multiple bins")
  }

  test("q38 token budget keeps exactly the hash-order prefix under ceil(total/4)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Assembly.tokenBudget(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // independent replay: naive driver-side sort by (u_hex, doc_id)
    import org.apache.spark.sql.functions.{ceil, concat, lit, md5, substring}
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", ceil($"n_chars" / 4.0).cast("long").as("np"),
        substring(md5(concat(lit("graft-budget-"),
          $"doc_id".cast("string"))), 1, 8).as("u"))
      .as[(Long, Long, String)].collect()
    val total = all.map(_._2).sum
    val budget = (total + 3) / 4
    var cum = 0L
    val expected = all.sortBy(d => (d._3, d._1)).flatMap { case (id, np, u) =>
      val keep = cum < budget
      val before = cum
      cum += np
      if (keep) Some((id, np, before, u)) else None
    }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq,
      s"budget selection mismatch (got ${got.length}, want ${expected.length})")
    // the cut is meaningful: strictly between none and all
    assert(got.nonEmpty && got.length < all.length)
    // the budget is reached (the straddling doc is included, so kept
    // total >= budget; exact composition pinned by the replay above)
    val kept = got.map(_._2).sum
    assert(kept >= budget, s"kept $kept vs budget $budget")
  }

  test("q39 temperature mix keeps EXACTLY the md5-cleared rows; thresholds are integer-exact and 1/sqrt(w)-monotone") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    def u8(docId: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s"graft-temp-$docId".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
    }
    // independent ledger replay (plain Scala, no Spark expressions)
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)].collect()
    val led = all.groupBy(_._2).map { case (src, rows) =>
      (src, rows.map(r => (r._3 + 3) / 4).sum)
    }.toSeq.sortBy(_._1)
    val thr = Assembly.temperatureThresholds(led).toMap
    // threshold arithmetic replay: BigInt from first principles
    val sTot = led.map(w => BigInt(math.sqrt(w._2.toDouble).toLong)).sum
    val budget = led.map(w => BigInt(w._2)).sum / 4
    led.foreach { case (src, w) =>
      val t = (Assembly.TempHashSpace * BigInt(math.sqrt(w.toDouble).toLong) * budget) /
        (sTot * BigInt(w))
      val hex = if (t >= Assembly.TempHashSpace) "g0000000" else f"${t.toLong}%08x"
      assert(thr(src) == hex, s"threshold mismatch for $src")
    }
    // rate is monotone in the exact rational isqrt(w)/w it floors (the
    // temperature effect, t ∝ ~1/sqrt(w); NOT strictly monotone in w
    // itself — isqrt steps at perfect squares): rank by s_a·w_b vs
    // s_b·w_a cross products, thresholds must rank the same way
    val rated = led.map { case (src, w) =>
      (BigInt(math.sqrt(w.toDouble).toLong), BigInt(w), thr(src))
    }.sortBy { case (s, w, _) => (s * led.map(_._2).max) / w }
    assert(rated.zip(rated.tail).forall {
      case ((sa, wa, ta), (sb, wb, tb)) =>
        (sa * wb > sb * wa) || ta <= tb // rate_a <= rate_b => t_a <= t_b
    }, s"thresholds disagree with the rational rate order: $rated")
    val expected = all.filter { case (id, src, _) => u8(id) < thr(src) }
      .map(_._1).sorted.toSeq
    val got = Assembly.temperatureMix(spark, dir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == expected, s"mix mismatch: got ${got.size}, expected ${expected.size}")
    assert(got.nonEmpty && got.size < all.length, "cut must be strict")
    // a tiny source under a huge budget caps at keep-all
    assert(Assembly.temperatureThresholds(
      Seq(("tiny", 4L), ("huge", 4000000L))).head._2 == "g0000000")
    assert(Assembly.temperatureThresholds(Seq.empty).isEmpty)
  }

  test("q39 threshold arithmetic: expected kept pieces never exceed the budget (200 random ledgers)") {
    val r = new scala.util.Random(4242)
    (1 to 200).foreach { trial =>
      val nSrc = 1 + r.nextInt(20)
      val led = (0 until nSrc).map { i =>
        // sizes spanning 10 orders of magnitude, with occasional zeros
        val w = if (r.nextInt(10) == 0) 0L
                else math.abs(r.nextLong()) % (1L << (4 + r.nextInt(36)))
        (s"s$i", w)
      }
      val thr = Assembly.temperatureThresholds(led)
      val budget = led.map(x => BigInt(x._2)).sum / 4
      // E[kept pieces from s] = w_s * t_s / 2^32 exactly (md5 uniform).
      // Uncapped the rates sum to the budget by construction; the
      // keep-all cap and the floor in each threshold only ever
      // UNDER-allocate, so the total expectation must never exceed it.
      val expKept = led.zip(thr).map { case ((_, w), (src2, hex)) =>
        val t = if (hex == "g0000000") Assembly.TempHashSpace
                else BigInt(java.lang.Long.parseLong(hex, 16))
        assert(t >= 0 && t <= Assembly.TempHashSpace, s"trial $trial $src2: t=$t")
        BigInt(w) * t / Assembly.TempHashSpace
      }.sum
      assert(expKept <= budget,
        s"trial $trial over-allocates: E[kept]=$expKept > budget=$budget ($led)")
    }
  }

  test("q40 split is constant within every dup cluster and matches the md5 replay") {
    import spark.implicits._
    val rows = DupClusters.leakSafeSplit(spark, plantedDir)
      .as[(Long, Long, String)].collect()
    val docs = spark.read.parquet(s"$plantedDir/documents.parquet").count()
    assert(rows.length == docs, "every doc gets a split")
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // THE leakage invariant: no cluster straddles two splits
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).toSet.size == 1,
        s"cluster $cid straddles splits: ${members.map(_._3).toSet}")
    }
    // the planted dups landed in real multi-member clusters, so the
    // invariant is exercised, not vacuous
    assert(rows.groupBy(_._2).exists(_._2.length > 1), "no multi-member cluster")
    // split replay from the cluster hash
    def u8(cid: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s"graft-split-$cid".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
    }
    rows.foreach { case (id, cid, split) =>
      val u = u8(cid)
      val want = if (u < DupClusters.SplitTrainHex) "train"
        else if (u < DupClusters.SplitValHex) "val" else "test"
      assert(split == want, s"doc $id cluster $cid: $split != $want")
    }
    // labels agree with q32's cluster assignment
    val q32 = DupClusters.clusters(spark, plantedDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cid, _) => assert(q32(id) == cid) }
  }

  test("q41 paragraph dedup: first occurrence wins across docs and within a doc; reassembly in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val B = Dedup.ParaTokens
    def blk(w: String) = Seq.fill(B)(w).mkString(" ")
    val banner = blk("banner")
    val docs = Seq(
      (1L, banner + " " + blk("alpha")),          // first banner: keeps both
      (2L, banner + " " + blk("beta")),           // banner drops, beta stays
      (3L, banner),                               // everything seen: empty
      (4L, blk("gamma") + " " + blk("gamma") + " tail")) // in-doc repeat + partial tail block
    val d = tmpDir("graft-paradedup")
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dedup.paraDedup(spark, d)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, banner + " " + blk("alpha")),
      (2L, 2L, 1L, blk("beta")),
      (3L, 1L, 0L, ""),
      (4L, 3L, 2L, blk("gamma") + " tail")), got.mkString("\n"))
  }

  test("q41 paragraph dedup matches an exact driver-side replay on real data") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val B = Dedup.ParaTokens
    // independent replay: plain Scala first-occurrence scan in (doc_id,
    // idx) order — the order the distributed min(struct) must reproduce
    val seen = scala.collection.mutable.HashSet.empty[String]
    val expected = all.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val blocks = toks.grouped(B).map(_.mkString(" ")).toSeq
      val keptB = blocks.filter(seen.add)
      (id, blocks.size.toLong, keptB.size.toLong, keptB.mkString(" "))
    }.toSeq
    val got = Dedup.paraDedup(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == expected,
      s"para dedup diverged from replay (got ${got.size}, want ${expected.size})")
    // the fixture actually exercises dedup: some doc loses a block
    assert(expected.exists(r => r._3 < r._2), "no duplicate blocks in fixture")
  }

  test("q36 centroid assignment == brute force; scoring plan is join-free and agg-free") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.centroidAssign(spark, dir)
    // scale gate: the scoring stage must not replicate rows per label
    // (no join) and must not re-aggregate (centroids are precollected) —
    // the only exchange is the oracle ORDER BY
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"row-replicating join in scoring:\n$plan")
    assert(!plan.contains("Aggregate"), s"aggregation in scoring:\n$plan")
    val got = out.as[(Long, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute force: double-avg centroids, float-quantized (the operator's
    // documented contract), cosine with float->double widening, argmax
    // with smallest-label tiebreak
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val cents: Map[Int, Array[Float]] = vecs.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      val m = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => m(i) += v._3(i).toDouble))
      l -> m.map(x => (x / vs.length).toFloat)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs.foreach { case (id, _, emb) =>
      val (bl, bc) = cents.toSeq
        .map { case (l, c) => (l, cos(emb, c)) }
        .minBy { case (l, c) => (-c, l) }
      val (gl, gc) = got(id)
      assert(gl == bl, s"vec $id: assigned $gl, brute force says $bl")
      assert(math.abs(gc - bc) < 5e-5, s"vec $id: cos $gc vs $bc")
    }
    assert(got.size == vecs.length)
  }

  test("q42 canonical-by-quality: exactly one canonical per cluster, and it is the (quality, n_chars, -id) argmax") {
    import spark.implicits._
    val rows = DupClusters.canonicalByQuality(spark, plantedDir)
      .as[(Long, Long, Double, Int)].collect()
    val nDocs = spark.read.parquet(s"$plantedDir/documents.parquet").count()
    assert(rows.length == nDocs, "every doc gets a row")
    // cluster labels agree with q32's assignment
    val q32 = DupClusters.clusters(spark, plantedDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cid, _, _) => assert(q32(id) == cid) }
    // quality values agree with q18's oracle-checked scorer
    val q18 = graft.operators.TextAnalysis.quality(spark, plantedDir)
      .select($"doc_id", $"quality", $"n_chars")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, _, q, _) =>
      assert(q == q18(id)._1, s"doc $id quality $q != q18 ${q18(id)._1}")
    }
    // THE invariant: one canonical per cluster, and it's the argmax on
    // (quality DESC, n_chars DESC, doc_id ASC)
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val canon = members.filter(_._4 == 1)
      assert(canon.length == 1, s"cluster $cid has ${canon.length} canonicals")
      val want = members.map(_._1)
        .minBy(id => (-q18(id)._1, -q18(id)._2, id))
      assert(canon.head._1 == want,
        s"cluster $cid canonical ${canon.head._1}, argmax says $want")
    }
    // exercised, not vacuous: a multi-member cluster exists
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
  }

  test("q43 kNN join == driver-side brute force, invariant to the blocking factor and k") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e.map(_.toDouble)) }
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def cosR(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      Similarity.r4(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    def brute(k: Int): Seq[(Long, Long, Double, Int)] =
      vecs.flatMap { case (id, v) =>
        vecs.filter(_._1 != id)
          .map { case (nbId, w) => (nbId, cosR(v, w)) }
          .sortBy { case (nbId, c) => (-c, nbId) }
          .take(k).zipWithIndex
          .map { case ((nbId, c), i) => (id, nbId, c, i + 1) }
      }.sortBy(r => (r._1, r._4)).toSeq
    val got = Similarity.knnJoin(spark, dir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got == brute(Similarity.KnnK),
      s"kNN mismatch: got ${got.size} rows, brute ${brute(Similarity.KnnK).size}")
    // block-count invariance: the partial top-k merge is exact for any
    // blocking, including one that splits every former co-resident pair
    val alt = Similarity.knnJoin(spark, dir, blocks = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(alt == got, "blocking factor changed the result")
    // non-default k
    val k1 = Similarity.knnJoin(spark, dir, k = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(k1 == brute(1), "k=1 mismatch")
  }

  test("q44 bloom dedup == exact replay; fpp-independent; bloom actually prunes; planted exact dups detected") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // exact replay: seen iff the digest exists on the corpus side
    val hs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", org.apache.spark.sql.functions.md5($"text").as("h"))
      .as[(Long, String)].collect()
    val corpusH = hs.filter(_._1 % 10 >= 2).map(_._2).toSet
    val want = hs.map { case (id, h) =>
      (id, h, if (corpusH(h)) 1 else 0)
    }.sortBy(_._1).toSeq
    val got = Dedup.bloomDedup(spark, dir)
      .as[(Long, String, Int)].collect().toSeq
    assert(got == want)
    assert(got.count(_._3 == 1) == hs.count(_._1 % 10 >= 2),
      "every corpus-side feed row re-offers an ingested digest")
    assert(got.exists(_._3 == 0), "novel rows exist")
    // fpp independence: a 64-bit everything-collides filter routes ALL
    // rows through the exact confirm join — byte-identical result
    val tiny = Dedup.bloomDedup(spark, dir, numBits = 64L)
      .as[(Long, String, Int)].collect().toSeq
    assert(tiny == got, "result depends on bloom fpp")
    // the prefilter earns its keep at default sizing: novel digests
    // (100 here) pass only at the fpp rate (~0.8% at 10 bits/key), so
    // nearly all are cut before the confirm join (deterministic: data,
    // xxhash64 and the bloom are all fixed)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", org.apache.spark.sql.functions.md5($"text").as("h")).filter($"doc_id" % 10 >= 2)
    val bloom = Dedup.corpusBloom(corpus, corpusH.size.toLong,
      corpusH.size.toLong * 10L)
    val pass = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.md5($"text").as("h"))
      .filter(Dedup.bloomMightContain(bloom, $"h")).count()
    val nCorpusRows = hs.count(_._1 % 10 >= 2)
    assert(pass >= nCorpusRows, "no false negatives")
    assert(pass < nCorpusRows + 20,
      s"bloom passed $pass rows; expected ~$nCorpusRows + a few fp")
    // planted corpus with exact dups straddling the split: feed copies
    // of ingested docs are seen even though doc ids differ
    val d = tmpDir("graft-bloom")
    val base = (0L until 30L).map(i => (i * 10L + 5L, s"ingested doc $i"))
    val copies = (0L until 10L).map(i => (i * 10L, s"ingested doc $i"))
    val novel = (0L until 10L).map(i => (i * 10L + 1L, s"novel doc $i"))
    (base ++ copies ++ novel).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val planted = Dedup.bloomDedup(spark, d)
      .as[(Long, String, Int)].collect()
    copies.foreach { case (id, _) =>
      assert(planted.find(_._1 == id).get._3 == 1, s"copy $id not seen")
    }
    novel.foreach { case (id, _) =>
      assert(planted.find(_._1 == id).get._3 == 0, s"novel $id seen")
    }
  }

  test("q46 SemDeDup: planted within-cluster dup families keep exactly the most-central member; zero-norm excluded") {
    import spark.implicits._
    val d = tmpDir("graft-semdedup")
    // two planted clusters around e0 / e1; {10,11} and {20,21} are
    // near-identical families, 12 is same-cluster but below tau (cos to
    // both family members ~0.30 < 0.35), 99 is the zero vector
    val rows = Seq(
      (10L, Array(1.0f, 0f, 0f, 0f), 0),
      (11L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (12L, Array(0.3f, 0f, 0.95f, 0f), 0),
      (20L, Array(0f, 1.0f, 0f, 0f), 1),
      (21L, Array(0f, 0.95f, 0f, 0.1f), 1),
      (99L, Array(0f, 0f, 0f, 0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Similarity.semDeDup(spark, d)
      .as[(Long, Int, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(99L), "zero-norm vector must be excluded")
    assert(got.size == 5)
    // each family loses exactly its LOWER-ranked member (rank =
    // cent_cos DESC, vec_id ASC within the cluster)
    Seq(Seq(10L, 11L), Seq(20L, 21L)).foreach { fam =>
      val flags = fam.map(id => got(id))
      assert(flags.map(_._4).sum == 1, s"family $fam flags $flags")
      val survivor = flags.filter(_._4 == 0).head
      val dropped = flags.filter(_._4 == 1).head
      val ord = Ordering.Tuple2[Double, Long]
      assert(ord.lt((-survivor._3, survivor._1), (-dropped._3, dropped._1)),
        s"survivor $survivor must outrank dropped $dropped")
    }
    assert(got(12L)._4 == 0, "below-tau member must survive")
    assert(got(12L)._2 == 0, "axis-e0 vector must assign to cluster 0")
  }

  test("q46 SemDeDup == exact driver replay on real data; plan is join-free (cogroup + one slim agg)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.semDeDup(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join in SemDeDup plan:\n$plan")
    // block-pair cogroup (one exchange per side) + the slim max(hit)
    // fold — nothing else may shuffle
    assert("hashpartitioning".r.findAllIn(plan).size == 3,
      s"expected the two cogroup exchanges plus the verdict fold:\n$plan")
    val got = out.as[(Long, Int, Double, Int)].collect().toSeq
    // exact replay of the operator's pinned semantics
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val cents: Seq[(Int, Array[Float])] = vecs.groupBy(_._2).map {
      case (l, vs) =>
        val dim = vs.head._3.length
        val m = new Array[Double](dim)
        vs.foreach(v => (0 until dim).foreach(i => m(i) += v._3(i).toDouble))
        l -> m.map(x => (x / vs.length).toFloat)
    }.toSeq.sortBy(_._1)
    // the expression's arithmetic: widen, ascending-order accumulate,
    // dot / (sqrt(na) * sqrt(nb)), then round(_, 4)
    def cosE(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      if (x >= 0) math.floor(x * 1e4 + 0.5) / 1e4
      else math.ceil(x * 1e4 - 0.5) / 1e4
    val members = vecs.flatMap { case (id, _, emb) =>
      val v = emb.map(_.toDouble)
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0.0) {
        val (cl, cc) = cents
          .map { case (l, c) => (l, r4(cosE(emb, c))) }
          .maxBy { case (l, c) => (c, -l) }
        Some((id, cl, cc, v, n))
      } else None
    }
    val expected = members.groupBy(_._2).toSeq.flatMap { case (cl, ms) =>
      val arr = ms.sortBy { case (id, _, cc, _, _) => (-cc, id) }
      arr.zipWithIndex.map { case ((id, _, cc, v, n), vi) =>
        val dup = arr.take(vi).exists { case (_, _, _, u, nu) =>
          var dot = 0.0; var k = 0
          while (k < v.length) { dot += u(k) * v(k); k += 1 }
          r4(dot / (nu * n)) >= Similarity.SemDupTau
        }
        (id, cl, cc, if (dup) 1 else 0)
      }
    }.sortBy(_._1)
    assert(got == expected,
      s"SemDeDup diverged from replay (got ${got.size}, want ${expected.size})")
    // exercised, not vacuous: dups AND survivors both exist
    assert(got.exists(_._4 == 1), "no semantic dup in the real table")
    assert(got.exists(_._4 == 0))
  }

  test("q46 SemDeDup is blockSize-invariant: multi-block triangle == single-block kernel") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // default block (clusters fit one block → the plain early-exit
    // scan) vs blockSize=2 (every cluster shatters into ~size/2 blocks,
    // exercising diagonal pairs, both off-diagonal scan directions and
    // the max(hit) fold) — the pairwise relation is exact, so results
    // must be identical
    val base = Similarity.semDeDup(spark, dir)
      .as[(Long, Int, Double, Int)].collect().toSeq
    val blocked = Similarity.semDeDup(spark, dir, blockSize = 2)
      .as[(Long, Int, Double, Int)].collect().toSeq
    assert(blocked == base,
      s"blocked diverged (${blocked.size} vs ${base.size} rows)")
    assert(base.exists(_._4 == 1) && base.exists(_._4 == 0))
  }

  test("q46 SemDeDup: 1e5-member single-cluster dup family — task memory O(block), candidate work exactly n*(nb+1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    import scala.jdk.CollectionConverters._
    val d = tmpDir("graft-semdedup-big")
    // one dominant boilerplate family: every vector is within tau of
    // every other (cos ~ 1.0 after r4), all in one cluster — exactly
    // the shape that OOM'd a single task under the old per-cluster
    // kernel. Deterministic: no rand.
    val n = 100000
    spark.range(n).select(
      $"id".as("vec_id"),
      array(lit(1.0f),
        ($"id" % 7).cast("float") * lit(1e-3f)).as("embedding"),
      lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val acc = spark.sparkContext
      .collectionAccumulator[java.lang.Integer]("semdedup-group-sizes")
    Similarity.semDupProbe = Some(acc)
    try {
      val rows = Similarity.semDeDup(spark, d)
        .as[(Long, Int, Double, Int)].collect()
      assert(rows.length == n)
      val survivors = rows.filter(_._4 == 0)
      assert(survivors.length == 1,
        s"one family must keep one representative, got ${survivors.length}")
      assert(survivors.head._1 == 0L,
        "tie on cent_cos breaks to the smallest vec_id")
      val sizes = acc.value.asScala.map(_.toInt)
      val nb = (n + Similarity.SemDupBlock - 1) / Similarity.SemDupBlock
      assert(sizes.size == nb * (nb + 1) / 2,
        s"expected the full block triangle, got ${sizes.size} groups")
      // memory gate: a task holds at most two blocks of vectors, never
      // the cluster (sequential ids → exactly n/nb per block)
      assert(sizes.max <= 2 * (n / nb + 1),
        s"group of ${sizes.max} exceeds two blocks")
      // candidate-work gate: triangle replication ships exactly
      // n*(nb+1) member rows through the kernel — linear in
      // members x blocks, not members^2
      assert(sizes.map(_.toLong).sum == n.toLong * (nb + 1),
        s"kernel saw ${sizes.map(_.toLong).sum} rows, want ${n.toLong * (nb + 1)}")
    } finally Similarity.semDupProbe = None
  }

  test("q47 semantic decontam == exact replay; plan is map-only (no join, no agg); empty bench safe") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.semDecontam(spark, dir)
    // scale gate: the bench side is a driver-resident literal matrix, so
    // scoring must not replicate rows (no join) and must not aggregate;
    // the only exchange is the oracle ORDER BY (range, not hash)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"row-replicating join in scoring:\n$plan")
    assert(!plan.contains("Aggregate"), s"aggregation in scoring:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"unexpected hash exchange in a map-only operator:\n$plan")
    val got = out.as[(Long, Double, Long, Int)].collect().toSeq
    // exact replay with the expression's arithmetic (widen, ascending
    // accumulate, round(_, 4))
    def cosE(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      if (x >= 0) math.floor(x * 1e4 + 0.5) / 1e4
      else math.ceil(x * 1e4 - 0.5) / 1e4
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
      .filter { case (_, e) => e.exists(_ != 0f) }
    val bench = vecs.filter(_._1 < Similarity.BenchVecN).sortBy(_._1).map(_._2)
    val expected = vecs.filter(_._1 >= Similarity.BenchVecN)
      .map { case (id, e) =>
        val cs = bench.map(b => r4(cosE(e, b)))
        val hits = cs.count(_ >= Similarity.DecontamTau).toLong
        (id, cs.max, hits, if (cs.max >= Similarity.DecontamTau) 1 else 0)
      }.sortBy(_._1).toSeq
    assert(got == expected,
      s"decontam diverged from replay (got ${got.size}, want ${expected.size})")
    // exercised: the fixture has contaminated AND clean corpus vectors
    assert(got.exists(_._4 == 1), "no contaminated vector in fixture")
    assert(got.exists(_._4 == 0), "every vector contaminated in fixture")
    // n_hits is consistent with the flag and bounded by the bench size
    assert(got.forall(r => (r._3 > 0) == (r._4 == 1)))
    assert(got.forall(_._3 <= Similarity.BenchVecN))
    // empty bench (benchN = 0 keeps no bench vectors... every corpus row
    // scores 0 hits) stays typed instead of a zero-arg greatest() error
    val empty = Similarity.semDecontam(spark, dir, benchN = 0)
      .as[(Long, Double, Long, Int)].collect()
    assert(empty.length == vecs.length && empty.forall(_._4 == 0))
  }

  test("q48 kNN label propagation == brute-force vote; votes bounded by k") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.knnClassify(spark, dir)
      .as[(Long, Int, Long)].collect().toSeq
    def cosR(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      if (c >= 0) math.floor(c * 1e4 + 0.5) / 1e4
      else math.ceil(c * 1e4 - 0.5) / 1e4
    }
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
      .filter { case (_, _, e) => e.exists(_ != 0f) }
    val byId = vecs.map(v => v._1 -> v._2).toMap
    val expected = vecs.map { case (id, _, e) =>
      val nbs = vecs.filter(_._1 != id)
        .map { case (nbId, _, w) => (nbId, cosR(e, w)) }
        .sortBy { case (nbId, c) => (-c, nbId) }
        .take(Similarity.KnnK)
      // exact-integer vote score on the r4 lattice, the operator's
      // documented tiebreak (votes DESC, score DESC, label ASC)
      val (lbl, (votes, _)) = nbs
        .groupBy { case (nbId, _) => byId(nbId) }
        .map { case (l, ns) =>
          l -> ((ns.length.toLong,
            ns.map { case (_, c) => math.round(c * 1e4) }.sum))
        }.toSeq
        .maxBy { case (l, (v, s)) => (v, s, -l) }
      (id, lbl, votes)
    }.sortBy(_._1).toSeq
    assert(got == expected,
      s"kNN vote diverged from brute force (got ${got.size} rows)")
    assert(got.forall(r => r._3 >= 1 && r._3 <= Similarity.KnnK))
    // exercised: unanimous votes AND split votes both occur
    assert(got.exists(_._3 == Similarity.KnnK), "no unanimous vote")
    assert(got.exists(_._3 < Similarity.KnnK), "no split vote")
    // plan gates: the global rank's shuffle is k-bounded (Spark pushes
    // a PARTIAL WindowGroupLimit below the exchange, so only k rows per
    // vec_id per task ride it), and the label join never degrades to a
    // cartesian
    val plan = Similarity.knnClassify(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank window is not k-bounded before the exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"label join degraded to a cartesian:\n$plan")
  }

  test("q49 snapshot diff == exact replay; all four statuses exercised; text never shuffles") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Versioning.snapshotDiff(spark, dir)
    // scale gate: both sides reduce to (doc_id, digest) BEFORE the
    // exchange — the join's shuffle must not carry the text column.
    // EnsureRequirements inserts the join's exchanges directly above
    // the SMJ children, so each child's output IS the shuffled payload
    // (checked on sparkPlan: AQE wraps executedPlan in a leaf node)
    val smj = out.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.size == 1 && smj.head.joinType.sql == "FULL OUTER",
      s"expected one full-outer sort-merge join:\n${out.queryExecution.sparkPlan}")
    val shuffled = smj.head.left.output ++ smj.head.right.output
    assert(!shuffled.exists(_.name == "text"),
      s"text column rides the diff shuffle: $shuffled")
    assert(shuffled.count(_.name.endsWith("_digest")) == 2,
      s"digests must be computed below the join: $shuffled")
    val got = out.as[(Long, Option[String], Option[String], String)]
      .collect().toSeq
    // replay from first principles on the documents table
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val oldSnap = docs.filter(_._1 % 13 != 0).map { case (id, t) =>
      id -> md5hex(if (id % 7 == 0) t + " [old-rev]" else t)
    } ++ docs.filter(_._1 % 17 == 0).map { case (id, t) =>
      (-id - 1) -> md5hex(t)
    }
    val newSnap = docs.map { case (id, t) => id -> md5hex(t) }
    val oldM = oldSnap.toMap; val newM = newSnap.toMap
    val expected = (oldM.keySet ++ newM.keySet).toSeq.sorted.map { id =>
      val (o, n) = (oldM.get(id), newM.get(id))
      val st =
        if (o.isEmpty) "added"
        else if (n.isEmpty) "removed"
        else if (o == n) "same" else "changed"
      (id, o, n, st)
    }
    assert(got == expected,
      s"snapshot diff diverged (got ${got.size}, want ${expected.size})")
    // the fixture plants every regime
    Seq("added", "removed", "changed", "same").foreach { s =>
      assert(got.exists(_._4 == s), s"no '$s' row in fixture")
    }
    // digests are present exactly where the side exists
    assert(got.forall(r => r._2.isEmpty == (r._4 == "added")))
    assert(got.forall(r => r._3.isEmpty == (r._4 == "removed")))
  }
}
