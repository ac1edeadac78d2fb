package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Fingerprints

/** Deduplication operator family over the `documents` table — the
  * training-data-pipeline ops the builder prompt makes first-class:
  * exact (hash groupBy), n-gram Jaccard (shingle inverted-index join),
  * MinHash+LSH (band-bucket join), SimHash (bit-chunk pigeonhole join).
  *
  * Scale design notes (100 TB / 1000-executor framing):
  *  - exact dedup is ONE hash aggregate on a 128-bit digest — no text
  *    shuffle, map-side partial agg does the heavy lifting;
  *  - Jaccard candidates come from a shingle inverted index with a
  *    hot-shingle cap (df <= MaxShingleDf) so no quadratic blowup on
  *    boilerplate shingles (the same skew logic as the index build);
  *  - MinHash/LSH shuffles fixed-width signatures (k longs/doc), never
  *    the text, joins on band keys only, and bounds oversized band
  *    buckets (giant dup clusters) with representative star edges so no
  *    bucket ever enumerates O(s²) pairs;
  *  - SimHash near-dup join uses the 4×16-bit pigeonhole chunks, so
  *    candidates are equal-chunk hash-join buckets, not a cross join.
  */
object Dedup {

  // ---- q10: exact dedup ---------------------------------------------

  def exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("cnt"), min($"doc_id").as("keep_id"))
      .orderBy($"h")
  }

  val exactSql: String =
    """SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  // ---- q11: word-bigram Jaccard near-dup ----------------------------

  /** Hot-shingle df cap. Known recall boundary, pinned by fixture
    * (TrainingOpsSpec "q11 giant-cluster regime"): a near-dup CLUSTER
    * larger than this has ALL its shingles capped away (each shingle's
    * df >= cluster size), so q11 reports no pairs inside it — by
    * design: shingles shared by 50+ docs are uninformative boilerplate
    * for pairwise Jaccard, and giant exact/near clusters are owned by
    * q10 (exact digest) and q12 (MinHash+LSH, whose [[MaxBandBucket]]
    * star path is built for precisely that regime) feeding q32
    * clustering. */
  val MaxShingleDf = 50
  val JaccardMin = 0.2
  val TopPairs = 100

  /** Distinct word-bigram shingles per doc (docs with >= 2 tokens). */
  private def shingleDf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        split(lower($"text"), "\\s+").as("toks"))
      .select($"doc_id", expr("filter(toks, t -> t <> '')").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"
      )).as("sh"))
      // no-op filters (concat of non-null tokens is never null), stated
      // EXPLICITLY so every consumer's subtree is canonically identical:
      // the anti-join below injects isnotnull(sh) on its side only,
      // which otherwise blocks ReusedExchange from collapsing this
      // distinct's two consumers (anti-join left + hot-set groupBy)
      // into one executed exchange — the ladder measured the full
      // shingle relation shuffling twice without it
      .filter($"sh".isNotNull && $"doc_id".isNotNull)
      .distinct()
  }

  /** The pair dataflow as a PURE lazy plan — `pin` marks the two
    * multi-consumer intermediates (the distinct shingle relation and the
    * hot set); [[jaccardPairsAll]] passes persist, plan-inspection tests
    * pass identity. */
  private[operators] def jaccardPairsPlan(spark: SparkSession, dir: String,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    import spark.implicits._
    // PIN the distinct shingle relation: it has two direct consumers
    // (the hot-set aggregate and the anti-join left side) and everything
    // downstream re-derives it again through `capped` (self-join a/b
    // sides + per-doc sizes). Without a pin, whether Catalyst executes
    // the scan → explode → dedup exchange once or several times is
    // canonicalization luck — worse, PushDownLeftSemiAntiJoin rewrites
    // the anti-join's copy (dedup pushed above the join, raw rows
    // re-keyed by sh ALONE — a skew trap: a 10⁹-instance boilerplate
    // shingle would land in one task), so that copy can never reuse the
    // hot side's exchange. The round-5 data-scaling ladder measured 1
    // executed copy at 1× corpus vs 3 at 4× — a phantom 12× shuffle
    // read. The cache is the same magnitude as the one dedup shuffle
    // the operator must do anyway (serialized, disk-spilling), executes
    // exactly once, and the cache barrier stops the skew-unsafe rewrite.
    val sh = pin(shingleDf(spark, dir))
    // hot-shingle cap: boilerplate shingles would otherwise create
    // quadratic candidate buckets (skew handling, cf. salted build).
    // The hot SET is computed with a partial-aggregating groupBy — the
    // shuffle carries (sh, partial count), not full rows — and removed
    // with an anti-join; a count window over sh would instead
    // sort-shuffle every (doc_id, sh) row. The hot set is bounded by
    // total shingle rows / MaxShingleDf and Zipf-small in practice, so
    // AQE turns the anti-join into a broadcast at runtime.
    // hot is pinned too — tiny, but referenced by every anti-join
    // instance below; unpinned, the ladder measured its partial-agg
    // exchange executing four times (once per capped consumer).
    val hot = pin(sh.groupBy($"sh").agg(count(lit(1)).as("sdf"))
      .filter($"sdf" > MaxShingleDf).select($"sh"))
    val capped = sh.join(hot, Seq("sh"), "left_anti")
      .select($"doc_id", $"sh")
    val sizes = capped.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val a = capped.as("a"); val b = capped.as("b")
    val inter = a.join(b, $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "szb"), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"inter" / ($"sza" + $"szb" - $"inter"), 4).as("jaccard"))
      .filter($"jaccard" >= JaccardMin)
  }

  /** Full near-dup pair set (jaccard >= [[JaccardMin]]), no top-k cap —
    * the edge list [[DupClusters]] clusters over; q11 is this plus its
    * presentation ordering/limit. Materializes EAGERLY: the (small,
    * near-dup-edge-sized) pair table is checkpointed in one job so the
    * pinned intermediates' cache lifecycle is deterministic — populate,
    * drain, release. Local checkpoint by default; a session with a
    * reliable checkpoint dir (the norm on preemptible clusters)
    * checkpoints there instead — same switch and same final-table file
    * lifetime as DupClusters' contraction rounds (reclaimed with the
    * dir). */
  private[operators] def jaccardPairsAll(spark: SparkSession, dir: String): DataFrame = {
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val pairs = jaccardPairsPlan(spark, dir, { df =>
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      pinned += p
      p
    })
    val out =
      if (spark.sparkContext.getCheckpointDir.isDefined) pairs.checkpoint()
      else pairs.localCheckpoint()
    pinned.foreach(_.unpersist(blocking = false))
    out
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jaccardPairsAll(spark, dir)
      .orderBy($"jaccard".desc, $"doc_a", $"doc_b")
      .limit(TopPairs)
  }

  /** Shared CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — the
    * q11 oracle presents it top-k, the q32 oracle clusters over it. */
  private[operators] val jaccardPairCtes: String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |sh0 AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(arr)), i -> arr[i] || ' ' || arr[i+1])) AS sh
       |  FROM toks WHERE len(arr) >= 2),
       |capped AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS sdf FROM sh0)
       |  WHERE sdf <= $MaxShingleDf),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= $JaccardMin)""".stripMargin

  val ngramJaccardSql: String =
    s"""WITH $jaccardPairCtes
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |ORDER BY jaccard DESC, doc_a, doc_b
       |LIMIT $TopPairs""".stripMargin

  // ---- q12: MinHash + LSH near-dup (not SQL-expressible) ------------

  val MinhashK = 32
  val Bands = 8
  val RowsPerBand = 4
  val LshJaccardMin = 0.5

  /** Band-bucket size cap. A band bucket of size s would enumerate
    * s(s-1)/2 candidate pairs in the self-join — a 1M-member duplicate
    * cluster (exactly the thing dedup runs FOR on crawl corpora) pushes
    * ~5·10¹¹ rows through ONE band key. Buckets over the cap skip pair
    * enumeration entirely: every member collided with the bucket
    * minimum on a FULL band (all [[RowsPerBand]] signature rows), so
    * (rep, member) is a near-certain dup; the star edges keep candidate
    * count O(s) per bucket and [[DupClusters.starContract]] recovers
    * the full cluster transitively. Same skew discipline as q11's
    * MaxShingleDf and the salted index shuffle. The trade: within an
    * oversized bucket q12 reports only (rep, member) pairs, not all
    * member×member pairs — clustering (q32), not the raw pair list, is
    * the consumer that matters in that regime. */
  val MaxBandBucket = 1000

  /** LSH candidate pairs BEFORE exact-Jaccard verification — exposed so
    * the skew fixture can assert candidate-row counts stay O(cluster)
    * on a planted oversized dup cluster. */
  private[operators] def lshCandidates(spark: SparkSession, dir: String,
                                       maxBucket: Int): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
    // fixed-width signatures; the text never shuffles
    val sigs = docs.map { case (id, text) =>
      val sh = Fingerprints.shingles(text, 2)
      (id, Fingerprints.minhash(sh, MinhashK))
    }.toDF("doc_id", "sig")
    val bandKeys = sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      Fingerprints.lshBands(sig, Bands, RowsPerBand).map(k => (k, id))
    }.toDF("band", "doc_id")
    // ONE shuffle co-locates each band bucket (16 B rows), sorted so
    // the bucket-min representative arrives first; pairs are enumerated
    // per bucket with the size cap applied inline. A first cut of the
    // cap used a count agg + anti-join + star join over bandKeys — that
    // recomputed the minhash kernel five times and tripled the shuffles
    // (measured q12 1.57 s -> 2.95 s at sf0.1); this shape computes the
    // signatures once and shuffles the band rows once. Per-task state
    // is one <= maxBucket+1 id buffer: small buckets emit all pairs
    // from it, oversized buckets emit (rep, member) star edges
    // STREAMING (buffered prefix + remaining rows as they arrive), so
    // a 10^6-member dup cluster costs O(cluster) rows and O(cap)
    // memory, never O(cluster^2) rows or an O(cluster) buffer.
    val cand = bandKeys
      .repartition($"band")
      .sortWithinPartitions($"band", $"doc_id")
      .as[(Long, Long)]
      .mapPartitions { it =>
        new Iterator[(Long, Long)] {
          private var pending: Iterator[(Long, Long)] = Iterator.empty
          private var row: (Long, Long) = if (it.hasNext) it.next() else null
          private def step(): Unit =
            row = if (it.hasNext) it.next() else null
          def hasNext: Boolean = {
            while (!pending.hasNext && row != null) advanceBucket()
            pending.hasNext
          }
          def next(): (Long, Long) = { hasNext; pending.next() }
          private def advanceBucket(): Unit = {
            val band = row._1
            val rep = row._2 // ascending sort: first id IS the bucket min
            val buf = new scala.collection.mutable.ArrayBuffer[Long]
            buf += rep; step()
            while (row != null && row._1 == band && buf.size <= maxBucket) {
              buf += row._2; step()
            }
            pending =
              if (buf.size > maxBucket) {
                // oversized: star-link everything to the representative
                val rest = new Iterator[(Long, Long)] {
                  def hasNext: Boolean = row != null && row._1 == band
                  def next(): (Long, Long) = { val id = row._2; step(); (rep, id) }
                }
                buf.iterator.drop(1).map(id => (rep, id)) ++ rest
              } else {
                val ids = buf.toArray
                ids.indices.iterator.flatMap(i =>
                  (i + 1 until ids.length).iterator.map(j => (ids(i), ids(j))))
              }
          }
        }
      }.toDF("doc_a", "doc_b")
    cand.distinct()
  }

  def minhashLsh(spark: SparkSession, dir: String,
                 maxBucket: Int = MaxBandBucket): DataFrame = {
    import spark.implicits._
    val cand = lshCandidates(spark, dir, maxBucket)
    // verify candidates with exact Jaccard (text joined back only for
    // the small candidate set)
    val txt = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    cand
      .join(txt.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("text", "ta"), "doc_a")
      .join(txt.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("text", "tb"), "doc_b")
      .select($"doc_a", $"doc_b", $"ta", $"tb") // joins reorder key cols
      .as[(Long, Long, String, String)]
      .map { case (aId, bId, ta, tb) =>
        val j = Fingerprints.jaccard(
          Fingerprints.shingles(ta, 2), Fingerprints.shingles(tb, 2))
        (aId, bId, math.rint(j * 10000) / 10000)
      }.toDF("doc_a", "doc_b", "jaccard")
      .filter($"jaccard" >= LshJaccardMin)
      .orderBy($"jaccard".desc, $"doc_a", $"doc_b")
  }

  // ---- q13: SimHash fingerprints (not SQL-expressible) --------------

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .map { case (id, text) =>
        val fp = Fingerprints.simhash(text)
        (id, f"$fp%016x")
      }.toDF("doc_id", "simhash")
      .orderBy($"doc_id")
  }

  /** 64-bit simhash split for the pair join: 6 chunks (4×11 + 2×10
    * bits) and all C(6,3)=20 three-chunk combinations as join keys. */
  private[operators] val SimChunkOffsets = Array(0, 11, 22, 33, 44, 54)
  private[operators] val SimChunkBits = Array(11, 11, 11, 11, 10, 10)
  private val SimCombos: Array[(Int, Int, Int)] =
    (for { i <- 0 until 6; j <- i + 1 until 6; k <- j + 1 until 6 }
      yield (i, j, k)).toArray

  /** The 20 packed combo keys of one fingerprint (shared by the join
    * and the scheme's property test). */
  private[operators] def simKeys(fp: Long): Array[Long] = {
    val c = Array.tabulate(6)(i =>
      (fp >>> SimChunkOffsets(i)) & ((1L << SimChunkBits(i)) - 1))
    Array.tabulate(SimCombos.length) { t =>
      val (i, j, k) = SimCombos(t)
      // pack into uniform 11-bit slots under the 5-bit table id
      ((t * 2048L + c(i)) * 2048L + c(j)) * 2048L + c(k)
    }
  }

  /** SimHash near-dup pairs via Manku-style multi-table keys (Manku,
    * Jain, Das Sarma, "Detecting Near-Duplicates for Web Crawling",
    * WWW'07 §3): hamming <= 3 flips bits in at most 3 of the 6 chunks,
    * so at least one of the 20 three-chunk combinations is intact in
    * BOTH fingerprints — candidates equi-join on the packed
    * (combo, chunk_i, chunk_j, chunk_k) key, then verify exact hamming.
    *
    * Why not the simpler 4×16-bit single-chunk pigeonhole (the previous
    * form): its per-key population is corpus/2^16 — at 10^12 docs a hot
    * 16-bit chunk value (e.g. the all-zeros chunk of short docs) holds
    * millions of members and the self-join enumerates its pairs
    * quadratically, the exact q12-class skew hazard. A chunk-value cap
    * is NOT available here: unlike q12's full-band collisions, one
    * matching chunk is no evidence of near-duplication, so capped
    * members couldn't be star-linked without wrecking precision, and
    * dropping them wrecks the recall GUARANTEE. Longer keys dissolve
    * the problem instead: ~37-bit keys put corpus/2^33 docs in a
    * bucket (~hundreds at 10^12), at the price of 20 key rows per doc
    * vs 4 — linear replication traded for the removal of a quadratic
    * tail. The hamming <= 3 guarantee is exactly the 6-choose-3 design;
    * a larger radius needs more chunks (C(h+3, 3) tables), which is why
    * `maxHamming` beyond 3 only FILTERS more loosely without extending
    * the recall guarantee. */
  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val fps = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .map { case (id, text) => (id, Fingerprints.simhash(text)) }
      .toDF("doc_id", "fp")
    val keys = fps.as[(Long, Long)].flatMap { case (id, fp) =>
      simKeys(fp).iterator.map(k => (k, id, fp))
    }.toDF("k", "doc_id", "fp")
    keys.as("a").join(keys.as("b"),
        $"a.k" === $"b.k" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.fp".as("fa"), $"b.fp".as("fb"))
      .distinct()
      .as[(Long, Long, Long, Long)]
      .map { case (aId, bId, fa, fb) => (aId, bId, Fingerprints.hamming(fa, fb)) }
      .toDF("doc_a", "doc_b", "hamming")
      .filter($"hamming" <= maxHamming)
      .orderBy($"hamming", $"doc_a", $"doc_b")
  }

  // ---- q14: embedding-cosine near-dup -------------------------------

  val CosMin = 0.3

  /** Per-task vector budget for the triangle blocking: a task holds two
    * blocks of ~n/blocks vectors each, so ~2·(n/blocks) ≤ this. 64k
    * dim-64 double vectors ≈ 32 MB — comfortably inside one executor
    * core's working memory with room for the task's output buffer. */
  val CosTaskVectors: Long = 1L << 16

  /** Triangle-blocking factor DERIVED from the corpus size (round-2
    * review: a fixed `CosBlocks = 8` pinned test scale). Replication
    * cost is blocks+1 rows per vector, so the derivation picks the
    * SMALLEST block count whose block pairs fit the per-task budget;
    * the floor of 8 keeps 36 concurrent tasks at test scale. At 10^9
    * vectors this yields ~30.5k blocks — large, but exact all-pairs at
    * that size is an O(n²) choice the caller makes knowingly (see
    * scaladoc below); the approximate family is the default scale path. */
  def cosBlocksFor(n: Long): Int =
    math.max(8L, (2 * n + CosTaskVectors - 1) / CosTaskVectors).toInt

  /** Pairwise exact cosine over the embeddings table, fully distributed.
    *
    * Execution: classic triangle partitioning for exact all-pairs
    * similarity — each vector is assigned a block (vec_id mod CosBlocks)
    * and replicated to every block-PAIR key it participates in; an
    * equi-join on the pair key hands each task exactly two blocks, and
    * the per-pair kernel is a primitive double loop. Nothing is
    * collected to the driver and no corpus-sized broadcast exists (the
    * round-1 version did both — the anti-pattern this replaces).
    *
    * Exactness at threshold 0.3 rules out LSH candidate generation (no
    * sign-LSH banding has recall 1 at 72° angles), so the distributed
    * exact join IS the operator; the approximate scale paths for higher
    * thresholds are q12 (MinHash), q13 (SimHash) and q15/q16/q24 (ANN).
    * Exact all-pairs is inherently O(n^2) compute — the blocking
    * distributes it evenly with bounded task memory.
    *
    * Dot products accumulate in index order, so results are
    * bit-identical to the SQL oracle's double semantics.
    *
    * `blocks` <= 0 derives the factor from a count() of the table (a
    * column-pruned metadata-cheap pass) via [[cosBlocksFor]]; pass an
    * explicit value to pin it. Zero-norm vectors are dropped BEFORE the
    * pair replication: their cosine is undefined (NaN in the native
    * expression, same in DuckDB), NaN can never reach the threshold, so
    * filtering them early documents the semantics and skips blocks+1
    * replicas plus n dot products per dead vector. */
  def embeddingCosine(spark: SparkSession, dir: String,
                      blocks: Int = 0): DataFrame = {
    import spark.implicits._
    val nb =
      if (blocks > 0) blocks
      else cosBlocksFor(spark.read.parquet(s"$dir/embeddings.parquet").count())
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val v = e.map(_.toDouble)
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(s))
      }
      .filter(_._3 > 0.0)
    // row block: a vector in block bi serves keys (bi, bi..nb-1);
    // column block: keys (0..bj, bj). Every unordered block pair meets
    // exactly once, diagonal pairs dedup on id order below. cogroup
    // (not an equi-join producing pair ROWS) so each vector is
    // deserialized once per block-pair, not once per pair — the
    // per-pair work stays a primitive double loop over in-memory
    // arrays.
    // floorMod, not %: a negative vec_id under % yields a negative
    // block index no right-side row carries — pairs silently vanish
    val left = vecs.flatMap { case (id, v, n) =>
      val bi = java.lang.Math.floorMod(id, nb.toLong).toInt
      (bi until nb).iterator.map(bj => (bi * nb + bj, id, v, n))
    }
    val right = vecs.flatMap { case (id, v, n) =>
      val bj = java.lang.Math.floorMod(id, nb.toLong).toInt
      (0 to bj).iterator.map(bi => (bi * nb + bj, id, v, n))
    }
    val thresh = CosMin
    left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) {
      case (pk, as, bs) =>
        val av = as.toArray
        val bv = bs.toArray
        val diag = (pk / nb) == (pk % nb)
        av.iterator.flatMap { case (_, ida, va, na) =>
          bv.iterator.flatMap { case (_, idb, vb, nbn) =>
            if (diag && ida >= idb) None
            else {
              var dot = 0.0; var i = 0
              while (i < va.length) { dot += va(i) * vb(i); i += 1 }
              // HALF_UP to match Spark round()/DuckDB round() semantics
              val cos = math.floor(dot / (na * nbn) * 10000 + 0.5) / 10000
              if (cos >= thresh)
                Some((math.min(ida, idb), math.max(ida, idb), cos))
              else None
            }
          }
        }
    }.toDF("vec_a", "vec_b", "cos")
      .orderBy($"cos".desc, $"vec_a", $"vec_b")
  }

  // DOUBLE[] casts: DuckDB computes float32 on FLOAT lists otherwise
  val embeddingCosineSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= $CosMin
       |ORDER BY cos DESC, vec_a, vec_b""".stripMargin

  // --- q27: benchmark decontamination ------------------------------------

  /** Deterministic stand-in for the held-out benchmark set: every
    * doc_id ≡ 0 (mod 7). In a real pipeline this is the fixed eval
    * suite, not a corpus slice. */
  val DecontamBenchMod = 7
  val DecontamGram = 8

  /** q27: decontamination — flag training docs that share at least one
    * word-8-gram with the benchmark set, with the count of distinct
    * overlapping 8-grams (the standard n-gram-overlap decontamination
    * check run before training). Distinct per-doc 8-grams join the
    * benchmark's 8-gram set on the gram; counts partial-aggregate
    * map-side. In a real deployment the benchmark set is a FIXED small
    * eval suite, so its gram set is broadcast and the corpus side never
    * shuffles; here the "benchmark" is a corpus slice that grows with
    * the input, so no broadcast hint is planted — AQE picks one at
    * runtime when the built side fits. */
  def decontam(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // raw (doc, gram) stream — deliberately NOT distinct'd: a corpus-wide
    // distinct would shuffle every gram row; instead raw grams join the
    // (small) benchmark gram set — broadcast under AQE, so the corpus
    // side never shuffles — and per-doc countDistinct dedups only the
    // matched survivors in the (partial-aggregating) count
    val g8raw = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", split(lower($"text"), "\\s+").as("toks"))
      .select($"doc_id", expr("filter(toks, t -> t <> '')").as("a"))
      .filter(size($"a") >= DecontamGram)
      .select($"doc_id", explode(expr(
        s"transform(sequence(0, size(a)-$DecontamGram), " +
          s"i -> concat_ws(' ', slice(a, i+1, $DecontamGram)))")).as("g"))
    val bench = g8raw.filter($"doc_id" % DecontamBenchMod === 0)
      .select($"g").distinct()
    g8raw.filter($"doc_id" % DecontamBenchMod =!= 0)
      .join(bench, "g")
      .groupBy($"doc_id").agg(countDistinct($"g").as("n_overlap8"))
      .orderBy($"doc_id")
  }

  val decontamSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |g8 AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(arr) - ${DecontamGram - 2}),
       |    i -> array_to_string(arr[i:i+${DecontamGram - 1}], ' '))) AS g
       |  FROM toks WHERE len(arr) >= $DecontamGram),
       |bench AS (SELECT DISTINCT g FROM g8 WHERE doc_id % $DecontamBenchMod = 0)
       |SELECT doc_id, count(*) AS n_overlap8
       |FROM g8 JOIN bench USING (g)
       |WHERE doc_id % $DecontamBenchMod <> 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- q35: exact-substring duplicated-span coverage -----------------

  /** Window (in word tokens) of the positional gram index. 8 keeps the
    * sandbox corpus meaningful; production substring dedup uses ~50
    * tokens (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — their suffix-array ExactSubstr
    * threshold), a one-constant change. */
  val SpanW = 8

  /** q35: per-doc duplicated-SPAN coverage — the exact-substring dedup
    * measurement (Lee et al. 2022): a token position is "duplicated" if
    * it sits inside any [[SpanW]]-token window whose text occurs more
    * than once in the corpus (across docs OR repeated within one doc).
    * Reports per-doc duplicated-token count and fraction — the signal
    * substring-level dedup filters/trims on, where q10-q13 only judge
    * whole documents.
    *
    * Spark shape (the suffix-array of the paper replaced by what a
    * cluster does well):
    *  1. positional W-grams via builtin HOFs (transform/slice/
    *     array_join + posexplode) — fully codegen'd, text never
    *     shuffles past this projection;
    *  2. duplicated-gram set = groupBy(gram).count > 1 — map-side
    *     partial agg absorbs hot grams (boilerplate spans combine
    *     before the shuffle), membership only, so no df cap is needed;
    *  3. LEFT SEMI join of the positional stream against the dup set —
    *     output is at most the gram stream, never a pair blowup;
    *  4. interval union per doc (gaps-and-islands: running max(e) over
    *     a doc-PARTITIONED window — bounded by one doc's token count,
    *     never corpus-sized) → summed island lengths.
    * At 100 TB the grouping key becomes xxhash64(gram) (collision odds
    * ~1e-9 at 10^12 grams; documented knob, exact strings here so the
    * DuckDB oracle matches bit-for-bit) and W rises to 50. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"),
        filter(split(lower($"text"), "\\s+"), t => t =!= "").as("arr"))
    val grams = toks.filter(size($"arr") >= SpanW)
      .select($"doc_id", posexplode(transform(
        sequence(lit(0), size($"arr") - SpanW),
        i => array_join(slice($"arr", i + 1, lit(SpanW)), " "))).as(Seq("pos", "g")))
    val dup = grams.groupBy($"g")
      .agg(count(lit(1)).as("c")).filter($"c" > 1).select($"g")
    val iv = grams.join(dup, Seq("g"), "left_semi")
      .select($"doc_id", $"pos".cast("long").as("s"),
        ($"pos" + SpanW - 1).cast("long").as("e"))
    val w = Window.partitionBy($"doc_id").orderBy($"s", $"e")
    val marked = iv
      .withColumn("pmax",
        max($"e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when($"s" > coalesce($"pmax", lit(-1L)), 1L).otherwise(0L))
    val cov = marked.withColumn("island", sum($"ni").over(w))
      .groupBy($"doc_id", $"island")
      .agg((max($"e") - min($"s") + 1L).as("len"))
      .groupBy($"doc_id").agg(sum($"len").as("dup_tokens"))
    toks.select($"doc_id", size($"arr").cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        // zero-token guard: an empty/all-whitespace doc would divide
        // 0/0 (ANSI abort in Spark 4, NULL in DuckDB — either way the
        // bit-exact oracle compare breaks); such a doc has no spans,
        // so its duplicated fraction is 0 by definition
        when($"n_tokens" > 0,
          round(coalesce($"dup_tokens", lit(0L)) / $"n_tokens", 4))
          .otherwise(lit(0.0)).as("dup_frac"))
      .orderBy($"doc_id")
  }

  val dupSpansSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(range(1, len(arr) - ${SpanW} + 2)) AS pos,
       |    unnest(list_transform(range(1, len(arr) - ${SpanW} + 2),
       |      i -> array_to_string(list_slice(arr, i, i + ${SpanW} - 1), ' '))) AS g
       |  FROM toks WHERE len(arr) >= $SpanW),
       |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
       |iv AS (SELECT doc_id, pos AS s, pos + ${SpanW} - 1 AS e
       |       FROM grams JOIN dup USING (g)),
       |marked AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS ni
       |  FROM iv),
       |cov AS (
       |  SELECT doc_id, sum(len) AS dup_tokens FROM (
       |    SELECT doc_id, island, max(e) - min(s) + 1 AS len FROM (
       |      SELECT doc_id, s, e,
       |        sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e) AS island
       |      FROM marked)
       |    GROUP BY doc_id, island)
       |  GROUP BY doc_id)
       |SELECT t.doc_id AS doc_id, len(arr) AS n_tokens,
       |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CASE WHEN len(arr) > 0
       |    THEN round(CAST(coalesce(dup_tokens, 0) AS BIGINT) / len(arr), 4)
       |    ELSE 0.0 END AS dup_frac
       |FROM toks t LEFT JOIN cov USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --- q41: paragraph-level dedup (first occurrence wins) -----------

  /** Dedup unit for [[paraDedup]] in word tokens. Real pipelines
    * (Dolma's dedupe-paragraphs, CCNet's hashed-paragraph filter)
    * split on newlines; the sandbox corpus is single-line, so the unit
    * is a fixed 20-token block — the MECHANISM (global first-occurrence
    * dedup of sub-document units + in-order reassembly) is the point,
    * and the splitter is one expression to swap. */
  val ParaTokens = 20

  /** q41: paragraph-level exact dedup — remove every repeated PARAGRAPH
    * from the corpus, keeping only its globally first occurrence
    * (smallest (doc_id, idx)), then reassemble each document from its
    * surviving paragraphs in original order. This is the Dolma/CCNet
    * boilerplate killer that whole-document dedup (q10-q13) cannot
    * express and q35 only measures: headers, license banners and nav
    * chrome repeated across millions of pages disappear from every copy
    * but one, while the unique prose around them survives.
    *
    * Spark shape:
    *  1. blocks via builtin HOFs (transform/slice/concat_ws +
    *     posexplode) — codegen'd, same projection family as q27/q35;
    *  2. first occurrence per block text = groupBy(blk).min(struct(
    *     doc_id, idx)) — a MAP-SIDE PARTIAL min, so a banner repeated
    *     10^9 times combines to one row per map task before the
    *     shuffle (the skew story q35 step 2 proved for counts);
    *  3. equi-join the stream back on blk, keep the argmin row — the
    *     hot-key side carries one argmin row per distinct block, AQE
    *     skew-splits the stream side;
    *  4. reassembly: per-doc sort_array(collect_list(struct(idx,blk)))
    *     — bounded by ONE document's size, never corpus-scale state.
    * The block TEXT rides two shuffles (decision + reassembly); the
    * at-scale knob is the same as q35's: key steps 2-3 on
    * xxhash64(blk) (8 B) and re-derive kept text from a map-side
    * re-tokenize against the broadcast-small LOSER set instead —
    * one-expression swaps, kept out of the oracle-checked default for
    * exactness.
    *
    * Output: (doc_id, n_blocks, n_kept, text_dedup) for EVERY doc —
    * docs whose every block was seen earlier come back empty rather
    * than vanishing (the caller decides whether empty docs drop). */
  def paraDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val blocks = docs
      .select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("a"))
      .filter(size($"a") >= 1)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(0, (size(a)-1) div $ParaTokens), " +
          s"k -> concat_ws(' ', slice(a, k*$ParaTokens+1, $ParaTokens)))")))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "blk")
    val firsts = blocks.groupBy($"blk")
      .agg(min(struct($"doc_id", $"idx")).as("first"))
    val kept = blocks.join(firsts, "blk")
      .filter($"doc_id" === $"first.doc_id" && $"idx" === $"first.idx")
    val re = kept.groupBy($"doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(idx, blk))), x -> x.blk)"))
        .as("text_dedup"))
    val nb = blocks.groupBy($"doc_id").agg(count(lit(1)).as("n_blocks"))
    docs.select($"doc_id")
      .join(nb, Seq("doc_id"), "left")
      .join(re, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_blocks", lit(0L)).as("n_blocks"),
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"text_dedup", lit("")).as("text_dedup"))
      .orderBy($"doc_id")
  }

  /** Oracle mirror of [[paraDedup]]: same blocks, first occurrence via
    * a window (fine at oracle scale), string_agg reassembly. */
  val paraDedupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS a
       |  FROM documents),
       |blocks AS (
       |  SELECT doc_id,
       |    unnest(range(0, ((len(a)-1) // $ParaTokens) + 1)) AS idx,
       |    unnest(list_transform(range(0, ((len(a)-1) // $ParaTokens) + 1),
       |       k -> array_to_string(a[k*$ParaTokens+1 : k*$ParaTokens+$ParaTokens], ' '))) AS blk
       |  FROM toks WHERE len(a) >= 1),
       |kept AS (
       |  SELECT doc_id, idx, blk FROM (
       |    SELECT doc_id, idx, blk,
       |      row_number() OVER (PARTITION BY blk ORDER BY doc_id, idx) AS rn
       |    FROM blocks) q WHERE rn = 1),
       |re AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(blk, ' ' ORDER BY idx) AS text_dedup
       |  FROM kept GROUP BY doc_id),
       |nb AS (SELECT doc_id, count(*) AS n_blocks FROM blocks GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(nb.n_blocks, 0) AS n_blocks,
       |  COALESCE(re.n_kept, 0) AS n_kept,
       |  COALESCE(re.text_dedup, '') AS text_dedup
       |FROM documents d LEFT JOIN nb USING (doc_id) LEFT JOIN re USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---- q44: incremental Bloom dedup (feed vs ingested corpus) -------

  /** Bloom sizing: ~10 bits/key (≈0.8% fpp), capped at 2²⁶ bits = 8 MB
    * (Spark's own runtime-bloom-filter ceiling,
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, which
    * [[aggregate.BloomFilterAggregate]] clamps to anyway). Past the
    * cap the fpp degrades gracefully and NOTHING about the result
    * changes — false positives only widen the exactly-confirmed
    * candidate set (see [[bloomDedup]]). */
  val BloomMaxBits: Long = 1L << 26

  /** Distributed Bloom filter over a digest column: Spark's native
    * Catalyst [[aggregate.BloomFilterAggregate]] (the engine's own
    * runtime-join-filter machinery, exposed as a first-class op) over
    * `xxhash64(h)` — partial per-task blooms OR-merge up the normal
    * aggregation path, so the corpus is read once, map-side, with no
    * row shuffle (only the fixed-size bloom buffers move). Returns
    * null iff the corpus is empty. */
  private[graft] def corpusBloom(corpus: DataFrame, nItems: Long,
                                     numBits: Long): Array[Byte] = {
    import org.apache.spark.sql.graftshim.SqlShim
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    corpus.select(SqlShim.column(new BloomFilterAggregate(
        SqlShim.expression(xxhash64(col("h"))),
        SqlShim.expression(lit(math.max(nItems, 1L))),
        SqlShim.expression(lit(math.max(numBits, 64L))))
      .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd Bloom membership test — Catalyst's
    * [[BloomFilterMightContain]] over the serialized filter as a
    * binary literal (referenced from the codegen references array, not
    * inlined source). No false negatives, by construction. */
  private[graft] def bloomMightContain(bloom: Array[Byte],
                                           h: Column): Column = {
    import org.apache.spark.sql.graftshim.SqlShim
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    SqlShim.column(BloomFilterMightContain(
      SqlShim.expression(lit(bloom)), SqlShim.expression(xxhash64(h))))
  }

  /** q44: INCREMENTAL exact dedup — dedup a re-ingested feed against
    * the already-ingested corpus without joining the feed to the full
    * corpus, the Dolma-style Bloom-filter dedup pattern (Soldaini et
    * al. 2024 §2.2 run their dedupe as a Bloom filter over previously
    * seen keys) and the shape every continuously-crawling pipeline
    * needs: q10 answers "dups WITHIN a corpus", this answers "which of
    * these new rows have we seen BEFORE".
    *
    * Here the feed is the whole `documents` table and the ingested
    * corpus is the `doc_id % 10 >= 2` slice (deterministic, so the
    * oracle replays it): 80% of the feed is re-offered content, 20%
    * novel — the usual recrawl mix.
    *
    * Plan shape (and why it scales): the corpus never shuffles a row —
    * it is read digest-only TWICE, once map-side into the Bloom
    * aggregate ([[corpusBloom]]) and once through a broadcast-semi
    * confirm join; the feed never shuffles at all. The Bloom prefilter
    * cuts the confirm join's probe side from |feed| to |true dups| +
    * fpp·|novel|, and the exact semi-join confirm makes the RESULT
    * independent of the Bloom's fpp (regression-gated: a 64-bit
    * everything-collides filter yields byte-identical output) — the
    * filter is purely a bandwidth optimization, exactly like Spark's
    * own runtime row-group filters. At 10¹² ingested keys one 8 MB
    * bloom undersizes (fpp→1, prefilter stops helping, correctness
    * unaffected): shard the filter by digest prefix (k independent
    * blooms built in one pass with groupBy(prefix)) before raising the
    * per-filter cap. */
  def bloomDedup(spark: SparkSession, dir: String,
                 numBits: Long = 0L): DataFrame = {
    import spark.implicits._
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    // Sizing uses the UNFILTERED table count — a true parquet-footer
    // read (no filter, no projection → answered from row-group
    // metadata). It upper-bounds the ingested-slice cardinality, which
    // over-sizes the bloom by ≤ the slice fraction — harmless — where
    // counting the filtered slice itself would cost a full extra pass
    // over the doc_id column before the real bloom-building pass.
    val nUpper = raw.count()
    val docs = raw.select($"doc_id", md5($"text").as("h"))
    val corpus = docs.filter($"doc_id" % 10 >= 2)
    val bits =
      if (numBits > 0L) numBits
      else math.min(math.max(nUpper * 10L, 64L), BloomMaxBits)
    val bloom = corpusBloom(corpus, nUpper, bits)
    val candH = // digests that MIGHT be ingested (never misses a dup)
      if (bloom == null) docs.select($"h").limit(0)
      else docs.filter(bloomMightContain(bloom, $"h")).select($"h").distinct()
    // exact confirm, corpus side streaming: broadcast the candidate
    // digests and semi-join the corpus against them (map-only over the
    // corpus), then distinct the small matched set
    val dupH = corpus.select($"h")
      .join(broadcast(candH), Seq("h"), "left_semi").distinct()
    docs.join(dupH.withColumn("seen_one", lit(1)), Seq("h"), "left")
      .select($"doc_id", $"h",
        coalesce($"seen_one", lit(0)).cast("int").as("seen"))
      .orderBy($"doc_id")
  }

  /** Oracle mirror of [[bloomDedup]]: the plain exact left join the
    * bloom + confirm pipeline is provably equivalent to. */
  val bloomDedupSql: String =
    """WITH c AS (
      |  SELECT DISTINCT md5(text) AS h FROM documents
      |  WHERE doc_id % 10 >= 2),
      |f AS (SELECT doc_id, md5(text) AS h FROM documents)
      |SELECT f.doc_id, f.h,
      |  CAST(c.h IS NOT NULL AS INT) AS seen
      |FROM f LEFT JOIN c ON f.h = c.h
      |ORDER BY f.doc_id""".stripMargin
}
