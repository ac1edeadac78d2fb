package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Tuning knobs for the approximate-nearest-neighbor operators, lifted
  * out of fixed constants so the bucketing scales with the corpus
  * instead of pinning test-scale values.
  *
  * Derivations (the numbers to pick at real scale):
  *  - `nBits`: 2^nBits LSH buckets; size so a bucket holds ~1k-10k
  *    vectors (buckets ~ n/1k). 8 bits fits the 500-vector test tables;
  *    10^11 vectors wants ~27 bits (or multiple independent tables).
  *  - `multiProbe`: hamming radius of the probe set. Radius 2 probes
  *    1 + nBits + nBits*(nBits-1)/2 buckets; on data with real near
  *    neighbors radius 1 already catches nearly everything (per-bit
  *    flip probability = angle/pi).
  *  - `ivfLists`: coarse-quantizer cells; classic IVF sizing is
  *    ~sqrt(n) lists so list size ~= list count. 16 fits the test
  *    tables; 10^11 vectors wants ~3*10^5 lists.
  *  - `ivfProbes`: lists scanned per query — recall/IO knob.
  *  - `ivfIters`: distributed Lloyd refinement rounds for the codebook.
  */
final case class AnnConfig(
    nBits: Int = 8,
    multiProbe: Int = 2,
    ivfLists: Int = 16,
    ivfProbes: Int = 4,
    ivfIters: Int = 4)

/** Similarity search over the `embeddings` table (builder-prompt
  * training-data pipeline ops): brute-force cosine top-k as the exact
  * baseline, and two bucketed variants (sign-LSH, IVF) as the scale
  * paths.
  *
  * Scale design — the bucketed variants are PHYSICAL, not just logical:
  * a one-pass build materializes the vector index as a parquet layout
  * partitioned by bucket/list (`lshLayout`/`ivfLayout`), and a query is
  *   (a) a pushdown point-read of the query embedding from the raw
  *       table (PushedFilters reach the scan — no kernel pass runs just
  *       to fetch one row),
  *   (b) a driver-side probe-set computation — the signature and the
  *       nearest-centroid sets are pure functions of the query vector
  *       plus the broadcastable planes/codebook, and
  *   (c) a partition-pruned scan of ONLY the probed buckets/lists
  *       (PartitionFilters on the layout read) with an exact-cosine
  *       re-rank inside the candidates.
  * At 10^11 vectors the layout lives at a persistent caller-chosen path
  * and probe IO is proportional to the probed fraction, exactly like
  * partition pruning on a date column; in this sandbox the layout is
  * built once per (table, config) into a JVM-cleaned temp dir. The
  * reference analog is its segment-locality optimization
  * (searcher.py:59-70): touch only the index regions a query needs.
  */
object Similarity {

  val K = 20
  val QueryVecId = 0
  val DefaultAnn: AnnConfig = AnnConfig()

  // native codegen'd expression (graft.functions.CosineSimilarity):
  // bit-identical to the aggregate(zip_with(...)) HOF form it replaced
  // (same double widening and ascending accumulation order, so the
  // DuckDB oracle hash is unchanged) but one fused allocation-free loop
  // inside whole-stage codegen instead of three interpreted
  // CodegenFallback array passes per row — this is the inner loop over
  // every corpus vector in q15/q16/q24
  private val cosExpr =
    graft.functions.CosineSimilarity.cosine(col("embedding"), col("qe"))

  /** q15: exact top-k cosine neighbors of QueryVecId's embedding.
    * Broadcast the 1-row query side; the big side never shuffles —
    * TakeOrderedAndProject does the global top-k. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" === QueryVecId)
      .select($"embedding".as("qe"))
    e.filter($"vec_id" =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select($"vec_id", round(cosExpr, 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(K)
  }

  // DOUBLE[] casts: DuckDB's list_cosine_similarity computes in float32
  // on FLOAT lists; Spark computes in double — cast for bit parity
  val annBruteForceSql: String =
    s"""SELECT e.vec_id AS vec_id,
       |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 4) AS cos
       |FROM embeddings e
       |CROSS JOIN (SELECT embedding AS qe FROM embeddings
       |            WHERE vec_id = $QueryVecId) q
       |WHERE e.vec_id <> $QueryVecId
       |ORDER BY cos DESC, vec_id
       |LIMIT $K""".stripMargin

  /** q23: per-label embedding centroids (the IVF coarse-quantizer step:
    * centroid per cluster, here per given label) — posexplode + two hash
    * aggs; component averages are the classic array-column aggregation. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val comp = e.select($"label",
      posexplode($"embedding").as(Seq("pos", "v")))
    val cent = comp.groupBy($"label", $"pos")
      .agg(avg($"v".cast("double")).as("c"))
    val norms = cent.groupBy($"label")
      .agg(round(sqrt(sum($"c" * $"c")), 4).as("centroid_norm"))
    val counts = e.groupBy($"label").agg(count(lit(1)).as("n_vecs"))
    counts.join(norms, "label")
      .select($"label", $"n_vecs", $"centroid_norm")
      .orderBy($"label")
  }

  val labelCentroidsSql: String =
    """WITH comp AS (
      |  SELECT label, unnest(range(1, len(embedding)+1)) AS pos,
      |         unnest(embedding) AS v
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS c
      |  FROM comp GROUP BY label, pos),
      |norms AS (
      |  SELECT label, round(sqrt(sum(c*c)), 4) AS centroid_norm
      |  FROM cent GROUP BY label),
      |counts AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
      |SELECT counts.label AS label, n_vecs, centroid_norm
      |FROM counts JOIN norms ON counts.label = norms.label
      |ORDER BY label""".stripMargin

  // ---- query-vector fetch (shared by both bucketed variants) --------

  /** The raw-table point read for the query embedding. The vec_id
    * predicate sits DIRECTLY on the parquet scan, so it pushes down
    * (PushedFilters: EqualTo(vec_id,...)) — fetching one row costs a
    * row-group-pruned read, not a kernel pass over the corpus (the
    * round-2 version filtered above a typed `.map`, which defeated
    * pushdown and ran the signature/assignment kernel corpus-wide just
    * to find the query row — PlanSpec gates this stays fixed). */
  private[operators] def queryFetch(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === QueryVecId)
      .select(col("embedding"))

  private def queryEmbedding(spark: SparkSession, dir: String): Array[Float] =
    queryFetch(spark, dir).head().getSeq[Float](0).toArray

  /** Built layouts, cached per (kind, table, config) per JVM. At real
    * scale the layout is the persisted vector index at a caller-chosen
    * path (build once, query many); the temp-dir cache mirrors that
    * lifecycle in local mode and is removed on JVM exit. */
  private val layoutCache = TrieMap.empty[(String, String, AnnConfig), String]

  // ---- IVF ANN (coarse-quantizer scale path; not SQL-expressible) ---

  private def nearestCentroids(v: Array[Double],
                               cents: Array[Array[Double]], n: Int): Seq[Int] =
    cents.indices.map { c =>
      var dot = 0.0; var nc = 0.0; var nv = 0.0
      var i = 0
      while (i < v.length) {
        dot += v(i) * cents(c)(i); nc += cents(c)(i) * cents(c)(i)
        nv += v(i) * v(i); i += 1
      }
      c -> dot / math.sqrt(nc * nv)
    }.sortBy { case (c, s) => (-s, c) }.take(n).map(_._1)

  private val ivfCache =
    TrieMap.empty[(String, AnnConfig), Array[Array[Double]]]

  /** Deterministic k-means++ (farthest-point by cosine distance, ties by
    * index) + 6 Lloyd sweeps, all on the driver-resident sample. */
  private def kmeansPlusPlus(sample: Array[Array[Double]],
                             k: Int): Array[Array[Double]] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nbv = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nbv += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nbv)
    }
    val seeds = scala.collection.mutable.ArrayBuffer(0)
    while (seeds.length < math.min(k, sample.length)) {
      // farthest point: maximize distance to the nearest chosen seed
      var bestI = -1; var bestD = Double.NegativeInfinity
      var i = 0
      while (i < sample.length) {
        if (!seeds.contains(i)) {
          var nearest = Double.NegativeInfinity
          seeds.foreach { s =>
            val c = cos(sample(i), sample(s)); if (c > nearest) nearest = c }
          val d = 1.0 - nearest
          if (d > bestD) { bestD = d; bestI = i }
        }
        i += 1
      }
      seeds += bestI
    }
    var cents = seeds.map(sample(_).clone()).toArray
    for (_ <- 1 to 6) {
      val sums = Array.fill(cents.length)(new Array[Double](sample(0).length))
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        var best = 0; var bestC = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val s = cos(v, cents(c)); if (s > bestC) { bestC = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    cents
  }

  /** Lloyd-trained coarse codebook (k-means in Spark): init from a
    * deterministic k-means++-seeded sample, then ivfIters rounds of
    * broadcast-assign -> per-list component means. Means accumulate in
    * DECIMAL so the codebook is bit-deterministic across runs and
    * partitionings (float sums are order-dependent; at 10^9 vectors the
    * decimal agg has the same one-shuffle shape, just wider rows).
    * Empty lists keep their previous centroid. The codebook is
    * ivfLists x dim doubles — trivially broadcastable at any scale. */
  private[operators] def trainIvf(spark: SparkSession, dir: String,
                                  cfg: AnnConfig = DefaultAnn)
      : Array[Array[Double]] = ivfCache.getOrElseUpdate((dir, cfg), {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    // init = k-means++ on a deterministic sample: the 64*ivfLists
    // vectors lowest in id-hash order (TakeOrdered — spread uniformly
    // over the data regardless of id layout, fits the driver by
    // construction at any corpus scale), farthest-point seeding with
    // ties by sample index, then a few driver-side Lloyd sweeps before
    // the distributed refinement. Lowest-id init would seed all lists
    // inside one cluster on cluster-ordered tables; plain hash-seeding
    // lands in poor local optima.
    val sample: Array[Array[Double]] = e
      .orderBy(xxhash64($"vec_id"), $"vec_id").limit(64 * cfg.ivfLists)
      .collect().map(_._2.map(_.toDouble))
    var cents: Array[Array[Double]] = kmeansPlusPlus(sample, cfg.ivfLists)
    for (_ <- 1 to cfg.ivfIters) {
      val bc = spark.sparkContext.broadcast(cents)
      val means = e.map { case (_, emb) =>
          val v = emb.map(_.toDouble)
          (nearestCentroids(v, bc.value, 1).head, v)
        }.toDF("list", "v")
        .select($"list", posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"list", $"pos")
        .agg((sum($"x".cast("decimal(27,15)")) / count(lit(1)))
          .cast("double").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val next = cents.map(_.clone())
      means.foreach { case (l, p, m) => next(l)(p) = m }
      cents = next
    }
    cents
  })

  /** One-pass IVF index build: every vector assigned to its nearest
    * trained coarse list (broadcast codebook) and the assigned table
    * written `partitionBy("list")` — the list IS a disk partition, so a
    * probe is a partition-pruned read. Build once, query many. */
  private[operators] def ivfLayout(spark: SparkSession, dir: String,
                                   cfg: AnnConfig = DefaultAnn): String =
    layoutCache.getOrElseUpdate(("ivf", dir, cfg), {
      import spark.implicits._
      val cents = trainIvf(spark, dir, cfg)
      val centsBc = spark.sparkContext.broadcast(cents)
      val out = graft.TempDirs.create("graft-ivf-layout")
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
        .map { case (id, emb) =>
          (id, emb, nearestCentroids(emb.map(_.toDouble), centsBc.value, 1).head)
        }.toDF("vec_id", "embedding", "list")
        .write.mode("overwrite").partitionBy("list").parquet(out)
      out
    })

  /** q24: IVF ANN against the partitioned layout — pushdown point-read
    * of the query vector, driver-side probe selection from the codebook,
    * then exact-cosine re-rank inside ONLY the probed lists
    * (PartitionFilters prune everything else; PlanSpec gates it). */
  def annIvf(spark: SparkSession, dir: String,
             cfg: AnnConfig = DefaultAnn): DataFrame = {
    import spark.implicits._
    val cents = trainIvf(spark, dir, cfg)
    val qEmb = queryEmbedding(spark, dir)
    val probes = nearestCentroids(qEmb.map(_.toDouble), cents, cfg.ivfProbes)
    spark.read.parquet(ivfLayout(spark, dir, cfg))
      .filter($"list".isin(probes: _*) && $"vec_id" =!= QueryVecId)
      .withColumn("qe", typedLit(qEmb))
      .select($"vec_id", round(cosExpr, 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(K)
  }

  // ---- LSH-bucketed ANN (scale path; not SQL-expressible) -----------

  /** Deterministic pseudo-random hyperplane component b of plane p. */
  private[operators] def plane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      // uniform in [-1, 1) from the splittable hash
      val h = graft.corpus.Synth.mix(0x9A7E5EEDL ^ (p.toLong << 32) ^ i.toLong)
      (h >>> 11) * (2.0 / (1L << 53)) - 1.0
    }

  private[operators] def signature(v: Array[Double],
                                   planes: Array[Array[Double]]): Int = {
    var sig = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planes(p)(i); i += 1 }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Multi-probe: buckets within hamming `multiProbe` of the query
    * signature are scanned — 37 of 256 buckets (~14%) at the default
    * radius 2 / 8 bits. On data with REAL near neighbors (small angles)
    * radius 1 already catches nearly everything (per-bit flip prob =
    * angle/pi); radius 2 is the honest knob for looser thresholds. */
  private[operators] def probeSet(sig: Int,
                                  cfg: AnnConfig = DefaultAnn): Seq[Int] = {
    val out = scala.collection.mutable.LinkedHashSet(sig)
    if (cfg.multiProbe >= 1)
      for (b <- 0 until cfg.nBits) out += sig ^ (1 << b)
    if (cfg.multiProbe >= 2)
      for (a <- 0 until cfg.nBits; b <- a + 1 until cfg.nBits)
        out += sig ^ (1 << a) ^ (1 << b)
    out.toSeq
  }

  /** One-pass LSH index build: sign signature per vector (broadcast
    * hyperplanes), written `partitionBy("bucket")` — bucket = disk
    * partition, probes prune physically. */
  private[operators] def lshLayout(spark: SparkSession, dir: String,
                                   cfg: AnnConfig = DefaultAnn): String =
    layoutCache.getOrElseUpdate(("lsh", dir, cfg), {
      import spark.implicits._
      val dim = queryEmbedding(spark, dir).length
      val planes = Array.tabulate(cfg.nBits)(p => plane(p, dim))
      val planesBc = spark.sparkContext.broadcast(planes)
      val out = graft.TempDirs.create("graft-lsh-layout")
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
        .map { case (id, emb) =>
          (id, emb, signature(emb.map(_.toDouble), planesBc.value))
        }.toDF("vec_id", "embedding", "bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
      out
    })

  /** q16: LSH ANN against the partitioned layout — pushdown point-read
    * of the query vector, driver-side signature + multi-probe set (pure
    * functions of qEmb and the deterministic planes), exact-cosine
    * re-rank inside ONLY the probed buckets (partition-pruned read). */
  def annLsh(spark: SparkSession, dir: String,
             cfg: AnnConfig = DefaultAnn): DataFrame = {
    import spark.implicits._
    val qEmb = queryEmbedding(spark, dir)
    val planes = Array.tabulate(cfg.nBits)(p => plane(p, qEmb.length))
    val probes = probeSet(signature(qEmb.map(_.toDouble), planes), cfg)
    spark.read.parquet(lshLayout(spark, dir, cfg))
      .filter($"bucket".isin(probes: _*) && $"vec_id" =!= QueryVecId)
      .withColumn("qe", typedLit(qEmb))
      .select($"vec_id", round(cosExpr, 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(K)
  }
}
