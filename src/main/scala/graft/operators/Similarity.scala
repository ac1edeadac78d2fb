package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Fingerprints

/** Similarity search over the `embeddings` table (builder-prompt
  * training-data pipeline ops): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale
  * path.
  *
  * Scale design: brute force is ONE narrow pass over the vectors with a
  * broadcast query + TakeOrderedAndProject — it parallelizes perfectly
  * but reads everything. The LSH variant buckets vectors by sign
  * signature so a query probes only its own and adjacent (hamming-1)
  * buckets — at 10^11 vectors that's the difference between a full scan
  * and a partition-pruned read (bucket = partition key on disk).
  */
object Similarity {

  val K = 20
  val QueryVecId = 0

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

  // ---- IVF ANN (coarse-quantizer scale path; not SQL-expressible) ---

  val IvfLists = 16
  val IvfProbes = 4
  val IvfIters = 4

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
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]

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

  /** Lloyd-trained coarse codebook (k-means in Spark): init from the
    * IvfLists lowest vec_ids (deterministic), then IvfIters rounds of
    * broadcast-assign -> per-list component means. Means accumulate in
    * DECIMAL so the codebook is bit-deterministic across runs and
    * partitionings (float sums are order-dependent; at 10^9 vectors the
    * decimal agg has the same one-shuffle shape, just wider rows).
    * Empty lists keep their previous centroid. The codebook is
    * IvfLists x dim doubles — trivially broadcastable at any scale. */
  private[operators] def trainIvf(spark: SparkSession, dir: String)
      : Array[Array[Double]] = ivfCache.getOrElseUpdate(dir, {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    // init = k-means++ on a deterministic sample: the 64*IvfLists
    // vectors lowest in id-hash order (TakeOrdered — spread uniformly
    // over the data regardless of id layout, fits the driver by
    // construction at any corpus scale), farthest-point seeding with
    // ties by sample index, then a few driver-side Lloyd sweeps before
    // the distributed refinement. Lowest-id init would seed all lists
    // inside one cluster on cluster-ordered tables; plain hash-seeding
    // lands in poor local optima.
    val sample: Array[Array[Double]] = e
      .orderBy(xxhash64($"vec_id"), $"vec_id").limit(64 * IvfLists)
      .collect().map(_._2.map(_.toDouble))
    var cents: Array[Array[Double]] = kmeansPlusPlus(sample, IvfLists)
    for (_ <- 1 to IvfIters) {
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

  /** q24: IVF ANN — every vector assigned to its nearest trained coarse
    * list (one narrow pass, broadcast codebook); the query probes its
    * IvfProbes nearest lists and exact-cosine re-ranks only those
    * candidates. At 10^11 vectors the lists are disk partitions and the
    * probe set prunes the scan exactly like partition pruning. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = trainIvf(spark, dir)
    val centsBc = spark.sparkContext.broadcast(cents)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    val assigned = e.map { case (id, emb) =>
      val v = emb.map(_.toDouble)
      (id, nearestCentroids(v, centsBc.value, 1).head, emb)
    }.toDF("vec_id", "list", "embedding")
    val qRow = assigned.filter($"vec_id" === QueryVecId)
      .select($"embedding").head()
    val qEmb = qRow.getSeq[Float](0).toArray
    val probes = nearestCentroids(qEmb.map(_.toDouble), cents, IvfProbes)
    assigned
      .filter($"list".isin(probes: _*) && $"vec_id" =!= QueryVecId)
      .withColumn("qe", typedLit(qEmb))
      .select($"vec_id", round(cosExpr, 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(K)
  }

  // ---- LSH-bucketed ANN (scale path; not SQL-expressible) -----------

  val NBits = 8 // 2^8 buckets; scale with corpus size (buckets ~ n/1k)

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

  /** Multi-probe radius: buckets within hamming MultiProbe of the
    * query signature are scanned — 37 of 256 buckets (~14%) at radius 2.
    * On data with REAL near neighbors (small angles) radius 1 already
    * catches nearly everything (per-bit flip prob = angle/pi); radius 2
    * is the honest knob for looser thresholds. */
  val MultiProbe = 2

  private[operators] def probeSet(sig: Int): Seq[Int] = {
    val out = scala.collection.mutable.LinkedHashSet(sig)
    if (MultiProbe >= 1)
      for (b <- 0 until NBits) out += sig ^ (1 << b)
    if (MultiProbe >= 2)
      for (a <- 0 until NBits; b <- a + 1 until NBits)
        out += sig ^ (1 << a) ^ (1 << b)
    out.toSeq
  }

  /** q16: LSH-bucketed approximate top-k for the same query: candidates
    * from the query's bucket plus all buckets within the multi-probe
    * hamming radius, exact cosine re-rank within candidates. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = 64
    val planes = Array.tabulate(NBits)(p => plane(p, dim))
    val planesBc = spark.sparkContext.broadcast(planes)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".cast("long"), $"embedding").as[(Long, Array[Float])]
    val bucketed = e.map { case (id, emb) =>
      val v = emb.map(_.toDouble)
      (id, signature(v, planesBc.value), emb)
    }.toDF("vec_id", "bucket", "embedding")
    // at scale `bucketed` is written partitioned by bucket; here the
    // probe set drives a pushdown filter instead
    val qRow = bucketed.filter($"vec_id" === QueryVecId)
      .select($"bucket", $"embedding").head()
    val qSig = qRow.getInt(0)
    val qEmb = qRow.getSeq[Float](1).toArray
    val probes = probeSet(qSig)
    val qe = typedLit(qEmb)
    bucketed
      .filter($"bucket".isin(probes: _*) && $"vec_id" =!= QueryVecId)
      .withColumn("qe", qe)
      .select($"vec_id", round(cosExpr, 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(K)
  }
}
