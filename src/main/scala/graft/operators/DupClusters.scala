package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q32: duplicate-cluster assignment — connected components over the
  * near-dup pair graph (q11's jaccard pairs), the step a real
  * training-data pipeline needs BETWEEN pair finding (q11/q12/q13) and
  * canonical-document selection: transitive near-dups A~B~C must
  * collapse to ONE kept doc even when (A,C) itself clears no threshold.
  *
  * Algorithm: the alternating large-star / small-star method (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
  * the published O(log n)-round, shuffle-only CC formulation:
  *   - large-star: every node u links each LARGER neighbor to
  *     m(u) = min(N(u) ∪ {u}) — hubs collapse toward their minimum;
  *   - small-star: every node u links its smaller neighbors (and
  *     itself) to its minimum smaller neighbor — chains flatten.
  * Both phases are a groupBy(node).min + a re-join on the same key
  * (co-partitioned, no collect_list: a hub's neighbor set is never
  * materialized in one task, which is exactly the skew trap a naive
  * Pregel-style min-propagation hits on boilerplate-heavy dup graphs).
  * Iteration happens on the EDGE list only — edge-sized, never
  * corpus-sized — with a localCheckpoint per round to truncate lineage
  * (an unbounded iterative plan otherwise re-derives every prior round
  * at each action). Convergence is detected by an order-independent
  * edge-set signature (count + sum of xxhash64(a,b)): one cheap
  * aggregate per round instead of two except-joins.
  *
  * At convergence the edge set is a star forest: every non-minimum
  * member holds exactly one edge to its component minimum, so the
  * label map IS the edge list. Docs in no pair are their own singleton
  * cluster (left join + coalesce). cluster_id = min doc_id of the
  * component — deterministic, no ordering or RNG dependence.
  *
  * Oracle: DuckDB recursive CTE propagating min labels over the same
  * pair CTEs ([[Dedup.jaccardPairCtes]]) — an independent fixpoint
  * formulation of the same closure, exact-compared on every row.
  */
object DupClusters {

  /** Hard cap on star rounds — the algorithm's bound is O(log n); 30
    * rounds covers any n that fits on disk. A non-converged exit is a
    * bug, not a truncation, so it throws rather than returns. */
  val MaxRounds = 30

  /** The (doc_id, cluster_id) label table over EVERY document — the
    * star-forest closure of the near-dup pair graph, singletons
    * labeling themselves.
    *
    * MATERIALIZED once per (corpus dir, JVM) as a parquet artifact and
    * re-read by every consumer: clustering (q32), leakage-safe
    * splitting (q40) and canonical selection (q42) all key off the
    * same label table, and a production pipeline writes that table
    * once after dedup rather than re-deriving the pair graph + closure
    * for each downstream decision — the expensive step (shingle join +
    * star rounds) runs once, downstream ops are a parquet scan plus
    * their own map/agg work. Same per-JVM artifact discipline as
    * [[IndexOps.indexFor]] and the ANN layouts (TempDirs lifecycle);
    * at real scale the path is caller-chosen + manifest, AnnStore's
    * pattern, and [[computeLabels]] stays the explicit build entry. */
  private val labelCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Cheap corpus fingerprint for the cache key: sorted (name, size,
    * mtime) of the documents.parquet part files, digested. Keying on the
    * dir STRING alone served stale labels if the corpus at that path was
    * rewritten within one long-lived JVM (round-4 advice) — the
    * fingerprint is a metadata-only listing, no data read. */
  private def corpusFingerprint(dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = graft.index.SegmentStore.fs(dir)
    if (!fs.exists(p)) "absent"
    else {
      val parts = fs.listStatus(p).map(s =>
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}").sorted
      java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
  }

  def labels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(
      labelCache.getOrElseUpdate(s"$dir@${corpusFingerprint(dir)}", {
        val out = graft.TempDirs.create("graft-dup-labels")
        computeLabels(spark, dir).write.mode("overwrite").parquet(out)
        out
      }))

  /** Derive the label table (one pair-graph build + star contraction). */
  private[graft] def computeLabels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.jaccardPairsAll(spark, dir)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    val lab = starContract(pairs)
    val docs = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id")
    docs.join(lab, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("cluster_id"))
  }

  def clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lab = labels(spark, dir)
    val sizes = lab.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "cluster_id")
      .select($"doc_id", $"cluster_id", $"cluster_size",
        ($"doc_id" === $"cluster_id").cast("int").as("is_canonical"))
      .orderBy($"doc_id")
  }

  /** Alternating large-star/small-star to fixpoint; returns the star
    * forest as (doc_id, cluster_id) for every NON-singleton member
    * (component minimums label themselves). Input: undirected edges
    * (a, b), a != b, any orientation, dups allowed. */
  private[operators] def starContract(edges0: DataFrame): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    // large-star: m(u) = min over u's FULL neighborhood (and u itself);
    // each neighbor v > u re-links to m. groupBy + join on u — two
    // shuffles on one key, hub neighbor lists never in one task.
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select($"a".as("u"), $"b".as("v"))
        .union(e.select($"b".as("u"), $"a".as("v")))
      val mins = bidir.groupBy($"u")
        .agg(min($"v").as("mv"))
        .select($"u", least($"mv", $"u").as("m"))
      bidir.join(mins, "u")
        .filter($"v" > $"u" && $"v" =!= $"m")
        .select($"v".as("a"), $"m".as("b"))
        .distinct()
    }

    // small-star: orient every edge to its smaller endpoint; each node
    // u links its smaller neighbors (and itself) to its minimum
    // smaller neighbor. All emitted edges keep a > b.
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
      val mins = or.groupBy($"u").agg(min($"v").as("m"))
      val j = or.join(mins, "u")
      j.select($"v".as("a"), $"m".as("b"))
        .union(j.select($"u".as("a"), $"m".as("b")))
        .filter($"a" =!= $"b")
        .distinct()
    }

    // order-independent edge-set signature: one aggregate per round
    // instead of two except-joins. XOR, not SUM: commutative like sum
    // but can't overflow (ANSI-mode sum of 64-bit hashes would abort
    // the job); edges are distinct() so xor never self-cancels a dup.
    // A 64-bit collision across <=30 rounds is ~2^-59 — and the DuckDB
    // oracle + union-find spec pin exactness independently.
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // LAZY localCheckpoint: the signature aggregate is the action that
    // materializes each round's edge set, so every round is ONE Spark
    // job (eager checkpoint + separate sig action would be two — at
    // small edge counts the loop cost is fixed job overhead, not data).
    // On the LOCAL path superseded rounds' checkpoint blocks become
    // unreachable and are freed by the ContextCleaner; live state is
    // ≤ 2 edge-sized sets.
    //
    // FAULT TOLERANCE is the local checkpoint's trade: blocks live on
    // their executor only, so losing ONE executor mid-contraction (spot
    // preemption, OOM, decommission) kills the whole derivation — there
    // is no lineage left to recompute from. When the session has a
    // RELIABLE checkpoint dir configured (sc.setCheckpointDir — the
    // norm on preemptible clusters), rounds checkpoint there instead:
    // each round pays a second job (write-out), and executor loss only
    // re-reads surviving checkpoint files. Local stays the default for
    // the non-preemptible/local case where it is strictly faster.
    //
    // Reliable-path RECLAIM: the ContextCleaner does NOT delete reliable
    // checkpoint FILES (spark.cleaner.referenceTracking.cleanCheckpoints
    // defaults to false, and it is a static app-start conf) — without
    // explicit cleanup a long contraction leaks one edge set of files
    // per round for the app lifetime (round-4 advice). Reliable rounds
    // therefore checkpoint an explicit RDD whose file location is
    // tracked, and each round's files are deleted as soon as the NEXT
    // round's checkpoint has materialized (truncating its lineage).
    // Only the final round's files remain, reclaimed with the dir.
    val reliable =
      edges0.sparkSession.sparkContext.getCheckpointDir.isDefined
    def roundCkpt(e: DataFrame)
        : (DataFrame, Option[org.apache.spark.rdd.RDD[(Long, Long)]]) =
      if (reliable) {
        val rdd = e.as[(Long, Long)].rdd
        rdd.checkpoint()
        (rdd.toDF("a", "b"), Some(rdd))
      } else (e.localCheckpoint(eager = false), None)
    def dropFiles(rdd: Option[org.apache.spark.rdd.RDD[(Long, Long)]]): Unit =
      rdd.flatMap(_.getCheckpointFile).foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try graft.index.SegmentStore.fs(f).delete(p, true)
        catch { case _: Exception => () } // best-effort reclaim
      }
    //
    // localContract first: each partition's edges are rewritten into
    // the star forest of its LOCAL components before anything shuffles
    // — a dense dup clique (the common shape in a near-dup graph)
    // collapses from O(k²) pair edges to k−1 star edges inside the map
    // task that holds it, so the distinct(), every round's shuffle, and
    // the round COUNT all start from the contracted size.
    var (cur, curRdd) = roundCkpt(
      localContract(edges0.filter($"a" =!= $"b")
        .select(greatest($"a", $"b").as("a"), least($"a", $"b").as("b")))
      .distinct())
    var curSig = sig(cur)
    var rounds = 0
    var converged = curSig._1 == 0L
    while (!converged) {
      rounds += 1
      require(rounds <= MaxRounds, s"star contraction did not converge in $MaxRounds rounds")
      val (next, nextRdd) = roundCkpt(smallStar(largeStar(cur)))
      val nextSig = sig(next) // materializes next's checkpoint
      dropFiles(curRdd)       // cur's files now superseded
      converged = nextSig == curSig
      cur = next
      curRdd = nextRdd
      curSig = nextSig
    }
    cur.select($"a".as("doc_id"), $"b".as("cluster_id"))
  }

  /** Partition-local contraction: rewrite each partition's edge set as
    * the star forest of its LOCAL connected components (union-find with
    * path halving; the root is the local-min node, so emitted edges
    * keep the a > b orientation the star rounds expect).
    *
    * Connectivity is preserved exactly: an edge (a, b) inside a
    * partition connects a—root—b through that partition's star, and a
    * node split across partitions chains its per-partition roots
    * through itself (rootP1—n—rootP2), so global components — and
    * their min ids, the cluster labels — are unchanged; the
    * DupClustersSpec union-find pins and the q32 oracle hold verbatim.
    * What changes is SIZE: a partition with m edges over k nodes in c
    * local components emits k − c ≤ m edges, and the dense cliques a
    * near-dup graph is made of collapse from O(k²) to k − 1 BEFORE the
    * first shuffle — this is the map-side-combine analog for connected
    * components. Per-task state is one long→long map over the
    * partition's distinct nodes (≤ 2× its edge count), the same memory
    * class as the shuffle sort buffers. */
  private[operators] def localContract(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.as[(Long, Long)].mapPartitions { it =>
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) { // path halving
          val g = parent.getOrDefault(p, p)
          parent.put(x, g)
          x = g
          p = parent.getOrDefault(x, x)
        }
        x
      }
      while (it.hasNext) {
        val (a, b) = it.next()
        val ra = find(a); val rb = find(b)
        // union by min id — the root IS the local min. A node is a map
        // KEY iff it is a non-root (find treats absent keys as roots),
        // so the emit loop below covers exactly the non-root nodes.
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.forEach { (n, _) =>
        val r = find(n)
        if (n != r) out += ((n, r))
      }
      out.iterator
    }.toDF("a", "b")
  }

  /** Shared oracle CTE chain ending in `lab(doc_id, cluster_id)` — an
    * independent fixpoint formulation (recursive min-label walk) of the
    * same closure the star rounds compute. */
  private[operators] val labelCtes: String =
    s"""${Dedup.jaccardPairCtes},
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |walk(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.d, w.label FROM walk w JOIN edges e ON e.s = w.node
       |  WHERE w.label < e.d),
       |lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node)""".stripMargin

  val clustersSql: String =
    s"""WITH RECURSIVE $labelCtes,
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
       |SELECT l.doc_id, l.cluster_id, s.cluster_size,
       |  CAST(l.doc_id = l.cluster_id AS INT) AS is_canonical
       |FROM lab l JOIN sz s USING (cluster_id)
       |ORDER BY l.doc_id""".stripMargin

  /** q56: contrastive positive-pair mining — near-duplicate clusters
    * turned into (anchor, positive) training pairs for embedding-model
    * training (SimCSE/E5-style contrastive objectives; negatives come
    * free in-batch at training time, so the pipeline's job is the
    * positives). Anchor = the cluster label itself (star contraction
    * labels every cluster by its MIN doc_id, so the anchor needs no
    * extra pass); every other member pairs with it once. ANCHOR-STAR
    * pairing is the scale decision: a 10^6-member boilerplate family
    * yields 10^6-1 pairs, not the 10^12 of all-pairs — same linearity
    * argument as q12's star-link. cluster_size rides along so trainers
    * can down-weight giant families. Reads the materialized label
    * artifact (q32's); the size ledger is cluster-count-sized and
    * broadcasts back under AQE. Pairs are leak-safe by construction
    * when split by q40 (anchor and positive share a cluster, and q40
    * splits whole clusters). */
  def contrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lab = labels(spark, dir)
    val sizes = lab.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    lab.filter($"doc_id" =!= $"cluster_id")
      .join(sizes, "cluster_id")
      .select($"cluster_id".as("anchor"), $"doc_id".as("positive"),
        $"cluster_size")
      .orderBy($"anchor", $"positive")
  }

  val contrastivePairsSql: String =
    s"""WITH RECURSIVE $labelCtes,
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
       |SELECT l.cluster_id AS anchor, l.doc_id AS positive, s.cluster_size
       |FROM lab l JOIN sz s USING (cluster_id)
       |WHERE l.doc_id <> l.cluster_id
       |ORDER BY anchor, positive""".stripMargin

  /** Keep threshold: floor(0.90 · 2³²) and floor(0.95 · 2³²) as 8-hex —
    * literal constants, so no float math exists to diverge on. */
  val SplitTrainHex = "e6666666"
  val SplitValHex = "f3333333"

  /** q40: leakage-safe train/val/test split — the assignment step a
    * training pipeline runs AFTER dedup clustering: hashing doc_id
    * (the naive split) lets two near-duplicates straddle train and
    * test, leaking the evaluation set into training through every
    * not-quite-exact copy q11/q12/q13 exist to find. Hashing the
    * CLUSTER label instead makes the split constant across each
    * near-dup family by construction — the self-contamination analog
    * of q27's benchmark decontamination.
    *
    * Split is md5("graft-split-" + cluster_id) against literal 90/5/5
    * thresholds (q30's deterministic-keep trick): reproducible across
    * engines and cluster sizes, no RNG state, and stable under corpus
    * appends for every cluster whose membership didn't change. Scale
    * shape: the cost IS q32's star contraction (edge-sized, O(log n)
    * rounds); the split itself adds one map-only projection. */
  def leakSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = substring(
      md5(concat(lit("graft-split-"), $"cluster_id".cast("string"))), 1, 8)
    labels(spark, dir)
      .select($"doc_id", $"cluster_id", u.as("u_hex"))
      .select($"doc_id", $"cluster_id",
        when($"u_hex" < SplitTrainHex, "train")
          .when($"u_hex" < SplitValHex, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  val leakSafeSplitSql: String =
    s"""WITH RECURSIVE $labelCtes
       |SELECT doc_id, cluster_id,
       |  CASE WHEN u < '$SplitTrainHex' THEN 'train'
       |       WHEN u < '$SplitValHex' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster_id,
       |    substr(md5('graft-split-' || CAST(cluster_id AS VARCHAR)), 1, 8) AS u
       |  FROM lab) q
       |ORDER BY doc_id""".stripMargin

  /** q42: canonical selection BY QUALITY — the keep-decision a real
    * pipeline runs after clustering: q32's `is_canonical = (doc_id ==
    * cluster_id)` keeps whichever near-dup happened to carry the
    * smallest id, but curation pipelines (Dolma's dedupe keep-longest,
    * CCNet's keep-best-perplexity-bucket) keep the BEST member of each
    * family. Here best = argmax of (q18 quality score, then n_chars,
    * then smallest doc_id) — a total order, so exactly one canonical
    * per cluster with no RNG or partition-order dependence.
    *
    * Spark shape: the per-cluster argmax is ONE `max(struct(...))`
    * hash aggregate — partial (map-side) combine means a 10⁶-member
    * boilerplate cluster contributes one row per map task to the
    * shuffle, the same skew story as q41's first-occurrence min. The
    * re-join to tag members is equi-keyed on cluster_id (cluster count
    * ~ doc count: NOT broadcastable, and doesn't need to be). Quality
    * rides as one double per doc; text is read once for the score and
    * never shuffles. */
  def canonicalByQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = labels(spark, dir).join(
      spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", TextAnalysis.qualityScore($"text").as("quality"),
          length($"text").cast("long").as("n_chars")),
      "doc_id")
    val best = scored.groupBy($"cluster_id")
      .agg(max(struct($"quality", $"n_chars", (-$"doc_id").as("neg_id")))
        .as("best"))
    scored.join(best, "cluster_id")
      .select($"doc_id", $"cluster_id", $"quality",
        ($"doc_id" === -$"best.neg_id").cast("int").as("is_canonical"))
      .orderBy($"doc_id")
  }

  /** Oracle mirror of [[canonicalByQuality]]: same label closure, the
    * argmax as a window rank (fine at oracle scale). The quality
    * expression is q18's, verbatim. */
  val canonicalByQualitySql: String = {
    val stopList = TextAnalysis.QualityStopwordsSql
    s"""WITH RECURSIVE $labelCtes,
       |qt AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS tk
       |  FROM documents),
       |qm AS (
       |  SELECT doc_id, n_chars,
       |    round(least(1.0, len(tk) / 100.0)
       |      * round(len(list_filter(tk, t -> regexp_matches(t, '^[a-z]+$$'))) / CAST(len(tk) AS DOUBLE), 4)
       |      * (1.0 - round(len(list_filter(tk, t -> t IN ($stopList))) / CAST(len(tk) AS DOUBLE), 4) * 0.5),
       |      4) AS quality
       |  FROM qt),
       |s AS (
       |  SELECT l.doc_id, l.cluster_id, q.quality, q.n_chars,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.quality DESC, q.n_chars DESC, l.doc_id) AS rn
       |  FROM lab l JOIN qm q USING (doc_id))
       |SELECT doc_id, cluster_id, quality,
       |  CAST(rn = 1 AS INT) AS is_canonical
       |FROM s ORDER BY doc_id""".stripMargin
  }
}
