package graft.operators

import graft.SparkSpec

/** q32 duplicate clustering: the large-star/small-star contraction is
  * pinned against a driver-side union-find on the same edges — exact
  * set equality of (node, component-min) labels — across adversarial
  * graph shapes (chains, stars, cliques, forests, random), plus the
  * end-to-end operator invariants on the real fixture. The DuckDB
  * recursive-CTE oracle (q32 in CORRECTNESS) checks the full operator
  * a third way.
  */
class DupClustersSpec extends SparkSpec {

  /** Driver-side union-find: (node -> component min) for every node
    * appearing in `edges`. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def contract(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val got = DupClusters.starContract(df)
      .as[(Long, Long)].collect().toMap
    // star forest labels only non-minimum members; complete with the
    // self-labels union-find carries for component minima
    got ++ got.values.map(m => m -> m).toMap
  }

  test("star contraction == union-find on adversarial graph shapes") {
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "chain" -> (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq,
      "reversed chain" -> (1L to 40L).sliding(2).map(s => (s(1), s(0))).toSeq,
      "star hub=max" -> (1L to 20L).map(i => (i, 99L)),
      "star hub=min" -> (2L to 21L).map(i => (1L, i)),
      "two cliques + bridgeless singleton edge" ->
        ((for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)) ++
         (for (i <- 10L to 15L; j <- (i + 1) to 15L) yield (i, j)) :+ (100L, 101L)),
      "forest of pairs" -> (0L until 30L by 2).map(i => (i, i + 1)),
      "duplicate + self edges mixed" ->
        Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (2L, 3L), (7L, 7L)),
      "random sparse" -> {
        val r = new scala.util.Random(42)
        Seq.fill(120)((r.nextInt(60).toLong, r.nextInt(60).toLong)).filter(e => e._1 != e._2)
      }
    )
    shapes.foreach { case (name, edges) =>
      val want = unionFind(edges).filter { case (k, _) =>
        // self-only nodes (from self edges) stay out of the star forest
        edges.exists(e => (e._1 == k || e._2 == k) && e._1 != e._2)
      }
      val got = contract(edges).filter { case (k, _) => want.contains(k) }
      assert(got == want, s"shape '$name': got $got want $want")
    }
  }

  test("localContract preserves components exactly and collapses cliques to stars") {
    import spark.implicits._
    // connectivity: contracted graph has the SAME union-find labeling
    // as the raw graph, on every adversarial shape incl. a node whose
    // edges are split across partitions (chained through itself)
    val r = new scala.util.Random(7)
    val random = Seq.fill(300)((r.nextInt(80).toLong, r.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.max(e._1, e._2), math.min(e._1, e._2)))
    val clique = for (i <- 1L to 30L; j <- (i + 1) to 30L) yield (j, i)
    for ((edges, parts) <- Seq((random, 7), (clique.toSeq, 5), (random, 1))) {
      val df = edges.toDF("a", "b").repartition(parts)
      val contracted = DupClusters.localContract(df)
        .as[(Long, Long)].collect().toSeq
      assert(unionFind(contracted) == unionFind(edges),
        s"contraction changed components (parts=$parts)")
      contracted.foreach { case (a, b) =>
        assert(a > b, s"star edge ($a,$b) lost the a>b orientation")
      }
      // per-partition bound: k_p distinct nodes in c_p components over
      // m_p edge ROWS (dups included) emit k_p − c_p ≤ m_p star edges,
      // so the total never exceeds the raw input rows (a node split
      // across partitions is re-listed per partition, so the DISTINCT
      // edge count is not the bound)
      assert(contracted.size <= edges.size,
        "contraction must never grow past the input edge rows")
    }
    // density: a clique resident in ONE partition collapses to its star
    // forest (k-1 edges from k(k-1)/2) before anything shuffles
    val one = DupClusters.localContract(clique.toDF("a", "b").coalesce(1))
      .as[(Long, Long)].collect()
    assert(one.length == 29, s"clique in one partition: ${one.length} edges, want 29")
    assert(one.forall(_._2 == 1L), "clique star must center on the min id")
  }

  test("empty edge set yields all-singleton clusters") {
    import spark.implicits._
    val got = DupClusters.starContract(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(got.count() == 0)
  }

  test("reliable checkpoint path: labels identical to local path, superseded round files reclaimed") {
    val sc = spark.sparkContext
    val ck = tmpDir("graft-ckpt")
    // a 40-chain needs several star rounds — several checkpoints, all
    // but the final one superseded
    val edges = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val want = contract(edges) // local-checkpoint reference run
    sc.setCheckpointDir(ck)
    try {
      assert(contract(edges) == want,
        "reliable-checkpoint contraction diverged from the local path")
      // reclaim gate: the ContextCleaner never deletes reliable
      // checkpoint FILES (cleanCheckpoints is a static conf, default
      // false) — the loop must delete each round's files itself once
      // the next round materializes, leaving at most the final round
      val fs = graft.index.SegmentStore.fs(ck)
      def rddDirs(p: org.apache.hadoop.fs.Path): Seq[String] =
        if (!fs.exists(p)) Nil
        else fs.listStatus(p).filter(_.isDirectory).flatMap { st =>
          (if (st.getPath.getName.startsWith("rdd-"))
             Seq(st.getPath.getName) else Nil) ++ rddDirs(st.getPath)
        }.toSeq
      val left = rddDirs(new org.apache.hadoop.fs.Path(ck))
      assert(left.nonEmpty, "reliable path did not checkpoint at all")
      assert(left.size <= 1, s"superseded round checkpoints leaked: $left")
    } finally {
      // SparkContext has no public unset — restore the shared session's
      // default (faster) localCheckpoint path for every later test
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
    }
  }

  test("q32 end-to-end invariants on the fixture corpus") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = DupClusters.clusters(spark, dir)
      .as[(Long, Long, Long, Int)].collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == nDocs, "every document gets exactly one cluster row")
    assert(out.map(_._1).distinct.length == out.length, "doc_id unique")
    // cluster_id is the component MIN: canonical iff doc_id == cluster_id,
    // exactly one canonical per cluster, and sizes are consistent
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_._1).min == cid, s"cluster $cid: id is not the min member")
      assert(rows.count(_._4 == 1) == 1, s"cluster $cid: canonical count != 1")
      assert(rows.forall(_._3 == rows.length), s"cluster $cid: size mismatch")
    }
    // clusters must agree with the pair graph: every q11-threshold pair
    // lands in one cluster (transitivity is WHY this operator exists)
    val pairs = Dedup.jaccardPairsAll(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val label = out.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
    }
    // and the clustering is exactly the pair graph's closure, no more:
    // label map == union-find on the same pairs (+ singletons)
    val want = unionFind(pairs)
    out.foreach { case (id, cid, _, _) =>
      assert(cid == want.getOrElse(id, id), s"doc $id: cluster $cid != union-find")
    }
    assert(pairs.nonEmpty && byCluster.exists(_._2.length > 2),
      "fixture too small: need at least one transitive (size>2) cluster")
  }

  test("jaccardPairsAll reliable-checkpoint path: pairs identical to the " +
    "local path, pair table checkpointed to the configured dir") {
    val dir = "/root/testdata/sf0.001"
    val want = Dedup.jaccardPairsAll(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(want.nonEmpty, "fixture produced no pairs")
    val sc = spark.sparkContext
    val ck = tmpDir("graft-pairs-ckpt")
    sc.setCheckpointDir(ck)
    try {
      val got = Dedup.jaccardPairsAll(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "reliable-checkpoint pairs diverged from local path")
      val fs = graft.index.SegmentStore.fs(ck)
      def rddDirs(p: org.apache.hadoop.fs.Path): Seq[String] =
        if (!fs.exists(p)) Nil
        else fs.listStatus(p).filter(_.isDirectory).flatMap { st =>
          (if (st.getPath.getName.startsWith("rdd-"))
             Seq(st.getPath.getName) else Nil) ++ rddDirs(st.getPath)
        }.toSeq
      assert(rddDirs(new org.apache.hadoop.fs.Path(ck)).nonEmpty,
        "reliable path did not checkpoint the pair table")
    } finally {
      val f = sc.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
    }
  }

  test("label table is a per-JVM artifact: built once, re-read by q32/q40/q42") {
    val dir = "/root/testdata/sf0.001"
    // two calls resolve to the SAME materialized parquet files — the
    // pair graph + star contraction ran at most once for this dir
    val a = DupClusters.labels(spark, dir).inputFiles
    val b = DupClusters.labels(spark, dir).inputFiles
    assert(a.nonEmpty && a.sameElements(b), "labels() rebuilt the artifact")
    assert(a.head.contains("graft-dup-labels"), a.head)
    // downstream consumers scan the artifact instead of re-deriving the
    // closure: no shingle/pair machinery in the split's executed plan
    val p = DupClusters.leakSafeSplit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft-dup-labels"), s"split does not read the artifact:\n$p")
    assert(!p.contains("Generate"),
      "split plan re-derives the pair graph (shingle explode present)")
  }
}
