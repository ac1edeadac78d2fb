package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-expressible (DuckDB-oracle-checkable) profile of the fulltext
  * pipeline, over the driver's `documents` table.
  *
  * These mirror the engine's core dataflow (SURVEY.md §2.2-§2.5) with a
  * deliberately simple whitespace tokenizer so an independent DuckDB
  * oracle can replay them exactly. The full code-profile tokenizer
  * (identifier split, number normalization, Porter2) is exercised by the
  * ScalaTest suites instead — it is not ANSI-SQL-expressible.
  *
  * Dataflow shape is the real one: tokenize (generator) → per-doc tf
  * (hash agg) → df/cf stats (hash agg + HAVING pruning, reference
  * indexer.py:604-615 analog) → BM25 score + top-k
  * (TakeOrderedAndProject).
  */
object TextRelational {

  /** Whitespace tokenizer, lowercased; the SQL-profile stand-in for the
    * tokenizer flatMap (reference parser_module.py:58-241). */
  def tokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("term"))
      .filter($"term" =!= "")
  }

  private val tokSql =
    """SELECT doc_id, t AS term FROM (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS t
      |  FROM documents) WHERE t <> ''""".stripMargin

  /** Per-(doc, term) term frequency — reference A1 (parser_module.py:204-217). */
  def termTf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tokens(spark, dir)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .orderBy($"doc_id", $"term")
  }

  val termTfSql: String =
    s"""SELECT doc_id, term, count(*) AS tf FROM ($tokSql)
       |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin

  /** Term dictionary stats: df + cf with singleton pruning (df > 1) —
    * reference A3 (indexer.py:79-92) + A7 (indexer.py:604-615). */
  def termStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tokens(spark, dir)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .groupBy($"term").agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
      .filter($"df" > 1)
      .orderBy($"term")
  }

  val termStatsSql: String =
    s"""SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM (
       |  SELECT doc_id, term, count(*) AS tf FROM ($tokSql) GROUP BY doc_id, term)
       |GROUP BY term HAVING count(*) > 1 ORDER BY term""".stripMargin

  /** Per-document stats: dl, max_tf, distinct terms — reference A1/A2
    * (parser_module.py:216-217, 321). */
  def docStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tokens(spark, dir)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("dl"), max($"tf").as("max_tf"),
        count(lit(1)).as("uniq_terms"))
      .orderBy($"doc_id")
  }

  val docStatsSql: String =
    s"""SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl, CAST(max(tf) AS BIGINT) AS max_tf,
       |  count(*) AS uniq_terms FROM (
       |  SELECT doc_id, term, count(*) AS tf FROM ($tokSql) GROUP BY doc_id, term)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val K1 = 1.2
  val B = 0.75

  /** Exhaustive BM25 top-k (k1=1.2, b=0.75, Robertson/Lucene idf) for a
    * fixed query — the relational mirror of the engine's scorer
    * (SURVEY.md Q6/Q9/Q11). df/dl/avgdl/N are Catalyst aggregates; the
    * tiny per-query-term df table is broadcast. */
  def bm25TopK(spark: SparkSession, dir: String,
               queryTerms: Seq[String] = Seq("spark", "join", "stream"),
               k: Int = 20): DataFrame = {
    import spark.implicits._
    val tf = tokens(spark, dir)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
    val dfT = tf.filter($"term".isin(queryTerms: _*))
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val idf: Column = log((($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)) + 1.0)
    val w: Column = idf * ($"tf" * (K1 + 1)) /
      ($"tf" + lit(K1) * (lit(1 - B) + ($"dl" / $"avgdl") * B))
    tf.filter($"term".isin(queryTerms: _*))
      .join(dl, "doc_id")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .groupBy($"doc_id").agg(round(sum(w), 4).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  /** Keywords kept per document by [[tfidfKeywords]]. */
  val KeywordsPerDoc = 3

  /** q51: TF-IDF keyword extraction — the top-[[KeywordsPerDoc]] terms
    * of every document by tf·ln((N+1)/(df+1)), the classic
    * per-document salient-term summary (tagging, faceting, weak
    * labels for retrieval training).
    *
    * Scale shape: the (doc, term, tf) relation partial-aggregates
    * map-side; the df table is VOCAB-sized, so its join back is an AQE
    * broadcast at any corpus size (a vocabulary grows ~log with the
    * corpus, not linearly); the corpus-size scalar rides a 1-row
    * cross-join. The only per-doc ordering is a window PARTITIONED BY
    * doc_id — bounded by a single document's distinct-term count, never
    * by the corpus. Ranking compares the ROUNDED score (what the oracle
    * sorts on) with the term as tiebreak, so the top-3 cut is
    * deterministic and engine-independent. */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val tf = tokens(spark, dir)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val st = tf.agg(countDistinct($"doc_id").as("n_docs"))
    val score = round($"tf" * log(($"n_docs" + 1.0) / ($"df" + 1.0)), 4)
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    tf.join(dfT, "term")
      .crossJoin(broadcast(st))
      .select($"doc_id", $"term", $"tf", $"df", score.as("score"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= KeywordsPerDoc)
      .orderBy($"doc_id", $"rk")
  }

  val tfidfKeywordsSql: String =
    s"""WITH tok AS ($tokSql),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |st AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
       |SELECT doc_id, term, tf, df, score, rk FROM (
       |  SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf, dft.df AS df,
       |    round(tf.tf * ln((n_docs + 1.0) / (df + 1.0)), 4) AS score,
       |    CAST(row_number() OVER (PARTITION BY tf.doc_id
       |      ORDER BY round(tf.tf * ln((n_docs + 1.0) / (df + 1.0)), 4) DESC,
       |               tf.term) AS INT) AS rk
       |  FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN st)
       |WHERE rk <= $KeywordsPerDoc
       |ORDER BY doc_id, rk""".stripMargin

  /** Relational twin of the engine's conjunctive search (q54): identical
    * BM25 arithmetic, restricted to docs matching EVERY query term —
    * `HAVING count(DISTINCT term) = n` is ANSI's spelling of the
    * engine's leapfrog postings intersection. */
  def booleanAnd(spark: SparkSession, dir: String,
                 queryTerms: Seq[String] = Seq("spark", "join", "stream"),
                 k: Int = 20): DataFrame = {
    import spark.implicits._
    val tf = tokens(spark, dir)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
    val dfT = tf.filter($"term".isin(queryTerms: _*))
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val idf: Column = log((($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)) + 1.0)
    val w: Column = idf * ($"tf" * (K1 + 1)) /
      ($"tf" + lit(K1) * (lit(1 - B) + ($"dl" / $"avgdl") * B))
    tf.filter($"term".isin(queryTerms: _*))
      .join(dl, "doc_id")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .groupBy($"doc_id")
      .agg(round(sum(w), 4).as("score"),
        countDistinct($"term").as("nt"))
      .filter($"nt" === queryTerms.size)
      .select($"doc_id", $"score")
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  def booleanAndSql(queryTerms: Seq[String] = Seq("spark", "join", "stream"),
                    k: Int = 20): String = {
    val inList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS ($tokSql),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |dft AS (SELECT term, count(*) AS df FROM tf WHERE term IN ($inList) GROUP BY term)
       |SELECT tf.doc_id AS doc_id,
       |  round(sum(ln(((n_docs - df + 0.5) / (df + 0.5)) + 1.0)
       |    * (tf * ${K1 + 1}) / (tf + $K1 * (1 - $B + $B * (dl / avgdl)))), 4) AS score
       |FROM tf
       |JOIN dl ON tf.doc_id = dl.doc_id
       |JOIN dft ON tf.term = dft.term
       |CROSS JOIN stats
       |WHERE tf.term IN ($inList)
       |GROUP BY tf.doc_id
       |HAVING count(DISTINCT tf.term) = ${queryTerms.size}
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  def bm25TopKSql(queryTerms: Seq[String] = Seq("spark", "join", "stream"),
                  k: Int = 20): String = {
    val inList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS ($tokSql),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |dft AS (SELECT term, count(*) AS df FROM tf WHERE term IN ($inList) GROUP BY term)
       |SELECT tf.doc_id AS doc_id,
       |  round(sum(ln(((n_docs - df + 0.5) / (df + 0.5)) + 1.0)
       |    * (tf * ${K1 + 1}) / (tf + $K1 * (1 - $B + $B * (dl / avgdl)))), 4) AS score
       |FROM tf
       |JOIN dl ON tf.doc_id = dl.doc_id
       |JOIN dft ON tf.term = dft.term
       |CROSS JOIN stats
       |WHERE tf.term IN ($inList)
       |GROUP BY tf.doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** The phrase [[phraseMatch]] searches for — chosen to occur in every
    * driver sf's `documents` so the query is non-trivially exercised. */
  val PhraseTerms: Seq[String] = Seq("table", "scan")

  /** q57: positional phrase match — documents containing the exact
    * token sequence [[PhraseTerms]], with occurrence count and first
    * token position. The positional question ("these terms ADJACENT, in
    * this order") is what the engine's postings alone cannot answer
    * (the index drops positions, reference parity — Tokenizer F19);
    * relationally it is answered from the token stream directly.
    *
    * Scale shape: the adjacent-k-gram stream is generated AT SCAN TIME
    * (posexplode over a transform of the token array — pure map work,
    * no join against a position table), rows not matching the phrase
    * die in the same stage, and only (doc_id, pos) survivors reach the
    * one per-doc aggregate. A 100 TB corpus phrase-scans at read
    * throughput with a match-sized shuffle — the same shape grep-style
    * scan engines use. k-gram length equals the phrase length, so cost
    * is linear in corpus tokens regardless of phrase rarity. */
  def phraseMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val phrase = PhraseTerms.mkString(" ")
    val n = PhraseTerms.size
    val gram = (0 until n).map(j => col("toks").getItem(col("i") + j))
      .reduce((a, b) => concat(a, lit(" "), b))
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
      .filter(size($"toks") >= n)
      .select($"doc_id", $"toks",
        explode(sequence(lit(0), size($"toks") - n)).as("i"))
      .filter(gram === phrase)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_matches"), min($"i").cast("long").as("first_pos"))
      .orderBy($"n_matches".desc, $"doc_id")
  }

  val phraseMatchSql: String = {
    val n = PhraseTerms.size
    val phrase = PhraseTerms.mkString(" ")
    // DuckDB arrays are 1-based: i ranges over 1..len-n+1, emitted pos
    // is i-1 to match Spark's 0-based token index
    val gram = (0 until n).map(j => s"arr[i + $j]").mkString(" || ' ' || ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(arr) - $n + 2),
       |      i -> {'pos': i - 1, 'g': $gram})) AS e
       |  FROM d WHERE len(arr) >= $n)
       |SELECT doc_id, count(*) AS n_matches, CAST(min(e.pos) AS BIGINT) AS first_pos
       |FROM s WHERE e.g = '$phrase'
       |GROUP BY doc_id
       |ORDER BY n_matches DESC, doc_id""".stripMargin
  }

  /** [[pmiCollocations]] thresholds: a bigram must occur this often to
    * be scored (PMI is noise below a handful of counts), and the top-k
    * presented. */
  val PmiMinCount = 5
  val PmiTopK = 100

  /** q59: collocation mining — the corpus's top word pairs by pointwise
    * mutual information, PMI(x,y) = ln(P(x,y) / (P(x)P(y))) with
    * unigram probabilities from the token stream and bigram
    * probabilities from the adjacent-pair stream. The classic
    * phrase-discovery signal (word2vec's phrase pass, n-gram
    * vocabulary induction for tokenizers).
    *
    * Scale shape: bigram and unigram counts both partial-aggregate
    * map-side; the unigram table is VOCAB-sized so both probability
    * joins are AQE broadcasts at any corpus size; the two corpus
    * scalars ride 1-row cross-joins; the final top-k is a
    * TakeOrderedAndProject, never a full sort. The PMI double is
    * computed as ONE product / ONE product / one ln / one round, the
    * identical expression tree on both engines, so the rounded value
    * is bit-stable cross-engine (count magnitudes stay < 2^53). */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')").as("toks"))
    val uni = docs.select(explode($"toks").as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
    val bi = docs.filter(size($"toks") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS x, toks[i+1] AS y))"
      )).as("p"))
      .select($"p.x".as("x"), $"p.y".as("y"))
      .groupBy($"x", $"y").agg(count(lit(1)).as("c_xy"))
      .filter($"c_xy" >= PmiMinCount)
    val nUni = uni.agg(sum($"c").as("n_uni"))
    val nBiDf = docs.filter(size($"toks") >= 2)
      .agg(sum(size($"toks") - 1).cast("long").as("n_bi"))
    val cx = uni.select($"term".as("x"), $"c".as("c_x"))
    val cy = uni.select($"term".as("y"), $"c".as("c_y"))
    val pmi = round(log(
      ($"c_xy".cast("double") * $"n_uni" * $"n_uni") /
        ($"n_bi".cast("double") * $"c_x" * $"c_y")), 4)
    bi.join(broadcast(cx), "x").join(broadcast(cy), "y")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBiDf))
      .select($"x", $"y", $"c_xy", $"c_x", $"c_y", pmi.as("pmi"))
      .orderBy($"pmi".desc, $"x", $"y")
      .limit(PmiTopK)
  }

  val pmiCollocationsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS arr
       |  FROM documents),
       |uni AS (
       |  SELECT unnest(arr) AS term FROM d),
       |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY term),
       |bi AS (
       |  SELECT unnest(list_transform(range(1, len(arr)),
       |    i -> {'x': arr[i], 'y': arr[i+1]})) AS p
       |  FROM d WHERE len(arr) >= 2),
       |bc AS (
       |  SELECT p.x AS x, p.y AS y, count(*) AS c_xy FROM bi GROUP BY p.x, p.y
       |  HAVING count(*) >= $PmiMinCount),
       |nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uc),
       |nb AS (SELECT CAST(sum(len(arr) - 1) AS BIGINT) AS n_bi FROM d WHERE len(arr) >= 2)
       |SELECT bc.x AS x, bc.y AS y, bc.c_xy AS c_xy,
       |  ux.c AS c_x, uy.c AS c_y,
       |  round(ln((CAST(bc.c_xy AS DOUBLE) * n_uni * n_uni)
       |          / (CAST(n_bi AS DOUBLE) * ux.c * uy.c)), 4) AS pmi
       |FROM bc
       |JOIN uc ux ON bc.x = ux.term
       |JOIN uc uy ON bc.y = uy.term
       |CROSS JOIN nu CROSS JOIN nb
       |ORDER BY pmi DESC, x, y
       |LIMIT $PmiTopK""".stripMargin
}
