package graft.query

/** BM25 parameterization (north rule: k1=1.2, b=0.75, Robertson/Lucene
  * idf), replacing the reference's cosine loop (reference ranker.py:26-28,
  * searcher.py:150-156) — SURVEY.md Q6/Q8.
  *
  * The per-posting "normalization part" U(tf, dl) is idf-independent; the
  * index stores per-block max U, and the query-time upper bound is
  * idf * (k1+1) * maxU — so block maxes never need df at encode time
  * (df isn't broadcastable at 10^12-file scale).
  *
  * Rank identity (SURVEY.md §7.4 hard-part 3) relies on: U is computed
  * with the SAME double arithmetic at build and query; double ops are
  * monotone under rounding, so c*U <= c*maxU holds exactly.
  */
object BM25 {
  val K1 = 1.2
  val B = 0.75

  def idf(n: Long, df: Long): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)

  /** tf-normalization part: tf / (tf + k1*(1 - b + b*dl/avgdl)). */
  def normPart(tf: Int, dl: Int, avgdl: Double): Double =
    tf / (tf + K1 * (1 - B + B * (dl / avgdl)))

  /** Full per-(term, doc) contribution; qtf enters linearly. */
  def score(tf: Int, dl: Int, avgdl: Double, n: Long, df: Long,
            qtf: Int = 1): Double =
    qtf * idf(n, df) * (K1 + 1) * normPart(tf, dl, avgdl)

  /** The constant factor per term: score = termConst * normPart. */
  def termConst(n: Long, df: Long, qtf: Int): Double =
    qtf * idf(n, df) * (K1 + 1)
}
