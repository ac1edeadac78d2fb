package graft.query

/** Spell correction for unknown query terms (reference searcher.py:32,
  * 76-119 / SURVEY Q2): generate all edit-distance-1 candidates over a
  * bounded alphabet and pick the candidate with MAX document frequency
  * in the index — exactly the reference's argmax-df policy, minus its
  * latent mutate-while-iterating bug (we operate on a copy; SURVEY Q2
  * note).
  */
object Spell {

  val Alphabet: Array[Char] = ('a' to 'z').toArray :+ '_'

  /** All distinct edit-distance-1 variants: deletes, transposes,
    * replaces, inserts. Bounded: O(len * |alphabet|). */
  def edits1(w: String): Iterator[String] = {
    val n = w.length
    val deletes = (0 until n).iterator.map(i => w.take(i) + w.drop(i + 1))
    val transposes = (0 until n - 1).iterator.map(i =>
      w.take(i) + w(i + 1) + w(i) + w.drop(i + 2))
    val replaces = for {
      i <- (0 until n).iterator; c <- Alphabet.iterator if c != w(i)
    } yield w.take(i) + c + w.drop(i + 1)
    val inserts = for {
      i <- (0 to n).iterator; c <- Alphabet.iterator
    } yield w.take(i) + c + w.drop(i)
    (deletes ++ transposes ++ replaces ++ inserts).distinct
  }

  /** Correct `term` against a df lookup: known terms pass through;
    * unknown terms become the edit-1 candidate with max df (ties by
    * lexicographic order for determinism); no candidate → unchanged. */
  def correct(term: String, df: String => Option[Long]): String = {
    if (df(term).isDefined) return term
    val cands = edits1(term)
      .flatMap(c => df(c).map(d => (c, d)))
      .toSeq
    if (cands.isEmpty) term
    else cands.minBy { case (c, d) => (-d, c) }._1
  }
}
