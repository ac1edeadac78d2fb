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

  /** Full reference policy incl. the edit-2 fallback (pyspellchecker's
    * candidates() reaches edit distance 2, searcher.py:94-95): known →
    * unchanged; else argmax-df over known edit-1s; else over known
    * edit-2s; else unchanged. `dfBatch` resolves many candidates in one
    * lookup so a non-preloaded engine pays ONE dictionary scan per
    * stage, not one per candidate. `maxEdit2` bounds the second stage's
    * candidate set (deterministic prefix of the generation order) so a
    * pushdown-scan dictionary isn't handed a quarter-million-term
    * predicate. */
  def correct2(term: String, dfBatch: Seq[String] => Map[String, Long],
               maxEdit2: Int = Int.MaxValue): String = {
    if (dfBatch(Seq(term)).contains(term)) return term
    val e1 = edits1(term).toSeq
    def best(known: Map[String, Long]): String =
      known.toSeq.minBy { case (c, d) => (-d, c) }._1
    val known1 = dfBatch(e1)
    if (known1.nonEmpty) return best(known1)
    val seen = scala.collection.mutable.HashSet(term)
    seen ++= e1
    val e2 = e1.iterator.flatMap(edits1).filter(seen.add).take(maxEdit2).toSeq
    val known2 = dfBatch(e2)
    if (known2.nonEmpty) best(known2) else term
  }
}
