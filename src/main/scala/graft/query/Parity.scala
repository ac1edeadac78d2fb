package graft.query

import graft.index.Codec
import scala.collection.mutable

/** Cosine-parity scorer: replays the REFERENCE's ranking semantics
  * (tf-idf vectors + query-dimension-only cosine) so the reference
  * behavior stays pinned while BM25 is the production scorer
  * (SURVEY Q6-Q8; north rule keeps BM25 as the replacement).
  *
  * Reference semantics reproduced exactly:
  *  - doc vector component for query term t:
  *      idf = log10(N / df), w = (tf / max_freq_term) * idf
  *    (reference searcher.py:146-156: normalized tf times idf)
  *  - query vector: query tf / query max tf per sorted term
  *    (searcher.py:161-175)
  *  - cosine over QUERY dimensions only: dot(d,q) / (|d| * |q|) where
  *    |d| is the norm of the matched-dimensions-only vector — NOT the
  *    true document norm (ranker.py:26-28; a deliberate reference
  *    quirk preserved here)
  *  - sort by score desc (ranker.py:30-32); docId asc tiebreak makes
  *    the reference's float-recency tie trick deterministic (Q10)
  */
object Parity {

  final case class TermVec(term: String, qtf: Int, df: Long,
                           postings: Array[Codec.Posting])

  def rank(termVecs: Seq[TermVec], nDocs: Long, maxTfOfDoc: Long => Int,
           k: Int): Array[(Long, Double)] = {
    val sorted = termVecs.sortBy(_.term) // searcher.py:57,143 term order
    val qMax = if (sorted.isEmpty) 1 else sorted.map(_.qtf).max
    val qVec = sorted.map(tv => tv.qtf.toDouble / qMax).toArray
    val docVecs = mutable.HashMap.empty[Long, Array[Double]]
    sorted.zipWithIndex.foreach { case (tv, dim) =>
      val idf = math.log10(nDocs.toDouble / tv.df)
      tv.postings.foreach { p =>
        val v = docVecs.getOrElseUpdate(p.docId,
          new Array[Double](sorted.length))
        v(dim) = (p.tf.toDouble / math.max(1, maxTfOfDoc(p.docId))) * idf
      }
    }
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    docVecs.iterator.map { case (id, v) =>
      val dot = v.lazyZip(qVec).map(_ * _).sum
      val dNorm = math.sqrt(v.map(x => x * x).sum)
      val cos = if (dNorm == 0 || qNorm == 0) 0.0 else dot / (dNorm * qNorm)
      (id, cos)
    }.toArray
      .sortBy { case (id, s) => (-s, id) }
      .take(math.min(k, 2000))
  }
}
