package graft.query

import org.apache.spark.sql.SparkSession
import graft.analysis.Tokenizer
import graft.index.{PosCursor, PosReader, PosStore, SegmentStore}

/** Phrase search over the positional sidecar ([[graft.index.PosStore]]):
  * documents containing the query's tokens ADJACENT and IN ORDER, with
  * occurrence count and first position — the query class the
  * position-free main index cannot serve.
  *
  * Algorithm: one [[PosCursor]] per phrase term (duplicate terms get
  * independent cursors over the same blocks), docId-leapfrog
  * intersection driven by the largest current docId with block-skips on
  * metadata alone — identical discipline to the conjunctive engine path
  * (EngineCore.searchConjunctiveQuery) — then, only for docs where all
  * terms agree, a sorted-pointer sweep over the position arrays counts
  * exact adjacency matches (term i must sit at p + i). Cost is bounded
  * by the RAREST term's df for the intersection plus the positions of
  * the intersected docs only.
  *
  * Resolution is EXACT by design: phrase semantics quote the user's
  * tokens, so no spell correction and no case-fold fallback beyond the
  * tokenizer's own lowercasing; any phrase term absent from the
  * positional dictionary empties the result (AND semantics, as q54).
  *
  * Serving shape: the per-query state is the phrase terms' dictionary
  * entries + their block lists — the same vocabulary-bounded footprint
  * the WAND path carries, so the DistributedRunner broadcast-core
  * pattern extends to phrase batches unchanged (the pos_dict rows for
  * the batch's terms ride the broadcast; corpus never shuffles). */
final class PhraseSearcher(spark: SparkSession, indexDir: String,
                           tokCfg: Tokenizer.Config = Tokenizer.default) {

  require(PosStore.exists(indexDir),
    s"no positional sidecar under $indexDir (Build.buildPosStore)")

  private val reader = new PosReader(PosStore.posDir(indexDir))

  // term -> dict entries, loaded once per searcher per term (vocab-
  // bounded; a phrase has a handful of terms)
  private val entryCache =
    scala.collection.mutable.HashMap.empty[String, Array[SegmentStore.DictEntry]]

  private def entriesOf(terms: Seq[String]): Map[String, Array[SegmentStore.DictEntry]] = {
    val missing = terms.distinct.filterNot(entryCache.contains)
    if (missing.nonEmpty) {
      import spark.implicits._
      val loaded = spark.read.parquet(PosStore.dictDir(indexDir))
        .filter($"term".isin(missing: _*))
        .as[SegmentStore.DictEntry].collect()
        .groupBy(_.term)
      missing.foreach(t => entryCache(t) = loaded.getOrElse(t, Array.empty))
    }
    terms.distinct.map(t => t -> entryCache(t)).toMap
  }

  /** All docs matching the phrase: (docId, nMatches, firstPos),
    * docId-ascending. Empty when any term is unknown or the phrase has
    * no token. */
  def search(phrase: String): Array[(Long, Long, Long)] = {
    val terms = Tokenizer.tokenizeSeq(phrase, tokCfg)
    if (terms.isEmpty) return Array.empty
    val entries = entriesOf(terms)
    if (terms.exists(t => entries(t).isEmpty)) return Array.empty
    // blocks per distinct term fetched ONCE; duplicate phrase terms get
    // independent cursors over the shared block arrays
    val blocksByTerm = entries.map { case (t, es) =>
      t -> es.flatMap(e => reader.record(e)._2)
    }
    val cursors = terms.map(t => new PosCursor(blocksByTerm(t))).toArray
    if (cursors.exists(_.exhausted)) return Array.empty

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var done = false
    while (!done) {
      var max = 0L
      var i = 0
      while (i < cursors.length && !done) {
        val d = cursors(i).curDoc
        if (d == Long.MaxValue) done = true
        else if (d > max) max = d
        i += 1
      }
      if (!done) {
        var agree = true
        i = 0
        while (i < cursors.length && !done) {
          cursors(i).advanceTo(max)
          val d = cursors(i).curDoc
          if (d == Long.MaxValue) done = true
          else if (d != max) agree = false
          i += 1
        }
        if (!done && agree) {
          val (n, first) = PhraseSearcher.adjacencyCount(
            cursors.map(_.curPositions))
          if (n > 0) out += ((max, n.toLong, first.toLong))
          i = 0
          while (i < cursors.length) { cursors(i).next(); i += 1 }
        }
      }
    }
    out.toArray
  }

  def close(): Unit = reader.close()
}

object PhraseSearcher {

  /** Count positions p in arrs(0) with arrs(i) containing p+i for all i
    * — one monotone pointer per term, O(Σ|positions|) total. Returns
    * (count, first match position; -1 if none). */
  private[query] def adjacencyCount(arrs: Array[Array[Int]]): (Int, Int) = {
    val idx = new Array[Int](arrs.length)
    var count = 0
    var first = -1
    val base = arrs(0)
    var i = 0
    while (i < base.length) {
      val p = base(i)
      var ok = true
      var t = 1
      while (ok && t < arrs.length) {
        val arr = arrs(t)
        var j = idx(t)
        while (j < arr.length && arr(j) < p + t) j += 1
        idx(t) = j
        ok = j < arr.length && arr(j) == p + t
        t += 1
      }
      if (ok) { count += 1; if (first < 0) first = p }
      i += 1
    }
    (count, first)
  }
}
