package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.query.BM25

/** Segment store unit spec: file rolling at the posting budget,
  * byte-addressed reads across rolled files, marker-driven resume. */
class SegmentStoreSpec extends AnyFunSuite {

  private val score = (tf: Int, dl: Int) => BM25.normPart(tf, dl, 40.0)

  private def groups(nTerms: Int, postingsPerTerm: Int)
      : Iterator[(String, Int, Codec.Posting)] =
    (0 until nTerms).iterator.flatMap { t =>
      val term = f"term$t%04d"
      (1 to postingsPerTerm).iterator.map(d =>
        (term, 0, Codec.Posting(d.toLong, 1 + (d % 5), 40)))
    }

  test("file rolling: partitions exceeding the budget split at group boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("segstore").toString
    val m = SegmentStore.writePartition(dir, 0, "lin1",
      groups(nTerms = 20, postingsPerTerm = 50), score, postingBudget = 120)
    // 20 groups x 50 postings, roll after >=120 per file -> ~7 files
    assert(m.files.length > 3, s"expected rolled files, got ${m.files}")
    assert(m.rows == 1000)
    assert(m.files.map(_.bytes).sum == m.bytes)
    // every dict entry readable from its rolled file
    val reader = new SegmentReader(dir)
    try {
      m.entries.foreach { e =>
        val (df, blocks) = reader.record(e)
        assert(df == 50)
        assert(Codec.decode(blocks.toSeq).length == 50)
      }
    } finally reader.close()
    // distinct files referenced by entries == files in marker
    assert(m.entries.map(_.file).distinct.sorted == m.files.map(_.name).sorted)
  }

  test("resume: matching marker+files short-circuits without consuming the iterator") {
    val dir = java.nio.file.Files.createTempDirectory("segstore2").toString
    val m1 = SegmentStore.writePartition(dir, 3, "lin1",
      groups(5, 30), score, postingBudget = 1000)
    var consumed = false
    val trap = groups(5, 30).map { x => consumed = true; x }
    val m2 = SegmentStore.writePartition(dir, 3, "lin1", trap, score, 1000)
    assert(!consumed, "resume must not consume the shuffle iterator")
    assert(m2 == m1)
    // different lineage -> rebuild
    val m3 = SegmentStore.writePartition(dir, 3, "lin2", groups(5, 30), score, 1000)
    assert(m3.lineage == "lin2")
  }

  test("isComplete detects missing or truncated rolled files") {
    val dir = java.nio.file.Files.createTempDirectory("segstore3").toString
    val m = SegmentStore.writePartition(dir, 7, "lin1",
      groups(10, 40), score, postingBudget = 100)
    assert(SegmentStore.isComplete(dir, 7, "lin1"))
    assert(!SegmentStore.isComplete(dir, 7, "other-lineage"))
    val f = SegmentStore.fs(dir)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/${m.files.last.name}"), false)
    assert(!SegmentStore.isComplete(dir, 7, "lin1"))
  }
}
