package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class FingerprintsSpec extends AnyFunSuite {
  import Fingerprints._

  private def randText(r: Random, n: Int): String =
    Seq.fill(n)("tok" + r.nextInt(500)).mkString(" ")

  test("shingles: sliding word n-grams, short docs degrade gracefully") {
    assert(shingles("a b c d", 2).toSeq == Seq("a b", "b c", "c d"))
    assert(shingles("a", 3).toSeq == Seq("a"))
    assert(shingles("", 2).isEmpty)
  }

  test("minhash estimates Jaccard within tolerance (k=128)") {
    val r = new Random(42)
    (1 to 10).foreach { _ =>
      val base = Seq.fill(200)("w" + r.nextInt(10000))
      // mutate 20% of tokens -> known-ish overlap
      val mut = base.map(t => if (r.nextDouble() < 0.2) "m" + r.nextInt(10000) else t)
      val sa = shingles(base.mkString(" "), 2)
      val sb = shingles(mut.mkString(" "), 2)
      val truth = jaccard(sa, sb)
      val ha = minhash(sa, 128); val hb = minhash(sb, 128)
      val est = ha.zip(hb).count { case (x, y) => x == y } / 128.0
      assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
    }
  }

  test("identical docs share every band; disjoint docs share none (w.h.p.)") {
    val a = shingles("alpha beta gamma delta epsilon zeta", 2)
    val b = shingles("one two three four five six seven", 2)
    val ba = lshBands(minhash(a, 32), 8, 4)
    val bb = lshBands(minhash(b, 32), 8, 4)
    assert(ba.toSeq == lshBands(minhash(a, 32), 8, 4).toSeq) // deterministic
    assert(ba.intersect(bb).isEmpty)
  }

  test("simhash: near-identical docs have small hamming distance, unrelated large") {
    val r = new Random(7)
    val base = Seq.fill(300)("w" + r.nextInt(1000))
    val near = base.updated(5, "changed").updated(100, "other")
    val far = Seq.fill(300)("x" + r.nextInt(1000))
    val h0 = simhash(base.mkString(" "))
    val hNear = simhash(near.mkString(" "))
    val hFar = simhash(far.mkString(" "))
    assert(hamming(h0, hNear) < 12)
    assert(hamming(h0, hFar) > 20)
  }

  test("winnowing: fingerprints overlap heavily under local edits") {
    val r = new Random(13)
    val text = randText(r, 300)
    val edited = text.replaceFirst("tok", "edited")
    val f1 = winnow(text).map(_._2).toSet
    val f2 = winnow(edited).map(_._2).toSet
    val overlap = f1.intersect(f2).size.toDouble / f1.size
    assert(overlap > 0.9, s"overlap=$overlap")
  }

  test("winnowing guarantees at least one pick per window and is deterministic") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val f = winnow(t, k = 5, window = 4)
    assert(f.nonEmpty)
    assert(f.toSeq == winnow(t, k = 5, window = 4).toSeq)
    // positions strictly increasing
    assert(f.map(_._1).toSeq == f.map(_._1).sorted.toSeq)
    // gap between consecutive picks never exceeds the window
    f.map(_._1).sliding(2).foreach {
      case Array(a, b) => assert(b - a <= 4)
      case _ =>
    }
  }

  test("hash64 is stable (golden pins for cross-version determinism)") {
    assert(hash64("spark", 1L) == hash64("spark", 1L))
    assert(hash64("spark", 1L) != hash64("spark", 2L))
    assert(hash64("spark", 1L) != hash64("sparl", 1L))
  }
}
