package graft.analysis

/** Pure sketch/fingerprint primitives for the dedup operator family
  * (builder-prompt training-data pipeline ops): MinHash signatures,
  * SimHash, and rolling-hash winnowing fingerprints. All deterministic
  * pure functions — safe in codegen'd closures and identical across
  * partitionings/parallelism (the property every distributed dedup job
  * needs).
  */
object Fingerprints {

  /** 64-bit splittable hash (same mixer as corpus.Synth). */
  def hash64(s: String, seed: Long): Long = {
    var h = seed ^ 0x9e3779b97f4a7c15L
    var i = 0
    while (i < s.length) {
      h = graft.corpus.Synth.mix(h ^ s.charAt(i).toLong)
      i += 1
    }
    graft.corpus.Synth.mix(h)
  }

  /** Word n-gram shingles of a lowercased, whitespace-split text. */
  def shingles(text: String, n: Int): Array[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty else Array(toks.mkString(" "))
    } else toks.sliding(n).map(_.mkString(" ")).toArray
  }

  /** MinHash signature: k independent permutations approximated by k
    * seeded hashes; sig(i) = min over shingles of hash_i(shingle). */
  def minhash(sh: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < k) {
        val h = hash64(sh(i), 0x5EED0000L + j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`;
    * band key = (bandIdx, hash of the band's rows). Two docs sharing any
    * band key are candidate pairs. */
  def lshBands(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    require(bands * rowsPerBand <= sig.length)
    Array.tabulate(bands) { b =>
      var h = 0x1357BDL ^ b.toLong
      var r = 0
      while (r < rowsPerBand) {
        h = graft.corpus.Synth.mix(h ^ sig(b * rowsPerBand + r))
        r += 1
      }
      // pack band index into the key so different bands never collide
      (h & 0x00FFFFFFFFFFFFFFL) | (b.toLong << 56)
    }
  }

  /** Exact Jaccard over shingle sets. */
  def jaccard(a: Array[String], b: Array[String]): Double = {
    val sa = a.toSet; val sb = b.toSet
    if (sa.isEmpty && sb.isEmpty) return 1.0
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** 64-bit SimHash over token multiset: weighted bit-vote of token
    * hashes; near-dups have small hamming distance. */
  def simhash(text: String): Long = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hash64(toks(i), 0x51AABBL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing (Schleimer et al., SIGMOD'03): rolling polynomial hash of
    * character k-grams, window-minimum selection → robust local document
    * fingerprints. Returns the selected (position, hash) pairs. */
  def winnow(text: String, k: Int = 8, window: Int = 4): Array[(Int, Long)] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ")
    if (s.length < k) return Array.empty
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    val Base = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hs(0) = graft.corpus.Synth.mix(h)
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hs(i) = graft.corpus.Synth.mix(h)
      i += 1
    }
    // window minimum with rightmost-tie rule
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var lastPicked = -1
    i = 0
    val nw = math.max(1, n - window + 1)
    while (i < nw) {
      var minIdx = i
      var j = i + 1
      while (j < math.min(i + window, n)) {
        if (hs(j) <= hs(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastPicked) { out += ((minIdx, hs(minIdx))); lastPicked = minIdx }
      i += 1
    }
    out.toArray
  }
}
