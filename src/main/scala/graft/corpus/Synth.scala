package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus in the BASELINE.json
  * `input_hint` shape: (repo, path, commit, lang, content) +
  * content_sha256 stored at synth time (ingest recomputes and asserts —
  * the per-row invariant). FIXTURES.md §1.
  *
  * Everything is a pure function of (seed, docId) via splitmix64, so the
  * corpus is identical across runs, partitioning layouts, and parallelism
  * levels — the property the scaling benchmark and resume tests rely on.
  * Generation itself is distributed (`spark.range` → map), no driver-side
  * materialization: the same generator would produce the 10^12-file-scale
  * table on a real cluster.
  */
object Synth {

  val Seed = 42L

  // splitmix64: the splittable hash FIXTURES.md specifies
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = mix(s); s }
    def nextInt(bound: Int): Int =
      ((nextLong() >>> 1) % bound).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val langs = Array("scala", "java", "py", "go", "js")
  private val langCum = Array(30, 55, 75, 90, 100) // weights {30,25,20,15,10}
  private val ext = Map("scala" -> "scala", "java" -> "java", "py" -> "py",
    "go" -> "go", "js" -> "js")

  /** Code stopwords at the head of the Zipf distribution → posting skew. */
  private val hotTerms = Array(
    "the", "if", "return", "import", "val", "def", "for", "while", "new",
    "this", "class", "public", "static", "void", "int", "string", "license",
    "copyright", "apache", "version", "under", "distributed", "limitations",
    "func", "type", "var", "let", "const", "true", "false")

  private val identHeads = Array("get", "set", "build", "parse", "run",
    "load", "make", "read", "write", "find", "merge", "split", "index",
    "query", "score", "rank", "token", "batch", "shard", "cache")
  private val identTails = Array("Config", "Manager", "Handler", "Builder",
    "Context", "Result", "Buffer", "Stream", "Record", "Partition",
    "Segment", "Cursor", "Offset", "Metric", "Schema", "Codec", "Worker",
    "Client", "Server", "Table")

  /** Cold vocabulary term i of 5000: stable pseudo-words. */
  def coldTerm(i: Int): String = {
    val r = new Rng(mix(0xC01D ^ i.toLong))
    val len = 4 + r.nextInt(8)
    val sb = new StringBuilder
    val cons = "bcdfghjklmnprstvwz"; val vow = "aeiou"
    var k = 0
    while (k < len) {
      sb += (if (k % 2 == 0) cons.charAt(r.nextInt(cons.length))
             else vow.charAt(r.nextInt(vow.length)))
      k += 1
    }
    sb.toString
  }

  /** Zipf(s≈1.1)-ish vocab draw over 5000 ranks; rank<30 → hot terms. */
  private def drawTerm(r: Rng): String = {
    // inverse-power sampling: rank ~ floor(u^(-1/(s-1)) style heavy tail,
    // clamped to vocab size; cheap + deterministic
    val u = r.nextDouble() max 1e-9
    val rank = math.min((math.pow(u, -0.55) - 1).toInt, 4999)
    if (rank < hotTerms.length) hotTerms(rank) else coldTerm(rank)
  }

  /** One synthetic source line. */
  private def line(r: Rng): String = {
    val n = 4 + r.nextInt(9)
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb += ' '
      r.nextInt(20) match {
        case 0 => // camelCase identifier (F10)
          sb ++= identHeads(r.nextInt(identHeads.length))
          sb ++= identTails(r.nextInt(identTails.length))
        case 1 => // snake_case identifier
          sb ++= identHeads(r.nextInt(identHeads.length))
          sb += '_'
          sb ++= identTails(r.nextInt(identTails.length)).toLowerCase
        case 2 => sb ++= (100 + r.nextInt(99900)).toString // number (F7)
        case 3 => sb ++= s"${1 + r.nextInt(12)}/${1 + r.nextInt(28)}/20${10 + r.nextInt(16)}" // date (F8)
        case 4 => sb ++= s"${drawTerm(r)}-${drawTerm(r)}" // hyphen (F9)
        case 5 => sb ++= s"https://www.${coldTerm(r.nextInt(500))}.com/x" // url (F13)
        case 6 => sb ++= s"'${drawTerm(r)}." // quote/dot trim (F15)
        case _ => sb ++= drawTerm(r)
      }
      k += 1
    }
    sb.toString
  }

  /** Pure content generator for one doc. 20-400 lines. */
  def content(docId: Long): String = {
    val r = new Rng(mix(Seed ^ docId))
    val nLines = 20 + r.nextInt(381)
    val sb = new StringBuilder
    var k = 0
    while (k < nLines) { sb ++= line(r); sb += '\n'; k += 1 }
    sb.toString
  }

  def lang(docId: Long): String = {
    val x = new Rng(mix(Seed ^ docId ^ 0x1A26L)).nextInt(100)
    langs(langCum.indexWhere(x < _))
  }

  /** The docs table, distributed end-to-end. */
  def docs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      it.map { id =>
        val r = new Rng(mix(Seed ^ id ^ 0x9A7FL))
        val repo = s"org${(id % 37)}/repo${(id % 211)}"
        val lg = lang(id)
        val path = s"src/dir${r.nextInt(13)}/File${r.nextInt(997)}.${ext(lg)}"
        val commit = f"${mix(Seed ^ id ^ 0xC0117L)}%016x" * 2 + "00000000"
        val c = content(id)
        // deterministic commit-time stand-in for the reference's
        // non-deterministic datetime.now() recency (indexer.py:170-178,
        // SURVEY §1.1(5)): pure function of docId, epoch-seconds range
        val ts = 1500000000L + (mix(Seed ^ id ^ 0x7153L) >>> 34)
        (repo, path, commit.take(40), lg, c, id, ts)
      }
    }.toDF("repo", "path", "commit", "lang", "content", "doc_id", "ingest_ts")
      .withColumn("content_sha256", sha2($"content", 256))
  }

  /** Write an Iceberg-compatible snapshot-style layout (SURVEY.md §7.6:
    * no Iceberg jar in sandbox; parquet dir stands in). */
  def write(spark: SparkSession, n: Long, dir: String): Unit =
    docs(spark, n).write.mode("overwrite").parquet(s"$dir/snapshot-0")
}
