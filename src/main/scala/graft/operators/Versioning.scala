package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q49: snapshot diff — dataset versioning / change detection between
  * two corpus snapshots, the missing front end of every incremental
  * path in this engine: its output is exactly the work-list an
  * incremental re-index (StreamIndexer epoch), an incremental dedup
  * (q44's feed), or a training-data release note needs. Datasets at
  * crawl scale ship as versioned snapshots (The Stack / Dolma release
  * diffs); re-deriving "what changed" by re-processing the whole new
  * snapshot forfeits incrementality at the first step.
  *
  * Semantics: keyed by doc_id, payload identity by content digest —
  *   - `added`:   doc_id only in the new snapshot;
  *   - `removed`: doc_id only in the old snapshot;
  *   - `changed`: both sides, digests differ;
  *   - `same`:    both sides, digests equal.
  * Output carries both digests (null where the side is absent) so a
  * consumer can route work without touching text.
  *
  * Scale shape: each side reduces to (doc_id, md5(text)) MAP-SIDE —
  * the text column never shuffles; the only exchange is the full outer
  * equi-join on doc_id, 2 slim columns a side (16 B digests), which
  * Spark co-partitions — at 10¹² docs that is the floor for an exact
  * keyed diff and orders of magnitude under re-ingesting the snapshot.
  * The classification is one null-safe CASE column. No collect, no
  * window, no skew surface (doc_id is unique per side, so join groups
  * are 1×1).
  *
  * Sandbox fixture: the "old" snapshot is synthesized DETERMINISTICALLY
  * from the documents table (no external data) — docs with
  * doc_id % 13 == 0 are absent from old (⇒ `added`), docs with
  * doc_id % 7 == 0 carry edited text in old (⇒ `changed`), and old
  * additionally holds retired ids `-(doc_id) - 1` for
  * doc_id % 17 == 0 (⇒ `removed`); everything else is `same`. A real
  * deployment passes two snapshot paths instead.
  */
object Versioning {

  /** The deterministic "old snapshot" view of the documents table used
    * by the q49 fixture (see object scaladoc for the planted regimes). */
  private[operators] def oldSnapshot(spark: SparkSession,
                                     dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val kept = docs.filter($"doc_id" % 13 =!= 0)
      .select($"doc_id",
        when($"doc_id" % 7 === 0, concat($"text", lit(" [old-rev]")))
          .otherwise($"text").as("text"))
    val retired = docs.filter($"doc_id" % 17 === 0)
      .select((-$"doc_id" - 1).as("doc_id"), $"text")
    kept.unionAll(retired)
  }

  /** q49: diff the current documents table against [[oldSnapshot]].
    * `snapshotDiffOf` is the general two-path form. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    snapshotDiffOf(
      oldSnapshot(spark, dir),
      spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", $"text"))
  }

  /** General form: diff any two (doc_id, text) snapshots. */
  def snapshotDiffOf(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), md5(col("text")).as("old_digest"))
    val n = newSnap.select(col("doc_id"), md5(col("text")).as("new_digest"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_digest"), col("new_digest"),
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") === col("new_digest"), "same")
          .otherwise("changed").as("status"))
      .orderBy(col("doc_id"))
  }

  /** Oracle mirror of [[snapshotDiff]]: the same old-snapshot synthesis
    * and null-keyed classification in SQL (DuckDB md5 == Spark md5:
    * lowercase hex, proven by the q30/q44 digest oracles). */
  val snapshotDiffSql: String =
    """WITH old AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' [old-rev]'
      |              ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1 AS doc_id, text
      |  FROM documents WHERE doc_id % 17 = 0),
      |o AS (SELECT doc_id, md5(text) AS old_digest FROM old),
      |n AS (SELECT doc_id, md5(text) AS new_digest FROM documents)
      |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |       o.old_digest AS old_digest, n.new_digest AS new_digest,
      |       CASE WHEN o.old_digest IS NULL THEN 'added'
      |            WHEN n.new_digest IS NULL THEN 'removed'
      |            WHEN o.old_digest = n.new_digest THEN 'same'
      |            ELSE 'changed' END AS status
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin
}
