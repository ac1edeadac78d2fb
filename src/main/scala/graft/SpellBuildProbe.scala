package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: time the spell-artifact phase components (vocab
  * aggregate guard, vocab collect, DeleteIndex.build kernel, artifact
  * write) in isolation against a real index's term_stats. */
object SpellBuildProbe {
  def main(args: Array[String]): Unit = {
    val idxDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE_$name=${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm
    spark.read.parquet(s"$idxDir/term_stats").count()
    val lenCol = length($"term").cast("long")
    t("agg_guard") {
      spark.read.parquet(s"$idxDir/term_stats")
        .select((lit(1L) + lenCol +
          when(lenCol <= lit(24L), (lenCol * (lenCol - lit(1L)) / 2).cast("long"))
            .otherwise(lit(0L))).as("e"))
        .agg(coalesce(sum($"e"), lit(0L))).head().getLong(0)
    }
    val vocab = t("collect") {
      spark.read.parquet(s"$idxDir/term_stats")
        .select($"term", $"df").as[(String, Long)].collect()
    }
    println(s"PROBE_VOCAB=${vocab.length}")
    var ix: graft.query.Spell.DeleteIndex = null
    t("kernel_run1") { ix = graft.query.Spell.DeleteIndex.build(vocab) }
    t("kernel_run2") { ix = graft.query.Spell.DeleteIndex.build(vocab) }
    t("kernel_run3") { ix = graft.query.Spell.DeleteIndex.build(vocab) }
    t("write") { graft.query.SpellStore.write("/tmp/spell_probe_out", ix) }
    spark.stop()
  }
}
