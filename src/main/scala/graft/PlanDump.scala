package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more
  * SparkEntry queries (all of them with no args) against a test-scale
  * dir — the `.explain("formatted")` iterate-until-it's-the-plan-you-
  * want loop, runnable as a forked main (the sbt console clashes with
  * Spark on JDK 17).
  *
  *   sbt "runMain graft.PlanDump q04_supplier_top_parts q12_dedup_minhash"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
