package graft
import org.apache.spark.sql.SparkSession
/** Tiny forked smoke for the flagship entry (driver runs entry its own
  * way; sbt console's unforked REPL clashes with Spark on JDK17). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println("ENTRY_ROWS=" + SparkEntry.entry(s).count())
    s.stop()
  }
}
