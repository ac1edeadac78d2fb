package graft
object SynthMain {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.corpus.Synth.write(s, args(1).toLong, args(0))
    s.stop()
  }
}
