package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CosBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(2000000).select($"id",
        expr("transform(sequence(0, 63), i -> CAST(pmod(id * (i + 7) + i, 97) + 1 AS FLOAT))").as("embedding"),
        expr("transform(sequence(0, 63), i -> CAST(pmod(id * (i + 13) + i, 89) + 1 AS FLOAT))").as("qe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count()
    val hof = expr(
      """aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
        | / (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
        |  * sqrt(aggregate(transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin)
    val nat = graft.functions.CosineSimilarity.cosine(col("embedding"), col("qe"))
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      df.select(sum(c)).collect() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"COSBENCH $name min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // equality first (bit-exact)
    val neq = df.select(hof.as("a"), nat.as("b")).filter($"a" =!= $"b").count()
    println(s"COSBENCH mismatches=$neq")
    time("hof", hof)
    time("native", nat)
    spark.stop()
  }
}
