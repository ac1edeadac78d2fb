package graft
/** Dev microbench: tokenizer thread-scaling without Spark — isolates
  * JVM/memory-bandwidth effects from the Spark pipeline (BASELINE.md
  * scaling analysis). */
object TokBench {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val nDocs = 40000
    val texts = (0L until 1000L).map(graft.corpus.Synth.content).toArray
    // warmup; tokenizeRaw is the exact path the index build runs
    val cfg = graft.analysis.Tokenizer.default
    texts.take(200).foreach(t => graft.analysis.Tokenizer.tokenizeRaw(t, cfg))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (0 until nDocs).grouped(nDocs / (threads * 4)).map { chunk =>
      pool.submit(new Runnable {
        def run(): Unit = chunk.foreach { i =>
          graft.analysis.Tokenizer.tokenizeRaw(texts(i % texts.length), cfg)
        }
      })
    }.toList
    futs.foreach(_.get())
    val sec = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    println(f"TOK_THREADS=$threads TOK_SECONDS=$sec%.2f TOK_DOCS_PER_SEC=${nDocs / sec}%.0f")
  }
}
