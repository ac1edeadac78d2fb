package graft

/** Dev microbench: what does THIS BOX let a thread ladder scale to?
  * Two pure-JVM probes with zero Spark involvement (BASELINE.md round-2
  * scaling analysis):
  *
  *  - `spin N`: register-only xorshift ALU loop — measures whether the
  *    vCPUs are real (SMT siblings / host oversubscription would cap it).
  *  - `stream N`: cacheline-strided reads over per-thread PRIVATE 64 MB
  *    buffers — measures how aggregate memory bandwidth scales with
  *    threads on the box's one shared memory controller.
  *
  * Measured on the 32-vCPU sandbox box (2026-08-17): spin scales
  * 8->32 threads at 0.92 efficiency (the cores are real), stream at
  * ~0.6 (the memory system saturates) — so any data-moving pipeline's
  * single-box 8->32 number measures the memory controller, not the
  * pipeline. A real N->4N EXECUTOR scale-out multiplies memory
  * controllers by 4; see BASELINE.md for how the scaling criterion is
  * evidenced around this.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val threads = args(1).toInt
    val sink = new Array[Long](threads * 16)
    mode match {
      case "spin" =>
        val iters = 2000000000L
        val ts = (0 until threads).map { id =>
          new Thread(() => {
            var x = 88172645463325252L
            var k = 0L
            while (k < iters) {
              x ^= x << 13; x ^= x >>> 7; x ^= x << 17
              k += 1
            }
            sink(id * 16) = x
          })
        }
        val t0 = System.nanoTime()
        ts.foreach(_.start()); ts.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE mode=spin threads=$threads sec=$sec%.2f " +
          f"total_ops_per_sec=${threads * iters / sec}%.3e")
      case "stream" =>
        val mb = 64
        val bufs = Array.fill(threads)(new Array[Long](mb * 131072))
        for (i <- 0 until threads) java.util.Arrays.fill(bufs(i), i.toLong)
        val reps = 40
        val ts = (0 until threads).map { id =>
          new Thread(() => {
            var s = 0L
            val b = bufs(id)
            var r = 0
            while (r < reps) {
              var k = 0
              while (k < b.length) { s += b(k); k += 8 } // one load per line
              r += 1
            }
            sink(id * 16) = s
          })
        }
        val t0 = System.nanoTime()
        ts.foreach(_.start()); ts.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE mode=stream threads=$threads sec=$sec%.2f " +
          f"lines_gb_per_sec=${threads * reps * mb.toDouble / 1024.0 / sec}%.1f")
      case other => sys.error(s"unknown probe $other")
    }
  }
}
