package graft.tools

/** Attribution probe for the two-parallelism-level scaling series
  * (BENCH/BASELINE.md): separates CPU-core scaling from shared-DRAM
  * scaling on this single-socket sandbox, with no Spark involved.
  *
  * Two kernels, identical harness, fixed TOTAL work split across n
  * threads, efficiency = T(n) / (4 · T(4n)):
  *
  *  - `compute`: a register-only 64-bit mix chain (xxhash-style
  *    multiply/rotate) — touches no memory beyond its own stack. On a
  *    machine where cores are independent this must scale ~1.0; any
  *    deficit is frequency scaling (turbo dropping as cores wake) or
  *    scheduler noise.
  *  - `stream`: strided sums over a shared long array much larger than
  *    LLC — every add pulls a cache line from DRAM. n threads share ONE
  *    socket's memory controllers here, so its efficiency ceiling is
  *    bandwidth/`T(n)`-bandwidth, the exact artifact a multi-node cluster
  *    does not have (each executor node brings its own controllers).
  *
  * The gap between the two efficiencies bounds how much of any Spark-job
  * efficiency deficit is attributable to the shared memory bus rather
  * than to the job's plan (shuffles, stragglers, skew).
  *
  *   runMain graft.tools.CoreScalingProbe [n] [gibibytes] [reps]
  */
object CoreScalingProbe {

  private def mix(seed: Long, iters: Long): Long = {
    var h = seed | 1L
    var i = 0L
    while (i < iters) {
      h = java.lang.Long.rotateLeft(h * -7046029288634856825L, 31) * -4417276706812531889L
      h ^= h >>> 33
      i += 1
    }
    h
  }

  /** Run `body(threadIdx)` on n threads, return (wall seconds, xor of results). */
  private def onThreads(n: Int)(body: Int => Long): (Double, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val ts = (0 until n).map { i =>
      val t = new Thread(() => { acc.getAndAccumulate(body(i), _ ^ _) })
      t.start(); t
    }
    ts.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, acc.get())
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2
    val gib = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3

    // ---- stream kernel data: one shared array, far beyond any LLC ----
    val words = gib.toLong * (1L << 30) / 8L
    require(words <= Int.MaxValue, s"array too large: $words words")
    val a = new Array[Long](words.toInt)
    java.util.Arrays.fill(a, 0x9e3779b97f4a7c15L) // fault + dirty every page
    val totalMixIters = 40L * 1000L * 1000L * 1000L // ~tens of seconds at 2 threads

    def computeAt(threads: Int): Double = {
      val per = totalMixIters / threads
      val (sec, _) = onThreads(threads)(i => mix(i + 1L, per))
      sec
    }
    // each thread sums a disjoint slice; 3 passes so wall >> startup
    def streamAt(threads: Int, passes: Int = 3): Double = {
      val len = a.length
      val slice = len / threads
      val (sec, _) = onThreads(threads) { i =>
        val lo = i * slice
        val hi = if (i == threads - 1) len else lo + slice
        var s = 0L
        var p = 0
        while (p < passes) {
          var j = lo
          while (j < hi) { s += a(j); j += 1 }
          p += 1
        }
        s
      }
      sec
    }

    def series(name: String, run: Int => Double): Unit = {
      val lo = (1 to reps).map(_ => run(n))
      val hi = (1 to reps).map(_ => run(4 * n))
      val eff = lo.min / (4.0 * hi.min)
      System.err.println(
        f"[core-probe] $name: T($n)=${lo.min}%.2fs ${lo.map(s => f"$s%.2f").mkString("[", ",", "]")} " +
        f"T(${4 * n})=${hi.min}%.2fs ${hi.map(s => f"$s%.2f").mkString("[", ",", "]")} eff=$eff%.3f")
      println(f"""{"kernel":"$name","n":$n,"t_n":${lo.min}%.2f,"t_4n":${hi.min}%.2f,"efficiency":$eff%.3f}""")
    }

    // warm-up: JIT both kernels at low iteration counts
    onThreads(2)(i => mix(i, 1000000L)); streamAt(2, 1)

    series("compute", computeAt)
    series("stream", t => streamAt(t))
  }
}
