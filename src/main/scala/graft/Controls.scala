package graft

/** Pure-JVM scaling controls (no Spark): quantify what THIS machine can
  * scale N→4N threads in the same minutes as a crawl benchmark run. The
  * sandbox VM's parallel capability drifts 40%+ over tens of minutes
  * (BASELINE.md §virtualization note), so a Spark job's measured scaling
  * efficiency is only interpretable next to a same-session ceiling.
  *
  *  - cpu: register-arithmetic loop (xxhash of a counter) — pure ALU,
  *    no memory traffic; measures raw vCPU scaling.
  *  - membw: strided sum over per-thread 256 MB long arrays (≫ L3,
  *    one load per 64 B cache line) — aggregate memory-bandwidth scaling,
  *    the resource a scan/shuffle/parquet workload actually stresses.
  *
  * Per-thread work is FIXED, so perfect scaling = equal wall time and
  * efficiency(n→n4) = T_n / T_n4.
  */
object Controls {

  private def run(threads: Int, membw: Boolean, passes: Int,
                  arrays: Array[Array[Long]]): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var acc = 0L
        if (membw) {
          val a = arrays(t)
          var pass = 0
          while (pass < passes) {
            var i = 0
            while (i < a.length) { acc += a(i); i += 64 / 8 } // 64B stride
            pass += 1
          }
        } else {
          var i = 0L
          val end = passes.toLong * 100000000L
          while (i < end) { acc ^= graft.core.XxHash64.hashLong(i); i += 1 }
        }
        if (acc == 42L) println("") // defeat dead-code elimination
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Per-thread membw arrays, allocated ONCE and reused across every rep
    * and level (controlEff runs 3 reps × 2 levels — fresh 2 GB allocations
    * per call were heap-churn that could abort the bench AFTER the
    * expensive crawl measurements). Array length is sized from the heap
    * with a floor so a small-heap JVM degrades instead of OOMing; the
    * length is fixed at first use, so per-thread work stays identical
    * across the levels being compared. */
  private var membwPool: Array[Array[Long]] = Array.empty
  private def arraysFor(threads: Int, maxThreads: Int): Array[Array[Long]] =
    synchronized {
      if (membwPool.length < threads) {
        val full = 32 * 1024 * 1024 // 256 MB per thread
        val len =
          if (membwPool.nonEmpty) membwPool(0).length // keep work comparable
          else {
            // budget against the LARGEST level the pool will grow to —
            // passed in by the caller from the levels it will actually
            // run (a hardcoded 8 here let SPARK_GRAFT_BENCH_ORDER=2,32
            // grow the pool to 4× the intended half-heap budget after
            // the expensive crawl measurements — ADVICE r3)
            val budget =
              Runtime.getRuntime.maxMemory / 2 / 8 / math.max(threads, maxThreads)
            math.max(4 * 1024 * 1024, math.min(full.toLong, budget)).toInt
          }
        membwPool = membwPool ++ Array.fill(threads - membwPool.length)(
          Array.tabulate(len)(i => i.toLong))
      }
      membwPool
    }

  def controlSecs(threads: Int, membw: Boolean, maxThreads: Int = 8): Double = {
    val arrays = if (membw) arraysFor(threads, maxThreads) else null
    run(threads, membw, passes = 2, arrays) // untimed: JIT + page faults
    run(threads, membw, passes = if (membw) 24 else 4, arrays)
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** Median of 3 interleaved reps per level — host noise hits even pure
    * ALU loops at the 60% level between runs, so single samples lie. */
  def controlEff(n: Int, n4: Int, membw: Boolean): Double = {
    val m = math.max(n, n4)
    val pairs = (1 to 3).map(_ =>
      (controlSecs(n, membw, m), controlSecs(n4, membw, m)))
    median(pairs.map(_._1)) / median(pairs.map(_._2))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2
    val n4 = if (args.length > 1) args(1).toInt else 8
    println(f"[controls] cpu:   eff($n->$n4)=${controlEff(n, n4, membw = false)}%.3f")
    println(f"[controls] membw: eff($n->$n4)=${controlEff(n, n4, membw = true)}%.3f")
  }
}
