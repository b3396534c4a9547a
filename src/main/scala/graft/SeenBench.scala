package graft

import graft.round.CrawlRound
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence for the burst-confirm scale claim: with a fixed suspect set,
  * growing the cumulative seen table 30× must NOT grow confirm cost
  * 30× — the bloom-prefiltered path scans seen (columnar, single long
  * column, no exchange) instead of shuffling it. The contrast mode runs
  * the shape this design replaced (a plain anti join where the planner
  * moves the seen table through an exchange) on the same inputs.
  *
  * Suspect count sits ABOVE [[CrawlRound.SuspectBloomGate]] so the
  * measured path is the burst regime; 50% of suspects are true seen
  * members (worst-ish case: the anti join's build side is half the
  * suspect set).
  */
object SeenBench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-seen-bench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Stage a seen table of n odd hashes and a suspect table where half the
    * hashes are seen members, half novel evens. Deterministic. url_hash2
    * is a fixed function of url_hash on both sides so true members match
    * on the full (url_hash, url_hash2) confirm pair. */
  private def stage(s: SparkSession, scratch: String, nSeen: Long,
                    nSuspects: Long): (String, String) = {
    val seenPath = s"$scratch/seen-$nSeen"
    s.range(nSeen).selectExpr("id * 2 + 1 as url_hash",
        "xxhash64(id * 2 + 1) as url_hash2")
      .sortWithinPartitions("url_hash")
      .write.mode("overwrite").parquet(seenPath)
    val susPath = s"$scratch/sus-$nSeen"
    s.range(nSuspects).selectExpr(
      "CASE WHEN id % 2 = 0 THEN (id % " + nSeen + ") * 2 + 1 " +
        "ELSE id * 2 END as url_hash",
      "xxhash64(CASE WHEN id % 2 = 0 THEN (id % " + nSeen + ") * 2 + 1 " +
        "ELSE id * 2 END) as url_hash2",
      "concat('http://s', id) as url")
      .write.mode("overwrite").parquet(susPath)
    (seenPath, susPath)
  }

  /** One timed confirm; mode "probe" = the engine's burst path, mode
    * "shuffle" = the replaced shape (plain anti join, broadcast disabled
    * so the planner does what it would do at design-point stats). */
  def measure(nSeen: Long, nSuspects: Long, mode: String, scratch: String,
              cores: Int = 8): Double = {
    val s = session(cores)
    try {
      val (seenPath, susPath) = stage(s, scratch, nSeen, nSuspects)
      val seen = s.read.parquet(seenPath)
      val suspects = s.read.parquet(susPath)
      // warm the page cache + JIT on an untimed pass
      seen.agg(count(lit(1))).collect()
      suspects.agg(count(lit(1))).collect()
      val t0 = System.nanoTime()
      val n = mode match {
        case "probe" =>
          CrawlRound.confirmNew(seen, suspects, nSuspects).count()
        case "shuffle" =>
          val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try suspects.join(seen, CrawlRound.ConfirmKey, "left_anti").count()
          finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      }
      require(n == nSuspects / 2, s"confirm returned $n")
      (System.nanoTime() - t0) / 1e9
    } finally s.stop()
  }

  /** GENUINELY interleaved 2 reps, min per point: each rep measures the
    * small and big points adjacently (small-a, big-a, small-b, big-b per
    * mode), so the ratio never compares time blocks minutes apart on a VM
    * whose parallel capability drifts 40%+ over tens of minutes
    * (BASELINE.md §variance). */
  def json(small: Long, factor: Int, nSuspects: Long, scratch: String): String = {
    val big = small * factor
    def pair(mode: String): (Double, Double) = {
      val (s1, b1) = (measure(small, nSuspects, mode, s"$scratch/a"),
        measure(big, nSuspects, mode, s"$scratch/a"))
      val (s2, b2) = (measure(small, nSuspects, mode, s"$scratch/b"),
        measure(big, nSuspects, mode, s"$scratch/b"))
      (math.min(s1, s2), math.min(b1, b2))
    }
    val (pS, pB) = pair("probe")
    val (sS, sB) = pair("shuffle")
    s"""{"seen_small":$small,"seen_big":$big,"suspects":$nSuspects,""" +
      s""""sec_probe_small":${f"$pS%.3f"},"sec_probe_big":${f"$pB%.3f"},""" +
      s""""probe_ratio":${f"${pB / pS}%.3f"},""" +
      s""""sec_shuffle_small":${f"$sS%.3f"},"sec_shuffle_big":${f"$sB%.3f"},""" +
      s""""shuffle_ratio":${f"${sB / sS}%.3f"},""" +
      s""""reps":"2 interleaved, min per point"}"""
  }

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("GRAFT_SB_SMALL", "1000000").toLong
    val factor = sys.env.getOrElse("GRAFT_SB_FACTOR", "30").toInt
    val nSus = sys.env.getOrElse("GRAFT_SB_SUSPECTS", "500000").toLong
    val scratch = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        if (java.nio.file.Files.isWritable(
          java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
        else System.getProperty("java.io.tmpdir")), "graft-sb").toString
    println(json(small, factor, nSus, scratch))
  }
}
