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

  /** Sharded-Bloom probe evidence (VERDICT r3 #4): the one-shard-per-row
    * probe must not regress vs the single-filter probe. Same TOTAL
    * geometry both ways (S × per-shard capacity = expected items), same
    * membership, timed over the same staged hash column: one
    * `filter(shardedProbe).count()` per layout, 2 interleaved reps, min.
    * Records positives too (every planted member must probe true — the
    * no-false-negative correctness check rides the measurement). */
  def shardedJson(nItems: Long, nProbes: Long, shards: Int,
                  scratch: String): String = {
    val s = session(8)
    try {
      import s.implicits._
      val p = s"$scratch/sharded-probe"
      // half members (odd ids), half novel (even ids), mixed through the
      // url-hash kernel: shard choice is the hash's TOP bits, so the
      // staged values must be uniform over 64 bits like real url hashes
      // (raw small ids would all land in shard 0 and saturate it)
      s.range(nProbes).map { id =>
        val v = if (id % 2 == 0) (id % nItems) * 2 + 1 else id * 2
        graft.core.XxHash64.hashLong(v)
      }.toDF("url_hash")
        .write.mode("overwrite").parquet(p)
      val df = s.read.parquet(p)
      df.agg(count(lit(1))).collect() // warm page cache + JIT

      def buildAndTime(numShards: Int): (Double, Long) = {
        val filt = graft.frontier.ShardedBloom.empty(nItems, 0.01, numShards)
        var i = 1L
        while (i < nItems * 2) { // all odd values = members
          graft.frontier.ShardedBloom.put(filt,
            graft.core.XxHash64.hashLong(i))
          i += 2
        }
        val bc = s.sparkContext.broadcast(filt)
        val probed = df.filter(graft.frontier.ShardedBloom
          .mightContainCol(bc, col("url_hash")))
        probed.count() // untimed: the first probe pays expression codegen
        val t0 = System.nanoTime()
        val hits = probed.count()
        val sec = (System.nanoTime() - t0) / 1e9
        bc.destroy()
        (sec, hits)
      }
      // interleaved: s1-a, sN-a, s1-b, sN-b — min per layout
      val (a1, h1) = buildAndTime(1)
      val (aN, hN) = buildAndTime(shards)
      val (b1, h1b) = buildAndTime(1)
      val (bN, hNb) = buildAndTime(shards)
      // no false negatives (every member hits) AND no saturation (hits
      // bounded by members + a few % fp — a saturated shard would answer
      // true for everything and flatter the timing)
      val lo = nProbes / 2
      val hi = lo + lo / 10
      require(h1 == h1b && hN == hNb && h1 >= lo && hN >= lo &&
        h1 <= hi && hN <= hi,
        s"probe hits out of range: s1=$h1/$h1b s$shards=$hN/$hNb (want [$lo,$hi])")
      val s1 = math.min(a1, b1)
      val sN = math.min(aN, bN)
      s"""{"items":$nItems,"probes":$nProbes,"shards":$shards,""" +
        s""""sec_probe_s1":${f"$s1%.3f"},"sec_probe_s$shards":${f"$sN%.3f"},""" +
        s""""sharded_over_single":${f"${sN / s1}%.3f"},""" +
        s""""hits_s1":$h1,"hits_s$shards":$hN,""" +
        s""""reps":"2 interleaved, min per layout"}"""
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("sharded")) {
      val scratch = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-shb").toString
      println(shardedJson(2000000L, 4000000L, 8, scratch))
      return
    }
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
