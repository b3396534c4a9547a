package graft

import java.sql.Timestamp
import java.time.YearMonth

import graft.core.Crawl
import graft.driver.CrawlLoop
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence for the O(delta)-frontier claim: per-round wall time must stay
  * FLAT as the pending frontier grows 10× under a fixed politeness budget
  * (the r1 design windowed + rewrote the whole frontier every round, so
  * its round time grew linearly with frontier size).
  *
  * Setup isolates frontier machinery: N pending seed urls across 200
  * hosts, budget 2/host, a pages table that matches (almost) nothing — so
  * every round is: head window-rank → fetch join (tiny) → miss log →
  * head/backlog maintenance. Refill rounds are INCLUDED in the average
  * (they are part of the amortized story). Bootstrap cost is measured
  * separately (maxRounds=0 run) and subtracted.
  */
object FrontierBench {

  val NHosts = 200

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-frontier-bench")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class Point(pending: Long, rounds: Int, bootSec: Double,
                         totalSec: Double) {
    def perRoundSec: Double = (totalSec - bootSec) / rounds
  }

  /** Run `rounds` crawl rounds over `nPending` pending urls; returns the
    * measured point. A fresh session per run (cores fixed) keeps JIT/page
    * cache effects comparable. */
  def measure(nPending: Long, rounds: Int, scratch: String,
              cores: Int = 8): Point = {
    val s = session(cores)
    try {
      import s.implicits._
      val urls = s.range(nPending).select(
        format_string("http://h%d.bench.test/p/%d",
          pmod(col("id"), lit(NHosts.toLong)), col("id")).as("url"))
      val seeds = urls.collect().map(_.getString(0)).toIndexedSeq
      // pages: one never-matching row — every selected url is a miss, so
      // round time is pure frontier machinery + bookkeeping
      val pagesPath = s"$scratch/pages-$nPending"
      Seq(("http://none.bench.test/", new Timestamp(0L),
        Array[Byte](0), "", "und"))
        .toDF("url", "warc_ts", "html", "text", "lang")
        .write.mode("overwrite").parquet(pagesPath)
      val pages = s.read.parquet(pagesPath)

      def cfg(maxRounds: Int) = Crawl.CrawlConfig(
        startMonth = YearMonth.of(2019, 1), endMonth = YearMonth.of(2019, 12),
        today = YearMonth.of(2019, 6), indexPageBudget = 0,
        perHostBudget = 2, maxRounds = maxRounds)

      // untimed: bootstrap + 4 warmup rounds (JIT, driver GC from the
      // seed materialization); then time rounds 5..4+rounds via resume
      val wh = s"$scratch/wh-$nPending"
      val warmupRounds = 4
      CrawlLoop.run(s, pages, seeds, cfg(warmupRounds), wh,
        expectedUrls = 1L << 22)
      System.gc()
      val t0 = System.nanoTime()
      CrawlLoop.run(s, pages, seeds, cfg(warmupRounds + rounds), wh,
        expectedUrls = 1L << 22, resume = true)
      val totalSec = (System.nanoTime() - t0) / 1e9
      Point(nPending, rounds, 0.0, totalSec)
    } finally s.stop()
  }

  /** Standalone runner: prints one JSON line with the small/big points. */
  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("GRAFT_FB_SMALL", "100000").toLong
    val factor = sys.env.getOrElse("GRAFT_FB_FACTOR", "30").toInt
    val rounds = sys.env.getOrElse("GRAFT_FB_ROUNDS", "10").toInt
    val scratch = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        if (java.nio.file.Files.isWritable(
          java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
        else System.getProperty("java.io.tmpdir")), "graft-fb").toString
    println(json(small, factor, rounds, scratch))
  }

  /** Evidence shape: the r1 design windowed + rewrote the whole frontier
    * per round, so `factor`× more pending ⇒ ~`factor`× the round time; the
    * tiered design's rounds touch O(head + new) and must stay FLAT. Rounds
    * here are 2-4 s and latency-dominated, so single points are noisy
    * (observed 0.5-1.4 run-to-run at 10×): measure each pending size
    * twice, interleaved, and take the min — a factor-of-`factor` blowup
    * cannot hide under that noise floor. */
  def json(small: Long, factor: Int, rounds: Int, scratch: String): String = {
    val (p1a, p2a) = (measure(small, rounds, s"$scratch/a"),
      measure(small * factor, rounds, s"$scratch/a2"))
    val (p1b, p2b) = (measure(small, rounds, s"$scratch/b"),
      measure(small * factor, rounds, s"$scratch/b2"))
    val p1 = Seq(p1a, p1b).minBy(_.perRoundSec)
    val p2 = Seq(p2a, p2b).minBy(_.perRoundSec)
    val ratio = p2.perRoundSec / p1.perRoundSec
    s"""{"pending_small":${p1.pending},"sec_per_round_small":${f"${p1.perRoundSec}%.3f"},""" +
      s""""pending_big":${p2.pending},"sec_per_round_big":${f"${p2.perRoundSec}%.3f"},""" +
      s""""rounds":$rounds,"reps":"2 interleaved, min per point",""" +
      s""""pending_factor":$factor,"round_time_ratio":${f"$ratio%.3f"}}"""
  }
}
