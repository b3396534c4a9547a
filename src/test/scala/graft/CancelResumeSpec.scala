package graft

import java.nio.file.{Files, Paths}
import java.time.YearMonth

import graft.core.Crawl
import graft.corpus.{CorpusWriter, SyntheticWeb, WebSpec}
import graft.driver.CrawlLoop
import graft.frontier.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** T6: cancellation ≡ stop-after-round via the control marker; the
  * cancelled warehouse resumes cleanly (checkpointed frontier makes
  * cancel a pause, weibo_crawler.py:186-195 semantics without killing). */
class CancelResumeSpec extends AnyFunSuite {

  test("cancel marker stops before any round; removing it resumes") {
    val spark = TestSpark.spark
    val spec = WebSpec(nForums = 2, indexPagesPerForum = 2,
      postsPerIndexPage = 4, maxRepliesPerPost = 2, commentsPerPage = 3,
      maxCommentPages = 1, nHosts = 4, nUsers = 20)
    val cfg = Crawl.CrawlConfig(YearMonth.of(2019, 1),
      YearMonth.of(2019, 12), YearMonth.of(2019, 6), indexPageBudget = 1,
      perHostBudget = 8, maxRounds = 20)
    val pagesPath = TestSpark.tmpDir("cancel-pages")
    CorpusWriter.write(spark, spec, pagesPath, 4)
    val pages = CorpusWriter.read(spark, pagesPath)
    val wh = TestSpark.tmpDir("cancel-wh")
    val seeds = SyntheticWeb.seeds(spec, 2)

    // pre-planted marker: loop exits immediately after snapshot 0
    Files.createFile(Paths.get(wh, CrawlLoop.CancelMarker))
    val cancelled = CrawlLoop.run(spark, pages, seeds, cfg, wh,
      expectedUrls = 1L << 16)
    assert(cancelled.totalFetched == 0L)
    assert(Snapshots.latestCommittedRound(wh).contains(0))

    // un-cancel → resume completes the crawl, equal to a fresh run
    Files.delete(Paths.get(wh, CrawlLoop.CancelMarker))
    val resumed = CrawlLoop.run(spark, pages, seeds, cfg, wh,
      expectedUrls = 1L << 16, resume = true)
    assert(resumed.totalFetched > 0L)

    val wh2 = TestSpark.tmpDir("cancel-wh2")
    val fresh = CrawlLoop.run(spark, pages, seeds, cfg, wh2,
      expectedUrls = 1L << 16)
    assert(resumed.totalFetched == fresh.totalFetched)
    val a = Snapshots.readLatestTable(spark, wh, "seen_delta").get
      .collect().map(_.getLong(0)).toSet
    val b = Snapshots.readLatestTable(spark, wh2, "seen_delta").get
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("resume across a compaction boundary with sharded blooms on disk") {
    val spark = TestSpark.spark
    import graft.frontier.TieredFrontier
    // deep per-host queues (TieredFrontierSpec's stress shape): guaranteed
    // overflow → backlog → refills → tombstones, so a lowered compaction
    // floor actually triggers mid-crawl
    val spec = WebSpec(nForums = 2, indexPagesPerForum = 1,
      postsPerIndexPage = 24, maxRepliesPerPost = 1, commentsPerPage = 1,
      maxCommentPages = 1, nHosts = 2, nUsers = 10)
    val cfg = Crawl.CrawlConfig(YearMonth.of(2019, 1),
      YearMonth.of(2019, 12), YearMonth.of(2019, 6), indexPageBudget = 1,
      perHostBudget = 2, maxRounds = 80)
    val pagesPath = TestSpark.tmpDir("rc-pages")
    CorpusWriter.write(spark, spec, pagesPath, 4)
    val pages = CorpusWriter.read(spark, pagesPath)
    val seeds = SyntheticWeb.seeds(spec, 2)

    val savedShard = sys.props.get("graft.bloom.maxShardBytes")
    val savedCompact = sys.props.get("graft.frontier.compactMinRows")
    try {
      // ~78 KB filter at 2^16 expected urls / 16 KB cap ⇒ 8 bloom shards
      sys.props("graft.bloom.maxShardBytes") = "16384"
      sys.props("graft.frontier.compactMinRows") = "10"

      val whFull = TestSpark.tmpDir("rc-wh-full")
      val full = CrawlLoop.run(spark, pages, seeds, cfg, whFull,
        expectedUrls = 1L << 16)
      val last = Snapshots.latestCommittedRound(whFull).get
      // the forced geometry really is multi-shard on disk
      assert(Snapshots.readBloomShards(whFull, last).length == 8)
      // find the first compacted round; MUST exist under the lowered floor
      val firstCompacted = (1 to last).find(r =>
        Snapshots.readManifest(whFull, r).exists(_.baseRound == r))
      assert(firstCompacted.nonEmpty, "no compaction happened — raise churn")
      val r0 = firstCompacted.get
      assert(r0 < last, "compaction only at the final round — nothing to resume")

      // interrupted run: stop exactly AT the compaction round (mid-crawl),
      // then resume from the compacted snapshot + 8-shard blooms
      val whC = TestSpark.tmpDir("rc-wh-cut")
      CrawlLoop.run(spark, pages, seeds, cfg.copy(maxRounds = r0), whC,
        expectedUrls = 1L << 16)
      val mCut = Snapshots.readManifest(whC, r0).get
      assert(mCut.baseRound == r0, "cut run did not compact at the same round")
      assert(mCut.frontierCount > 0, "crawl already finished — not mid-crawl")
      val resumed = CrawlLoop.run(spark, pages, seeds, cfg, whC,
        expectedUrls = 1L << 16, resume = true)
      assert(resumed.totalFetched > 0)

      // full parity: per-round fetch log and seen set equal the
      // uninterrupted crawl's
      def fetchLog(wh: String) = Snapshots.readLatestTable(spark, wh,
        "fetch_log").get.filter("status = 'fetched'")
        .select("round", "url").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(fetchLog(whC) == fetchLog(whFull))
      def seen(wh: String) = Snapshots.readLatestTable(spark, wh,
        "seen_delta").get.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(seen(whC) == seen(whFull))
    } finally {
      savedShard match {
        case Some(v) => sys.props("graft.bloom.maxShardBytes") = v
        case None => sys.props -= "graft.bloom.maxShardBytes"
      }
      savedCompact match {
        case Some(v) => sys.props("graft.frontier.compactMinRows") = v
        case None => sys.props -= "graft.frontier.compactMinRows"
      }
    }
  }
}
