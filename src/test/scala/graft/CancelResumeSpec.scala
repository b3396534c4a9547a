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
}
