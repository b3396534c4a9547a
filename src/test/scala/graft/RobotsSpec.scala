package graft

import java.time.YearMonth

import graft.core.{Crawl, Robots}
import graft.corpus.{CorpusWriter, SyntheticWeb, WebSpec}
import graft.driver.CrawlLoop
import graft.frontier.Snapshots
import graft.sim.ReferenceSimulator
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  test("robots.txt parser: star group, comments, empty disallow") {
    val txt =
      """# robots
        |User-agent: Googlebot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /p/comment
        |Disallow: /home/   # trailing comment
        |Disallow:
        |""".stripMargin
    val rules = Robots.parseRobotsTxt("h.com", txt)
    assert(rules == Vector(Robots.Rule("h.com", "/p/comment"),
      Robots.Rule("h.com", "/home/")))
    val idx = Robots.index(rules)
    assert(!Robots.isAllowed(idx, "http://h.com/p/comment?pid=1&pn=1&tid=2"))
    assert(!Robots.isAllowed(idx, "http://h.com/home/main?un=user3"))
    assert(Robots.isAllowed(idx, "http://h.com/p/123"))
    assert(Robots.isAllowed(idx, "http://other.com/p/comment?x=1"))
  }

  test("engine ≡ oracle under robots gating; blocked urls never fetched") {
    val spec = WebSpec(nForums = 2, indexPagesPerForum = 2,
      postsPerIndexPage = 5, maxRepliesPerPost = 3, commentsPerPage = 3,
      maxCommentPages = 2, nHosts = 4, nUsers = 30)
    val cfg = Crawl.CrawlConfig(YearMonth.of(2019, 1), YearMonth.of(2019, 12),
      YearMonth.of(2019, 6), indexPageBudget = 1, perHostBudget = 6,
      maxRounds = 30, obeyRobots = true)
    // block comment pages on tieba0 and all homepages on tieba1
    val robots = Robots.index(
      Robots.parseRobotsTxt("tieba0.example.com",
        "User-agent: *\nDisallow: /p/comment") ++
        Robots.parseRobotsTxt("tieba1.example.com",
          "User-agent: *\nDisallow: /home/"))
    val seeds = SyntheticWeb.seeds(spec, 2)

    val sim = ReferenceSimulator.run(spec, seeds, cfg, robots)
    assert(sim.fetchOrder.nonEmpty)
    // oracle sanity: nothing fetched violates the rules
    sim.fetchOrder.foreach { case (_, u) =>
      assert(Robots.isAllowed(robots, u), u)
    }

    val spark = TestSpark.spark
    val pagesPath = TestSpark.tmpDir("robots-pages")
    CorpusWriter.write(spark, spec, pagesPath, 4)
    val wh = TestSpark.tmpDir("robots-wh")
    CrawlLoop.run(spark, CorpusWriter.read(spark, pagesPath), seeds, cfg, wh,
      expectedUrls = 1L << 16, robots = robots)
    val engineFetches = Snapshots.readLatestTable(spark, wh, "fetch_log").get
      .filter("status = 'fetched'").select("round", "url").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(engineFetches == sim.fetchOrder.toSet)
    val engineSeen = Snapshots.readLatestTable(spark, wh, "seen_delta").get
      .collect().map(_.getLong(0)).toSet
    assert(engineSeen == sim.seen)
  }
}
