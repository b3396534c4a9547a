package graft

import java.time.YearMonth

import graft.analytics.TiebaAnalytics
import graft.core.{Crawl, TextAnalysis}
import graft.corpus.{SyntheticWeb, WebSpec}
import graft.sim.ReferenceSimulator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's analytics operators over real crawl output (simulator
  * run → replies/tieba tables → Spark analytics), asserting the semantics
  * distilled from tieba_processing.py. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val spec = WebSpec(nForums = 2, indexPagesPerForum = 2,
    postsPerIndexPage = 5, maxRepliesPerPost = 4, commentsPerPage = 3,
    maxCommentPages = 2, nHosts = 4, nUsers = 30)
  private val cfg = Crawl.CrawlConfig(YearMonth.of(2019, 1),
    YearMonth.of(2019, 12), YearMonth.of(2019, 6), indexPageBudget = 1,
    perHostBudget = 16, maxRounds = 30)

  private lazy val sim = ReferenceSimulator.run(spec,
    SyntheticWeb.seeds(spec, 2), cfg)

  private lazy val repliesDf = {
    import spark.implicits._
    sim.replies.map(r => (r.post_id, r.reply_id, r.content, r.comment_num))
      .toDF("post_id", "reply_id", "content", "comment_num")
  }

  test("sentiment buckets partition the reply count") {
    val counts = TiebaAnalytics.sentimentCounts(repliesDf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("positive", "negative", "neutral"))
    assert(counts.values.sum == sim.replies.size.toLong)
    // deterministic scorer: same text → same bucket
    assert(TextAnalysis.sentimentBucket("好棒 好棒") == "positive")
    assert(TextAnalysis.sentimentBucket("糟糕 失望 难受") == "negative")
  }

  test("keyword top-10: len>1 filter + deterministic tie-break") {
    val kws = TiebaAnalytics.keywordTop10(repliesDf).collect()
    assert(kws.length <= 10 && kws.nonEmpty)
    assert(kws.forall(_.getString(0).length > 1))
    // counts are non-increasing; ties sorted by keyword
    val pairs = kws.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sliding(2).forall {
      case Array((c1, k1), (c2, k2)) => c1 > c2 || (c1 == c2 && k1 < k2)
      case _ => true
    })
  }

  test("summary + containment join returns source rows containing summaries") {
    val res = TiebaAnalytics.summaryWithSources(repliesDf).collect()
    assert(res.nonEmpty)
    val contents = sim.replies.map(r => (r.post_id, r.reply_id) -> r.content).toMap
    res.foreach { r =>
      val content = contents((r.getString(1), r.getString(2)))
      assert(content == r.getString(0)) // emitted content column
    }
  }

  test("adaptive summary count: 1 per 5 replies, capped at 5") {
    assert(TextAnalysis.summaryCount(0) == 1)
    assert(TextAnalysis.summaryCount(9) == 2)
    assert(TextAnalysis.summaryCount(100) == 5)
  }

  test("forum counts = users-following counts; upsert merge = direct count") {
    import spark.implicits._
    val tn = sim.tiebaNames.toDF("user_url", "tieba")
    val direct = TiebaAnalytics.forumCounts(tn)
    // split users in half, count each, merge — must equal direct
    val users = sim.tiebaNames.map(_._1).distinct.sorted
    val (ua, ub) = users.splitAt(users.length / 2)
    val ca = TiebaAnalytics.forumCounts(tn.filter($"user_url".isin(ua: _*)))
    val cb = TiebaAnalytics.forumCounts(tn.filter($"user_url".isin(ub: _*)))
    val merged = TiebaAnalytics.countUpsert(ca, cb)
    val dm = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mm = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dm == mm)
    // top-20 slice ordered by count desc
    val top = TiebaAnalytics.topForums(direct).collect()
    assert(top.length <= 20)
    assert(top.sliding(2).forall {
      case Array(a, b) => a.getLong(1) >= b.getLong(1)
      case _ => true
    })
  }

  test("keyword frequency search: order-preserving dedup, cap 10, zero-fill") {
    val res = TiebaAnalytics.keywordFrequency(repliesDf,
      Seq("数据", "数据", "zzz_not_there", "引擎")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res.size == 3) // dedup
    assert(res("zzz_not_there") == 0L) // zero-fill
    // containment count matches a direct scan
    val direct = sim.replies.count(_.content.contains("数据")).toLong
    assert(res("数据") == direct)
    // cap at 10 distinct terms
    val many = TiebaAnalytics.keywordFrequency(repliesDf,
      (1 to 30).map(i => s"term$i"))
    assert(many.count() == 10)
  }
}
