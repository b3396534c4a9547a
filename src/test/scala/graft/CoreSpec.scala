package graft

import java.time.YearMonth

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {

  // ---- UrlCanon ---------------------------------------------------------

  test("canonicalize lowercases scheme/host, strips fragment + default port") {
    assert(UrlCanon.canonicalize("HTTP://Tieba.Example.COM:80/p/123#frag") ==
      "http://tieba.example.com/p/123")
    assert(UrlCanon.canonicalize("https://a.com:443/x") == "https://a.com/x")
    assert(UrlCanon.canonicalize("https://a.com:8443/x") == "https://a.com:8443/x")
  }

  test("canonicalize sorts query params") {
    assert(UrlCanon.canonicalize("http://a.com/f?kw=x&ie=utf-8&pn=50") ==
      "http://a.com/f?ie=utf-8&kw=x&pn=50")
  }

  test("canonicalize resolves relative against base") {
    val base = "http://tieba0.example.com/f?kw=a&ie=utf-8"
    assert(UrlCanon.canonicalize("/p/42", base) == "http://tieba0.example.com/p/42")
    assert(UrlCanon.canonicalize("?2", base) == "http://tieba0.example.com/f?2")
  }

  test("canonicalize is idempotent (property sweep)") {
    for {
      host <- Seq("a.com", "B.Org", "tieba9.example.com", "x.com:8080")
      path <- Seq("", "/", "/p/1", "/f", "/home/main")
      q <- Seq("", "?b=2&a=1", "?kw=x&ie=utf-8", "?z=1&z=0")
    } {
      val u = s"http://$host$path$q"
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) == once, s"input=$u")
    }
  }

  // ---- XxHash64 ---------------------------------------------------------

  test("xxhash64 known vectors") {
    // deterministic + spread; self-consistency across input paths
    assert(XxHash64.hashString("") == XxHash64.hash(Array.emptyByteArray))
    assert(XxHash64.hashString("abc") != XxHash64.hashString("abd"))
    val long32 = "0123456789abcdef0123456789abcdef0123"
    assert(XxHash64.hashString(long32) != XxHash64.hashString(long32 + "x"))
  }

  // ---- TiebaDates quirks (P5) ------------------------------------------

  private val start = YearMonth.of(2019, 3)
  private val end = YearMonth.of(2019, 8)
  private val today = YearMonth.of(2019, 6)

  test("date quirks: None/empty out of range") {
    assert(!TiebaDates.inRange("None", start, end, today))
    assert(!TiebaDates.inRange("", start, end, today))
    assert(!TiebaDates.inRange("  ", start, end, today))
  }

  test("date quirks: no dash → pinned current month") {
    assert(TiebaDates.inRange("1楼", start, end, today)) // today=2019-06 in range
    assert(!TiebaDates.inRange("1楼", start, YearMonth.of(2019, 5),
      YearMonth.of(2019, 12))) // today outside
  }

  test("date quirks: month-day form hardcodes year 2019, discards day") {
    assert(TiebaDates.normalize("7-12", today).contains(YearMonth.of(2019, 7)))
    assert(TiebaDates.normalize("12-31", today).contains(YearMonth.of(2019, 12)))
  }

  test("date quirks: Y-m form + range is start ≤ d < end+1mo") {
    assert(TiebaDates.inRange("2019-03", start, end, today))
    assert(TiebaDates.inRange("2019-08", start, end, today)) // end month incl.
    assert(!TiebaDates.inRange("2019-09", start, end, today)) // end+1 excl.
    assert(!TiebaDates.inRange("2019-02", start, end, today))
  }

  test("undated replies are kept (PostSpider.py:104-105 asymmetry)") {
    assert(TiebaDates.replyInRange(None, start, end, today))
    assert(TiebaDates.replyInRange(Some("2019-07-12 10:30"), start, end, today))
    assert(!TiebaDates.replyInRange(Some("2019-09-12 10:30"), start, end, today))
  }

  // ---- WeiboClean (F8 byte-identical contract) ---------------------------

  test("weibo regex chain matches reference semantics") {
    assert(WeiboClean.clean("""hello<br/>world""") == "helloworld")
    assert(WeiboClean.clean("""<img alt=[笑cry] src="x.png">""") == "[笑cry]")
    assert(WeiboClean.clean("""<a href="/x">link</a>""") == "link")
    assert(WeiboClean.clean("""<span class="s">text</span>""") == "text")
    assert(WeiboClean.clean("""<a data-url="v.mp4">видео</a>""") == "[视频]видео")
    assert(WeiboClean.clean("""pic<img src="t.jpg">""") == "pic")
    // the reference's \\t pattern removes literal backslash-t, and both colons
    assert(WeiboClean.clean("""a\tb:c：d""") == "abcd")
    // order matters: a-href removed before generic img sweep
    assert(WeiboClean.clean("""x<a href="u"><img src="i"></a>y""") == "xy")
  }

  // ---- Extract fixtures --------------------------------------------------

  test("extract post page: bubble override + last tail-info date") {
    val html =
      """<div class="j_l_post" data-field='{"content":{"post_id":99,"comment_num":2}}'>
        |<a class="p_author_name" href="http://h/home/main?un=user1">u</a>
        |<div class="j_d_post_content"> base text </div>
        |<div class="post_bubble_middle_inner">bubble text</div>
        |<span class="tail-info">3楼</span><span class="tail-info">2019-07-02 10:11</span>
        |</div>""".stripMargin.getBytes("UTF-8")
    val p = Extract.parseBytes("http://h/p/7", html)
    assert(p.kind == Extract.Kind.Post)
    assert(p.replies.size == 1)
    val r = p.replies.head
    assert(r.replyId == "99" && r.commentNum == "2")
    assert(r.content == "bubble text") // bubble wins, unstripped join
    assert(r.dateRaw.contains("2019-07-02 10:11"))
  }

  test("extract comment page: joined spans + pager fold") {
    val html =
      """<div class="lzl_single_post"><a class="lzl_p_p" href="/home/main?un=user2">u</a>
        |<span class="lzl_content_main">aa</span><span class="lzl_content_main">bb</span></div>
        |<div class="j_pager"><a href="?3">下一页</a></div>""".stripMargin.getBytes("UTF-8")
    val p = Extract.parseBytes("http://h/p/comment?tid=1&pid=2&pn=2", html)
    assert(p.comments.map(_.content) == Vector("aabb"))
    assert(p.pagerNext == 3)
  }

  test("extract home page: posting names get 吧 suffix") {
    val html =
      """<span class="u-f-item">甲吧</span><a class="n_name" title="乙">乙</a>"""
        .getBytes("UTF-8")
    val p = Extract.parseBytes("http://h/home/main?un=user3", html)
    assert(p.forumNames == Vector("甲吧", "乙吧"))
  }

  // ---- generator/extractor round-trip (byte-identical text) -------------

  test("synthetic corpus text == recomputed extraction, all pages") {
    val spec = graft.corpus.WebSpec(nForums = 2, indexPagesPerForum = 2,
      postsPerIndexPage = 4, maxRepliesPerPost = 3, commentsPerPage = 3,
      maxCommentPages = 2, nHosts = 4, nUsers = 30)
    var i = 0L
    val n = graft.corpus.SyntheticWeb.pageCount(spec)
    var checked = 0
    while (i < n) {
      graft.corpus.SyntheticWeb.pageAt(spec, i).foreach { p =>
        assert(Extract.extractText(p.url, p.html) == p.text, s"url=${p.url}")
        checked += 1
      }
      i += 1
    }
    assert(checked > 50)
  }
}
