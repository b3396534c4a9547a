package graft.corpus

import graft.core.{DetText, Extract, UrlCanon, XxHash64}

/** Deterministic synthetic web in the shape of the reference's crawl tree
  * (forum index → posts → comment pages, plus user homepages — the four
  * URL templates at /root/reference/webcrawler/webcrawler/spiders/
  * PostSpider.py:16-18). Pure functions of ids: no RNG state, no wall
  * clock, so the corpus is identical across JVMs, partitions and runs
  * (FIXTURES.md §1).
  *
  * Pages enumerate densely: `pageAt(i)` for i in [0, pageCount) — this is
  * what lets the Spark generator produce the corpus as
  * `spark.range(pageCount).map(pageAt)` with zero shuffle and linear scale
  * (the 10^10-row design point is the same code path with more range
  * partitions).
  *
  * Hosts follow a geometric (Zipf-ish) distribution: host 0 carries ~half
  * of all forums — deliberately skewed so per-host politeness budgeting and
  * skew handling are exercised, not just configured.
  *
  * The `text` column is computed by calling the SAME extractor the engine
  * uses ([[Extract.extractText]]) — byte-identical recomputation is a
  * structural guarantee, verified again in tests.
  */
final case class WebSpec(nForums: Int,
                         indexPagesPerForum: Int,
                         postsPerIndexPage: Int = 50,
                         maxRepliesPerPost: Int = 6,
                         commentsPerPage: Int = 5,
                         maxCommentPages: Int = 2,
                         nHosts: Int = 16,
                         nUsers: Int = 500,
                         seed: Long = 42L,
                         contentScale: Int = 1,
                         hostSkew: Boolean = true) {
  require(postsPerIndexPage * indexPagesPerForum < PostsPerForumCap)
  private def PostsPerForumCap = 1000000
}

object SyntheticWeb {

  final case class PageRow(url: String, warcTs: java.sql.Timestamp,
                           html: Array[Byte], text: String, lang: String)

  private val Epoch = 1546300800000L // 2019-01-01T00:00:00Z

  @inline private def h(spec: WebSpec, parts: Long*): Long = {
    var acc = spec.seed
    parts.foreach(p => acc = XxHash64.hashLong(p, acc))
    acc
  }
  @inline private def mod(v: Long, m: Int): Int = (((v % m) + m) % m).toInt

  // ---- topology --------------------------------------------------------

  /** Geometric host assignment: P(host k) ≈ 2^-(k+1) → heavy skew
    * (exercises hot-host politeness); uniform when hostSkew=false
    * (throughput benchmarking). */
  def hostIdOfForum(spec: WebSpec, f: Long): Int =
    if (spec.hostSkew) {
      val z = java.lang.Long.numberOfTrailingZeros(h(spec, 1L, f))
      math.min(z, spec.nHosts - 1)
    } else mod(h(spec, 1L, f), spec.nHosts)

  def hostOfForum(spec: WebSpec, f: Long): String =
    s"tieba${hostIdOfForum(spec, f)}.example.com"

  def forumName(f: Long): String = s"forum$f"

  def indexUrl(spec: WebSpec, f: Long, pageIdx: Int): String = {
    val pn = if (pageIdx == 0) "" else s"&pn=${pageIdx * 50}"
    UrlCanon.canonicalize(
      s"http://${hostOfForum(spec, f)}/f?kw=${forumName(f)}&ie=utf-8$pn")
  }

  /** postId encodes its forum so the post-page host is derivable from the
    * URL alone: postId = (f+1)*1e6 + ordinal. */
  def postId(spec: WebSpec, f: Long, pageIdx: Int, slot: Int): Long =
    (f + 1) * 1000000L + pageIdx.toLong * spec.postsPerIndexPage + slot

  def forumOfPost(postId: Long): Long = postId / 1000000L - 1

  def postUrl(spec: WebSpec, pid: Long): String =
    UrlCanon.canonicalize(s"http://${hostOfForum(spec, forumOfPost(pid))}/p/$pid")

  def nReplies(spec: WebSpec, pid: Long): Int =
    mod(h(spec, 2L, pid), spec.maxRepliesPerPost + 1)

  def replyId(pid: Long, r: Int): Long = pid * 1000L + r

  def commentCount(spec: WebSpec, pid: Long, r: Int): Int =
    mod(h(spec, 3L, pid, r.toLong), spec.commentsPerPage * spec.maxCommentPages + 1)

  def nCommentPages(spec: WebSpec, pid: Long, r: Int): Int = {
    val c = commentCount(spec, pid, r)
    (c + spec.commentsPerPage - 1) / spec.commentsPerPage
  }

  def commentUrl(spec: WebSpec, pid: Long, rid: Long, pn: Int): String =
    UrlCanon.canonicalize(
      s"http://${hostOfForum(spec, forumOfPost(pid))}/p/comment?tid=$pid&pid=$rid&pn=$pn")

  def userOf(spec: WebSpec, key: Long): Int = mod(h(spec, 4L, key), spec.nUsers)

  def userHost(spec: WebSpec, u: Int): String = {
    val id = if (spec.hostSkew)
      math.min(java.lang.Long.numberOfTrailingZeros(h(spec, 5L, u.toLong)),
        spec.nHosts - 1).toInt
    else mod(h(spec, 5L, u.toLong), spec.nHosts)
    s"tieba$id.example.com"
  }

  def homeUrl(spec: WebSpec, u: Int): String =
    UrlCanon.canonicalize(s"http://${userHost(spec, u)}/home/main?un=user$u")

  def homeHref(spec: WebSpec, u: Int): String =
    s"http://${userHost(spec, u)}/home/main?un=user$u"

  // ---- per-post attributes ---------------------------------------------

  /** Month 1..12 of 2019 for create/last-reply; rendered in the messy
    * formats the date-normalization quirks (P5) must handle. */
  def createMonth(spec: WebSpec, pid: Long): Int = 1 + mod(h(spec, 6L, pid), 12)
  def lastReplyMonth(spec: WebSpec, pid: Long): Int =
    math.min(12, createMonth(spec, pid) + mod(h(spec, 7L, pid), 3))

  /** style 0: "2019-07"; style 1: "7-12" (month-day, year discarded by the
    * quirk); style 2: missing (span omitted → parser yields "None"). */
  def dateStr(month: Int, style: Int, day: Int): Option[String] = style match {
    case 0 => Some(f"2019-$month%02d")
    case 1 => Some(s"$month-$day")
    case _ => None
  }

  def createTimeStr(spec: WebSpec, pid: Long): Option[String] =
    dateStr(createMonth(spec, pid), mod(h(spec, 8L, pid), 3),
      1 + mod(h(spec, 9L, pid), 28))

  def lastReplyTimeStr(spec: WebSpec, pid: Long): Option[String] =
    dateStr(lastReplyMonth(spec, pid), mod(h(spec, 10L, pid), 3),
      1 + mod(h(spec, 11L, pid), 28))

  def title(spec: WebSpec, pid: Long): String = DetText.words(h(spec, 12L, pid), 4)

  def replyContent(spec: WebSpec, pid: Long, r: Int): String =
    DetText.sentences(h(spec, 13L, pid, r.toLong),
      spec.contentScale * (1 + mod(h(spec, 14L, pid, r.toLong), 3)))

  def bubbleContent(spec: WebSpec, pid: Long, r: Int): Option[String] =
    if (mod(h(spec, 15L, pid, r.toLong), 5) == 0)
      Some(DetText.words(h(spec, 16L, pid, r.toLong), 5))
    else None

  /** Reply tail-info date: ~1/4 absent (undated replies are KEPT by the
    * reference, PostSpider.py:104-105). Full format "2019-MM-dd hh:mm";
    * the caller slices [:7]. */
  def replyDateStr(spec: WebSpec, pid: Long, r: Int): Option[String] = {
    val k = h(spec, 17L, pid, r.toLong)
    if (mod(k, 4) == 0) None
    else {
      val m = 1 + mod(k >>> 8, 12)
      val d = 1 + mod(k >>> 16, 28)
      Some(f"2019-$m%02d-$d%02d 1${mod(k >>> 24, 10)}:3${mod(k >>> 32, 10)}")
    }
  }

  def commentContentParts(spec: WebSpec, pid: Long, r: Int, pn: Int, c: Int): Vector[String] = {
    val k = h(spec, 18L, pid, r.toLong, pn.toLong, c.toLong)
    val nParts = 1 + mod(k, 2)
    (0 until nParts).map(i => DetText.words(XxHash64.hashLong(k, i + 1), 3 + mod(k >>> (4 * i + 4), 4))).toVector
  }

  /** Forums a user follows / posts in (homepage content). */
  def userFollowing(spec: WebSpec, u: Int): Vector[String] = {
    val k = h(spec, 19L, u.toLong)
    val n = 1 + mod(k, 4)
    (0 until n).map(i => forumName(mod(XxHash64.hashLong(k, i), spec.nForums)) + "吧").toVector
  }

  def userPosting(spec: WebSpec, u: Int): Vector[String] = {
    val k = h(spec, 20L, u.toLong)
    val n = mod(k, 3)
    (0 until n).map(i => forumName(mod(XxHash64.hashLong(k, i + 100), spec.nForums))).toVector
  }

  // ---- HTML builders (grammar matched by graft.core.Extract) -----------

  def indexHtml(spec: WebSpec, f: Long, pageIdx: Int): String = {
    val sb = new StringBuilder("<html><body><ul id=\"thread_list\">\n")
    var slot = 0
    while (slot < spec.postsPerIndexPage) {
      val pid = postId(spec, f, pageIdx, slot)
      val author = userOf(spec, pid)
      sb.append(s"""<li class="j_thread_list" data-tid="$pid">""")
      sb.append(s"""<div class="threadlist_rep_num">${nReplies(spec, pid)}</div>""")
      sb.append(s"""<a class="j_th_tit" href="/p/$pid">${title(spec, pid)}</a>""")
      sb.append(s"""<span class="tb_icon_author"><a href="${homeHref(spec, author)}">user$author</a></span>""")
      sb.append("""<div class="threadlist_author">""")
      createTimeStr(spec, pid).foreach(d =>
        sb.append(s"""<span class="is_show_create_time">$d</span>"""))
      lastReplyTimeStr(spec, pid).foreach(d =>
        sb.append(s"""<span class="threadlist_reply_date">$d</span>"""))
      sb.append("</div></li>\n")
      slot += 1
    }
    sb.append("</ul>")
    if (pageIdx + 1 < spec.indexPagesPerForum)
      sb.append(s"""<div class="pager"><a href="/f?kw=${forumName(f)}&ie=utf-8&pn=${(pageIdx + 1) * 50}">下一页</a></div>""")
    sb.append("</body></html>")
    sb.toString
  }

  def postHtml(spec: WebSpec, pid: Long): String = {
    val sb = new StringBuilder("<html><body>\n")
    val n = nReplies(spec, pid)
    var r = 0
    while (r < n) {
      val rid = replyId(pid, r)
      val author = userOf(spec, rid)
      sb.append(s"""<div class="j_l_post" data-field='{"content":{"post_id":$rid,"comment_num":${commentCount(spec, pid, r)}}}'>""")
      sb.append(s"""<a class="p_author_name" href="${homeHref(spec, author)}">user$author</a>""")
      sb.append(s"""<div class="j_d_post_content"> ${replyContent(spec, pid, r)} </div>""")
      bubbleContent(spec, pid, r).foreach(b =>
        sb.append(s"""<div class="post_bubble_middle_inner">$b</div>"""))
      // three tail-info variants, all quirk-bearing (PostSpider.py:98-105):
      //  date present → last tail-info is the date; date absent but 楼
      //  marker present → "N楼" normalizes to the pinned current month;
      //  no tail-info at all → undated reply, KEPT by the reference
      replyDateStr(spec, pid, r) match {
        case Some(d) =>
          sb.append(s"""<span class="tail-info">${r + 1}楼</span>""")
          sb.append(s"""<span class="tail-info">$d</span>""")
        case None =>
          if (mod(h(spec, 23L, pid, r.toLong), 2) == 0)
            sb.append(s"""<span class="tail-info">${r + 1}楼</span>""")
      }
      sb.append("</div>\n")
      r += 1
    }
    sb.append("</body></html>")
    sb.toString
  }

  def commentHtml(spec: WebSpec, pid: Long, r: Int, pn: Int): String = {
    val total = commentCount(spec, pid, r)
    val pages = nCommentPages(spec, pid, r)
    val from = (pn - 1) * spec.commentsPerPage
    val until = math.min(total, pn * spec.commentsPerPage)
    val sb = new StringBuilder("<html><body>\n")
    var c = from
    while (c < until) {
      val author = userOf(spec, replyId(pid, r) * 100 + c)
      sb.append(s"""<div class="lzl_single_post">""")
      sb.append(s"""<a class="lzl_p_p" href="${homeHref(spec, author)}">user$author</a>""")
      commentContentParts(spec, pid, r, pn, c).foreach(p =>
        sb.append(s"""<span class="lzl_content_main">$p</span>"""))
      sb.append("</div>\n")
      c += 1
    }
    if (pn < pages)
      sb.append(s"""<div class="j_pager"><a href="?${pn + 1}">下一页</a></div>""")
    sb.append("</body></html>")
    sb.toString
  }

  def homeHtml(spec: WebSpec, u: Int): String = {
    val sb = new StringBuilder("<html><body>\n")
    userFollowing(spec, u).foreach(fn =>
      sb.append(s"""<span class="u-f-item">$fn</span>"""))
    userPosting(spec, u).foreach(fn =>
      sb.append(s"""<a class="n_name" title="$fn">$fn</a>"""))
    sb.append("</body></html>")
    sb.toString
  }

  // ---- dense enumeration -----------------------------------------------

  def nPosts(spec: WebSpec): Long =
    spec.nForums.toLong * spec.indexPagesPerForum * spec.postsPerIndexPage

  private def sectionSizes(spec: WebSpec): Array[Long] = Array(
    spec.nForums.toLong * spec.indexPagesPerForum, // index pages
    nPosts(spec), // post pages
    nPosts(spec) * (spec.maxRepliesPerPost + 1) * spec.maxCommentPages, // comment slots (sparse)
    spec.nUsers.toLong) // homepages

  def pageCount(spec: WebSpec): Long = sectionSizes(spec).sum

  def postIdAt(spec: WebSpec, ordinal: Long): Long = {
    val perForum = spec.indexPagesPerForum.toLong * spec.postsPerIndexPage
    val f = ordinal / perForum
    val rest = ordinal % perForum
    postId(spec, f, (rest / spec.postsPerIndexPage).toInt,
      (rest % spec.postsPerIndexPage).toInt)
  }

  /** Page at dense index i, or None for an invalid comment-page slot. */
  def pageAt(spec: WebSpec, i: Long): Option[PageRow] = {
    val sizes = sectionSizes(spec)
    if (i < sizes(0)) {
      val f = i / spec.indexPagesPerForum
      val k = (i % spec.indexPagesPerForum).toInt
      Some(mkRow(spec, indexUrl(spec, f, k), indexHtml(spec, f, k)))
    } else if (i < sizes(0) + sizes(1)) {
      val pid = postIdAt(spec, i - sizes(0))
      Some(mkRow(spec, postUrl(spec, pid), postHtml(spec, pid)))
    } else if (i < sizes(0) + sizes(1) + sizes(2)) {
      val j = i - sizes(0) - sizes(1)
      val perPost = (spec.maxRepliesPerPost + 1).toLong * spec.maxCommentPages
      val pid = postIdAt(spec, j / perPost)
      val rest = j % perPost
      val r = (rest / spec.maxCommentPages).toInt
      val pn = (rest % spec.maxCommentPages).toInt + 1
      if (r < nReplies(spec, pid) && pn <= nCommentPages(spec, pid, r))
        Some(mkRow(spec, commentUrl(spec, pid, replyId(pid, r), pn),
          commentHtml(spec, pid, r, pn)))
      else None
    } else {
      val u = (i - sizes(0) - sizes(1) - sizes(2)).toInt
      Some(mkRow(spec, homeUrl(spec, u), homeHtml(spec, u)))
    }
  }

  private def mkRow(spec: WebSpec, url: String, html: String): PageRow = {
    val bytes = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ts = new java.sql.Timestamp(Epoch + (h(spec, 21L, UrlCanon.urlHash(url)) >>> 1) % (365L * 24 * 3600 * 1000))
    val lang = if (mod(h(spec, 22L, UrlCanon.urlHash(url)), 20) == 0) "en" else "zh"
    // text column = engine extractor output, by construction (the
    // byte-identical per-row invariant from BASELINE.json input_hint)
    SyntheticWeb.PageRow(url, ts, bytes, Extract.extractText(url, bytes), lang)
  }

  /** Seed frontier: page-0 index URLs of the first `nSeeds` forums
    * (mirrors start_urls, PostSpider.py:40). */
  def seeds(spec: WebSpec, nSeeds: Int): Vector[String] =
    (0L until math.min(nSeeds, spec.nForums).toLong)
      .map(f => indexUrl(spec, f, 0)).toVector
}
