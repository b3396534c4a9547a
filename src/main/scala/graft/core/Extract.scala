package graft.core

import scala.util.matching.Regex

/** Pure HTML→fields extraction, replicating the reference spider's
  * CSS-selector projections as regex parsers over the page grammar
  * (reference: /root/reference/webcrawler/webcrawler/spiders/PostSpider.py):
  *
  *  - index pages  → posts (P1: PostSpider.py:54-76)
  *  - post pages   → replies incl. data-field JSON + bubble override
  *                   (P2/P3: PostSpider.py:93-127)
  *  - comment pages → comments + pager fold (P4/A9: PostSpider.py:141-152,202-209)
  *  - user homepages → followed/posting forum names (PostSpider.py:161-172)
  *
  * No Spark imports: unit-testable, shared verbatim by the distributed
  * engine (inside a UDF) and the single-threaded oracle simulator, and used
  * by the corpus generator to write the `text` column — which makes
  * "engine recomputes `text` from `html` byte-identically" an enforced,
  * test-checked contract rather than an accident.
  */
object Extract {

  final case class IndexPost(postId: String, title: String, replyNum: String,
                             authorHref: String, createTime: String,
                             lastReplyTime: String)
  final case class ReplyRow(replyId: String, commentNum: String, content: String,
                            authorHref: String, dateRaw: Option[String])
  final case class CommentRow(content: String, authorHref: String)

  final case class ParsedPage(kind: String,
                              posts: Vector[IndexPost] = Vector.empty,
                              replies: Vector[ReplyRow] = Vector.empty,
                              comments: Vector[CommentRow] = Vector.empty,
                              forumNames: Vector[String] = Vector.empty,
                              pagerNext: Int = 1,
                              text: String = "")

  object Kind {
    val Index = "index"; val Post = "post"; val CommentPage = "comment"
    val Home = "home"; val Unknown = "unknown"
  }

  /** Page kind from URL shape (mirrors the reference's four URL templates,
    * PostSpider.py:16-18 + author_home hrefs). */
  def kindOf(url: String): String = {
    val path = UrlCanon.parse(url).map(_.path).getOrElse("")
    if (path == "/f") Kind.Index
    else if (path == "/p/comment") Kind.CommentPage
    else if (path.startsWith("/p/")) Kind.Post
    else if (path.startsWith("/home/")) Kind.Home
    else Kind.Unknown
  }

  private val tidRe: Regex = """data-tid="([^"]*)"""".r
  private val titleRe: Regex = """<a class="j_th_tit"[^>]*>([^<]*)</a>""".r
  private val repNumRe: Regex = """<div class="threadlist_rep_num">([^<]*)</div>""".r
  private val idxAuthorRe: Regex = """<span class="tb_icon_author"><a href="([^"]*)"""".r
  private val createRe: Regex = """<span class="is_show_create_time">([^<]*)</span>""".r
  private val lastReplyRe: Regex = """<span class="threadlist_reply_date">([^<]*)</span>""".r
  private val dataFieldPostIdRe: Regex = """"post_id":"?(\d+)"?""".r
  private val dataFieldCommentNumRe: Regex = """"comment_num":"?(\d+)"?""".r
  private val postContentRe: Regex = """<div class="j_d_post_content">([^<]*)</div>""".r
  private val bubbleRe: Regex = """<div class="post_bubble_middle_inner">([^<]*)</div>""".r
  private val postAuthorRe: Regex = """<a class="p_author_name" href="([^"]*)"""".r
  private val tailInfoRe: Regex = """<span class="tail-info">([^<]*)</span>""".r
  private val lzlAuthorRe: Regex = """<a class="lzl_p_p" href="([^"]*)"""".r
  private val lzlContentRe: Regex = """<span class="lzl_content_main">([^<]*)</span>""".r
  private val pagerNextRe: Regex = """<div class="j_pager">.*?<a href="\?(\d+)">下一页</a>""".r
  private val ufItemRe: Regex = """<span class="u-f-item">([^<]*)</span>""".r
  private val nNameRe: Regex = """<a class="n_name" title="([^"]*)"""".r

  def parse(url: String, html: String): ParsedPage = kindOf(url) match {
    case Kind.Index       => parseIndex(html)
    case Kind.Post        => parsePost(html)
    case Kind.CommentPage => parseCommentPage(html)
    case Kind.Home        => parseHome(html)
    case k                => ParsedPage(kind = k)
  }

  def parseBytes(url: String, html: Array[Byte]): ParsedPage =
    parse(url, new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** The engine's page-text contract: what `pages.text` must equal when
    * recomputed from `pages.html`. */
  def extractText(url: String, html: Array[Byte]): String =
    parseBytes(url, html).text

  private def blocks(html: String, marker: String): Vector[String] = {
    val parts = html.split(Regex.quote(marker)).toVector
    if (parts.length <= 1) Vector.empty else parts.tail
  }

  private def first(re: Regex, s: String): Option[String] =
    re.findFirstMatchIn(s).map(_.group(1))

  private def all(re: Regex, s: String): Vector[String] =
    re.findAllMatchIn(s).map(_.group(1)).toVector

  private def parseIndex(html: String): ParsedPage = {
    val posts = blocks(html, """<li class="j_thread_list"""").map { b =>
      IndexPost(
        postId = first(tidRe, b).getOrElse("None"),
        // str(...).strip() coercion as at PostSpider.py:71-75: a missing
        // selector becomes the literal string "None"
        title = first(titleRe, b).getOrElse("None").trim,
        replyNum = first(repNumRe, b).getOrElse("None").trim,
        authorHref = first(idxAuthorRe, b).getOrElse("None"),
        createTime = first(createRe, b).getOrElse("None").trim,
        lastReplyTime = first(lastReplyRe, b).getOrElse("None").trim)
    }
    ParsedPage(Kind.Index, posts = posts,
      text = posts.map(_.title).mkString("\n"))
  }

  private def parsePost(html: String): ParsedPage = {
    val replies = blocks(html, """<div class="j_l_post"""").map { b =>
      val base = first(postContentRe, b).getOrElse("None").trim
      // bubble override, PostSpider.py:122-124: joined WITHOUT strip
      val bubble = all(bubbleRe, b).mkString("")
      val content = if (bubble != "") bubble else base
      val tails = all(tailInfoRe, b)
      ReplyRow(
        replyId = first(dataFieldPostIdRe, b).getOrElse("None"),
        commentNum = first(dataFieldCommentNumRe, b).getOrElse("None"),
        content = content,
        authorHref = first(postAuthorRe, b).getOrElse("None"),
        // reference takes the LAST tail-info text (PostSpider.py:100)
        dateRaw = tails.lastOption.map(_.trim))
    }
    ParsedPage(Kind.Post, replies = replies,
      text = replies.map(_.content).mkString("\n"))
  }

  private def parseCommentPage(html: String): ParsedPage = {
    val comments = blocks(html, """<div class="lzl_single_post"""").map { b =>
      CommentRow(
        content = all(lzlContentRe, b).mkString("").trim,
        authorHref = first(lzlAuthorRe, b).getOrElse("None").trim)
    }
    // A9 max-page fold: reference scans all pager anchors for 下一页 and
    // takes its href[1:], default 1 (PostSpider.py:202-209)
    val next = first(pagerNextRe, html).map(_.toInt).getOrElse(1)
    ParsedPage(Kind.CommentPage, comments = comments, pagerNext = next,
      text = comments.map(_.content).mkString("\n"))
  }

  private def parseHome(html: String): ParsedPage = {
    val following = all(ufItemRe, html)
    // posting names get the 吧 suffix appended (PostSpider.py:168)
    val posting = all(nNameRe, html).map(_ + "吧")
    val names = following ++ posting
    ParsedPage(Kind.Home, forumNames = names, text = names.mkString("\n"))
  }
}
