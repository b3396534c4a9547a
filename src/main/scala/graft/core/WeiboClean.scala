package graft.core

import java.util.regex.Pattern

/** The reference's 9-step regex chain that strips Weibo HTML down to plain
  * text (reference: /root/reference/weibocrawler/weibo_crawler.py:126-134).
  *
  * THIS IS THE BYTE-IDENTICAL TEXT-EXTRACTION CONTRACT for weibo-style
  * records: same patterns, same order, same replacement strings. Patterns
  * are Python `re` syntax; all nine translate 1:1 to java.util.regex
  * (non-greedy groups, `\s`, alternation behave identically here).
  *
  * Note the last step replicates the reference literally: it removes the
  * two-char sequence backslash-t (`r"\\t"`), not the TAB character — the
  * reference pattern `"\\t"` in a raw string matches a literal backslash
  * followed by 't'.
  */
object WeiboClean {
  // compiled once; Pattern is thread-safe
  private val steps: Array[(Pattern, String)] = Array(
    Pattern.compile("<br\\s*/>") -> "",
    Pattern.compile("<img alt=\\[(.*?)\\](.*?)>") -> "[$1]",
    Pattern.compile("<a\\s+href(.*?)>") -> "",
    Pattern.compile("</\\s*a>") -> "",
    Pattern.compile("<span(.*?)>") -> "",
    Pattern.compile("</\\s*span>") -> "",
    Pattern.compile("<a\\s+data-url(.*?)>") -> "[视频]",
    Pattern.compile("<img(.*?)>") -> "",
    Pattern.compile("\\\\t|:|：") -> ""
  )

  def clean(text: String): String = {
    var s = text
    var i = 0
    while (i < steps.length) {
      val (p, r) = steps(i)
      s = p.matcher(s).replaceAll(r)
      i += 1
    }
    s
  }
}
