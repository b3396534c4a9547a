package graft.core

import java.time.{LocalDate, YearMonth}

/** The reference's quirky month-granularity date predicate, re-expressed as
  * a pure function (reference: `compare_post_date` at
  * /root/reference/webcrawler/webcrawler/spiders/PostSpider.py:175-200).
  *
  * Normalization quirks replicated exactly:
  *  - `None` / empty / "None" → out of range (returns false)
  *  - no '-' in the string → "current month" (pinned to a config constant
  *    `today` for determinism; the reference uses wall-clock
  *    `time.localtime()` at PostSpider.py:183)
  *  - first '-'-field > 12 → parse as `%Y-%m` (e.g. "2019-07[-12 ...]" via
  *    the caller's `[:7]` slice at PostSpider.py:107)
  *  - first '-'-field ≤ 12 → month-day form like "7-12": YEAR IS HARDCODED
  *    to 2019 and the day is DISCARDED (PostSpider.py:189-191)
  *  - range test is `start ≤ d < end + 1 month` (PostSpider.py:193-197;
  *    the committed code re-parses already-parsed dates — a TypeError on
  *    the literal path, so we implement the *intended* month-range
  *    semantics, per SURVEY.md §7.4.5)
  *
  * Undated replies: the reference substitutes `self.start_date` (in range
  * by construction, PostSpider.py:105) — i.e. replies with no tail-info
  * date are KEPT. Exposed as [[undatedReplyInRange]].
  */
object TiebaDates {

  val HardcodedYear = 2019

  /** Normalize a raw scraped date string to a month, or None if unusable. */
  def normalize(raw: String, today: YearMonth): Option[YearMonth] = {
    if (raw == null) return None
    val s = raw.trim
    if (s.isEmpty || s == "None" || s == "[]") return None
    val parts = s.split('-')
    try {
      if (parts.length < 2) Some(today)
      else {
        val first = parts(0).trim.toInt
        if (first > 12) Some(YearMonth.of(first, parts(1).trim.toInt))
        else Some(YearMonth.of(HardcodedYear, first))
      }
    } catch { case _: Exception => None }
  }

  /** `start ≤ d < end + 1 month`, month granularity. */
  def inRange(raw: String, start: YearMonth, end: YearMonth,
              today: YearMonth): Boolean =
    normalize(raw, today) match {
      case Some(m) => !m.isBefore(start) && m.isBefore(end.plusMonths(1))
      case None    => false
    }

  /** Reference keeps replies whose date could not be scraped
    * (PostSpider.py:104-105: defaults to start_date, which is in range). */
  def replyInRange(raw: Option[String], start: YearMonth, end: YearMonth,
                   today: YearMonth): Boolean = raw match {
    case None => true
    // caller slices to 7 chars first, PostSpider.py:107
    case Some(s) => inRange(s.take(7), start, end, today)
  }

  def parseMonth(s: String): YearMonth = {
    val p = s.trim.split('-')
    YearMonth.of(p(0).toInt, p(1).toInt)
  }

  def monthStr(m: YearMonth): String = f"${m.getYear}%04d-${m.getMonthValue}%02d"

  def firstDay(m: YearMonth): LocalDate = m.atDay(1)
}
