package graft.core

/** robots.txt gating (north_rule politeness component). The reference runs
  * with `ROBOTSTXT_OBEY = False` (/root/reference/webcrawler/webcrawler/
  * settings.py:57), so the engine's default is OFF
  * (Crawl.CrawlConfig.obeyRobots = false) — but the stage exists and is
  * parity-tested when enabled.
  *
  * Scope: the `User-agent: *` group's `Disallow:` prefix rules (the subset
  * Scrapy's RobotsTxtMiddleware would enforce for an unnamed bot). Empty
  * Disallow means allow-all. Pure Scala; shared by engine and simulator.
  */
object Robots {

  final case class Rule(host: String, prefix: String)

  /** Parse one host's robots.txt: Disallow prefixes of the `*` group. */
  def parseRobotsTxt(host: String, txt: String): Vector[Rule] = {
    var inStar = false
    val out = Vector.newBuilder[Rule]
    txt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:")) {
        inStar = line.drop("user-agent:".length).trim == "*"
      } else if (inStar && lower.startsWith("disallow:")) {
        val p = line.drop("disallow:".length).trim
        if (p.nonEmpty) out += Rule(host, p)
      }
    }
    out.result()
  }

  /** Rules indexed by host for O(1) lookup in the filter stage. */
  def index(rules: Seq[Rule]): Map[String, Vector[String]] =
    rules.groupBy(_.host).view.mapValues(_.map(_.prefix).toVector).toMap

  /** Allowed iff no disallow-prefix of the url's host matches its
    * path+query. */
  def isAllowed(byHost: Map[String, Vector[String]], url: String): Boolean =
    UrlCanon.parse(url) match {
      case Some(p) =>
        byHost.get(p.host) match {
          case None => true
          case Some(prefixes) =>
            val pathQ = p.path + (if (p.query.isEmpty) "" else "?" + p.query)
            !prefixes.exists(pathQ.startsWith)
        }
      case None => true
    }
}
