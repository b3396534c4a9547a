package graft.core

/** Deterministic re-expressions of the reference's SnowNLP-based analytics
  * (reference: /root/reference/main/tieba_processing/tieba_processing.py:
  * 256-336). SnowNLP's Bayes sentiment model and TextRank are replaced by
  * seeded, pure, order-stable equivalents (SURVEY.md F15-F17): same
  * *shapes* (score in [0,1], top-5 keywords per reply, top-n sentence
  * summary), fully deterministic so golden tests are hermetic.
  */
object TextAnalysis {

  def tokens(text: String): Vector[String] =
    text.split("\\s+").filter(_.nonEmpty).toVector

  /** Sentiment in (0,1): Laplace-smoothed positive fraction over the
    * marker lexicon, hash-jittered for non-marker text so the three
    * buckets (>0.7 / <0.3 / else, tieba_processing.py:282-287) all
    * populate. Pure function of the text. */
  def sentiment(text: String): Double = {
    val toks = tokens(text)
    val pos = toks.count(DetText.Positive.contains)
    val neg = toks.count(DetText.Negative.contains)
    if (pos + neg > 0) (pos + 1).toDouble / (pos + neg + 2).toDouble
    else {
      // neutral-ish band with deterministic jitter
      0.3 + 0.4 * (((XxHash64.hashString(text) >>> 11) % 1000).toDouble / 1000.0)
    }
  }

  def sentimentBucket(text: String): String = {
    val s = sentiment(text)
    if (s > 0.7) "positive" else if (s < 0.3) "negative" else "neutral"
  }

  /** Top-k keywords of one text: frequency-ranked tokens, ties broken by
    * token (stable, unlike SnowNLP's float ranks). The len>1 filter (P9,
    * tieba_processing.py:293) is applied downstream, as in the reference. */
  def keywords(text: String, k: Int = 5): Vector[String] =
    tokens(text).groupBy(identity).view.mapValues(_.size).toVector
      .sortBy { case (tok, n) => (-n, tok) }
      .take(k).map(_._1)

  /** TextRank-flavored extractive summary of a 。-joined corpus: sentences
    * scored by mean corpus-frequency of their tokens (a degree-centrality
    * approximation of TextRank's stationary weights), top-n by
    * (score desc, first-position asc) — deterministic where the
    * reference's `list(set(summary))` is not (SURVEY.md §5.1). */
  def summary(bigText: String, n: Int): Vector[String] = {
    val sentences = bigText.split('。').toVector.filter(_.trim.nonEmpty)
    if (sentences.isEmpty) return Vector.empty
    val corpusFreq = sentences.flatMap(tokens).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    val scored = sentences.zipWithIndex.map { case (s, i) =>
      val toks = tokens(s)
      val score = if (toks.isEmpty) 0.0
        else toks.map(corpusFreq.getOrElse(_, 0.0)).sum / toks.size
      (s, score, i)
    }
    scored.sortBy { case (_, score, i) => (-score, i) }
      .take(n).map(_._1).distinct // set-dedup, canonical order
  }

  /** Reference's adaptive summary count: 1 per 5 replies + 1, capped at 5
    * (tieba_processing.py:313-318). */
  def summaryCount(replies: Long): Int =
    math.min((replies / 5).toInt + 1, 5)
}
