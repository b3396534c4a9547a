package graft.core

/** Deterministic pseudo-text generator: hash-indexed word picks, no RNG
  * state, no wall clock — every call is a pure function of (key, length)
  * so corpus generation is reproducible across JVMs and partitions
  * (FIXTURES.md §1: seed-42, hash-of-id generation).
  *
  * The vocabulary deliberately includes sentiment-marker words (exercised
  * by the sentiment bucketing A3), multi-char keywords (keyword top-k A1/A2
  * with the len>1 filter P9) and single-char tokens (filtered out by P9).
  */
object DetText {

  val Positive: Set[String] = Set("好棒", "优秀", "喜欢", "精彩", "满意", "great", "happy")
  val Negative: Set[String] = Set("糟糕", "失望", "讨厌", "无聊", "难受", "awful", "sad")

  private val vocab: Array[String] = Array(
    "数据", "引擎", "爬虫", "论坛", "回复", "评论", "用户", "内容", "分析", "关键词",
    "spark", "scala", "crawl", "frontier", "bloom", "filter", "shuffle",
    "partition", "broadcast", "window", "好棒", "优秀", "喜欢", "精彩", "满意",
    "great", "happy", "糟糕", "失望", "讨厌", "无聊", "难受", "awful", "sad",
    "的", "了", "呀", "吧", "很", "太", "真", "是",
    "帖子", "楼主", "沙发", "围观", "转发", "点赞", "收藏", "热议",
    "query", "plan", "join", "scan", "sort", "limit", "merge", "round",
    "快来", "大家", "今天", "明天", "已经", "可以", "为什么", "怎么样"
  )

  @inline private def pick(key: Long, i: Int): String =
    vocab(((XxHash64.hashLong(key + i * 0x9e3779b97f4a7c15L) >>> 1) % vocab.length).toInt)

  /** `n` space-joined tokens, deterministic in `key`. */
  def words(key: Long, n: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(pick(key, i))
      i += 1
    }
    sb.toString
  }

  /** Multi-sentence text: `nSentences` sentences of 3..8 tokens joined by
    * the CJK full stop — the sentence delimiter the reference's summary
    * path splits on (tieba_processing.py:277). */
  def sentences(key: Long, nSentences: Int): String = {
    val sb = new StringBuilder
    var s = 0
    while (s < nSentences) {
      val k = XxHash64.hashLong(key ^ (s + 1).toLong)
      val n = 3 + ((k >>> 8) % 6).toInt
      if (s > 0) sb.append('。')
      sb.append(words(k, n))
      s += 1
    }
    sb.toString
  }
}
