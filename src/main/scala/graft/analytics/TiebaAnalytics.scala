package graft.analytics

import graft.core.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's pandas analytics layer (reference:
  * /root/reference/main/tieba_processing/tieba_processing.py:174-336)
  * re-expressed as Spark relational plans over the crawl output tables.
  *
  * Determinism deviations (documented per SURVEY.md §5.1): the reference's
  * corpus order is CSV-append (crawl emission) order and its summary dedup
  * is Python-set order; we pin the total order (post_id, reply_id) and
  * canonical (score, position) summary order.
  */
object TiebaAnalytics {

  private val sentimentBucketUdf = udf((t: String) => TextAnalysis.sentimentBucket(t))
  private val sentimentUdf = udf((t: String) => TextAnalysis.sentiment(t))
  private val keywordsUdf = udf((t: String) => TextAnalysis.keywords(t, 5))

  /** A3: sentiment bucket counts over non-null reply contents. All three
    * buckets always present (zero-filled), unlike value_counts. */
  def sentimentCounts(replies: DataFrame): DataFrame = {
    val spark = replies.sparkSession
    import spark.implicits._
    val counted = replies.na.drop(Seq("content"))
      .select(sentimentBucketUdf(col("content")).as("label"))
      .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    Seq("positive", "negative", "neutral").toDF("label")
      .join(counted, Seq("label"), "left")
      .select(col("label"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** A3 + F15 strengthened: bucket counts plus a per-bucket checksum of
    * the raw scores (⌊score·1000⌋ summed) — pins the scorer's exact
    * values, not just the bucket boundaries (all-neutral corpora would
    * otherwise make the bucket counts insensitive to the jitter kernel). */
  def sentimentStats(replies: DataFrame): DataFrame = {
    val spark = replies.sparkSession
    import spark.implicits._
    // one kernel invocation per row: the bucket is a pure threshold of the
    // score (TextAnalysis.sentimentBucket), so derive it as column algebra
    // instead of re-running the tokenize+hash kernel a second time
    val counted = replies.na.drop(Seq("content"))
      .select(sentimentUdf(col("content")).as("score"))
      .select(
        when(col("score") > 0.7, "positive")
          .when(col("score") < 0.3, "negative")
          .otherwise("neutral").as("label"),
        floor(col("score") * 1000).cast("long").as("milli"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"), sum(col("milli")).as("score_milli_sum"))
    Seq("positive", "negative", "neutral").toDF("label")
      .join(counted, Seq("label"), "left")
      .select(col("label"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("score_milli_sum"), lit(0L)).as("score_milli_sum"))
  }

  /** A1/A2/P9/O3: top-10 keywords — per-reply top-5 keyword extraction,
    * len>1 filter, explode, grouped count, top-10 with deterministic
    * tie-break (reference nlargest keep='first' pinned to keyword asc). */
  def keywordTop10(replies: DataFrame): DataFrame =
    replies.na.drop(Seq("content"))
      .select(explode(keywordsUdf(col("content"))).as("keyword"))
      .filter(length(col("keyword")) > 1)
      .groupBy(col("keyword")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("keyword"))
      .limit(10)

  /** Hard cap on the rows `summaryWithSources` will collect to the driver.
    * The reference's summary is a per-crawl-task operation over ONE forum's
    * replies (a bounded corpus); pointing it at an unbounded table should
    * fail with a clear contract error, not a driver OOM. */
  val SummaryCollectRowCap = 1000000L

  /** F17 + J2: adaptive top-n summary over the 。-joined corpus, then the
    * substring-containment join back to source replies
    * (tieba_processing.py:308-333).
    *
    * The corpus concat is inherently global and order-sensitive (A7): we
    * sort by (post_id, reply_id) and collect the bounded corpus to the
    * driver — same shape as the reference's single big_text string; the
    * scaling cut is that `summary` is a per-crawl-task operation over one
    * forum's replies, never the full 100 TB (SURVEY.md §7.4.3). The
    * collect is guarded by [[SummaryCollectRowCap]]: exceeding it is a
    * loud contract violation (caller must pre-slice to one task's corpus),
    * never a silent OOM. */
  def summaryWithSources(replies: DataFrame): DataFrame = {
    val spark = replies.sparkSession
    val nonNull = replies.na.drop(Seq("content"))
    // limit(cap+1) bounds the collect itself; length > cap ⇒ caller bug
    val ordered = nonNull.orderBy(col("post_id"), col("reply_id"))
      .select(col("content"))
      .limit((SummaryCollectRowCap + 1).toInt).collect().map(_.getString(0))
    require(ordered.length <= SummaryCollectRowCap,
      s"summaryWithSources: corpus exceeds $SummaryCollectRowCap rows — " +
        "summary is a per-crawl-task operation; slice to one task's " +
        "replies before calling (SURVEY.md §7.4.3)")
    val bigText = ordered.mkString("。") + (if (ordered.nonEmpty) "。" else "")
    val n = TextAnalysis.summaryCount(ordered.length.toLong)
    val summaries = TextAnalysis.summary(bigText, n)
    if (summaries.isEmpty)
      return nonNull.select(col("content").as("summary"), col("post_id"),
        col("reply_id")).limit(0)
    import spark.implicits._
    val summDf = summaries.toDF("summ")
    // containment theta-join, small side broadcast (J2)
    nonNull.join(broadcast(summDf), col("content").contains(col("summ")))
      .select(col("content").as("summary"), col("post_id"), col("reply_id"))
  }

  /** A4: stats row. */
  def stats(replies: DataFrame): DataFrame = {
    val spark = replies.sparkSession
    import spark.implicits._
    val n = replies.na.drop(Seq("content")).count()
    Seq(("replies_count", n)).toDF("key", "value")
  }

  /** A5/S7: forum counts from per-user distinct forum-name sets — count =
    * number of crawled users following the forum. Blank names dropped
    * (P12); the reference's unstripped-key increment bug
    * (pipelines.py:58) is NOT replicated — clean semantics, documented. */
  def forumCounts(tiebaNames: DataFrame): DataFrame =
    tiebaNames.filter(trim(col("tieba")) =!= "")
      .groupBy(col("tieba")).agg(count(lit(1)).as("cnt"))

  /** S7/J4: the read-merge-rewrite count upsert as an aggregate-merge:
    * existing ⊎ delta → grouped sum. */
  def countUpsert(existing: DataFrame, delta: DataFrame): DataFrame =
    existing.unionByName(delta)
      .groupBy(col("tieba")).agg(sum(col("cnt")).as("cnt"))

  /** O1/O2: top-20 forums by count desc (int sort, display slice),
    * name-asc tiebreak pinned. */
  def topForums(counts: DataFrame, top: Int = 20): DataFrame =
    counts.orderBy(col("cnt").cast("int").desc, col("tieba")).limit(top)

  /** J3/A8/U2/O6: keyword-frequency search — order-preserving dedup of at
    * most 10 user terms, per-term containment count (zero-filled). */
  def keywordFrequency(replies: DataFrame, terms: Seq[String]): DataFrame = {
    val spark = replies.sparkSession
    import spark.implicits._
    val distinctTerms = terms.distinct.take(10) // dict.fromkeys + cap (views.py:310-315)
    val termsDf = distinctTerms.toDF("term")
    val counted = replies.na.drop(Seq("content"))
      .crossJoin(broadcast(termsDf))
      .filter(col("content").contains(col("term")))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    termsDf.join(counted, Seq("term"), "left")
      .select(col("term"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
