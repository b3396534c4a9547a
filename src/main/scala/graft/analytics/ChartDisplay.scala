package graft.analytics

import graft.sources.CsvCompat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's chart/search API display layer — the last reference
  * code path with no engine counterpart until round 3:
  *
  *  - `ChartData.get` (/root/reference/main/views.py:282-299) reads the
  *    analysis CSV bundle back and serves it as one JSON document of
  *    dict-of-lists: summary rows become (text, post-URL) pairs via the
  *    `https://tieba.baidu.com/p/%s#post_content_%s` template;
  *    keywords/sentiments/stats become insertion-ordered string→string
  *    dicts; tieba_count.csv becomes the top-20-by-count forum dict
  *    (read_analysis_from_csv, tieba_processing.py:131-171).
  *  - `KeywordSearchData.get` (views.py:301-320) splits the search input
  *    on whitespace, dedups preserving order, caps at 10 terms, and
  *    counts replies whose content matches each term
  *    (get_frequency_from_string_input, tieba_processing.py:174-191 —
  *    pandas `str.contains` is REGEX containment, mirrored here).
  *
  * Scale note: the JSON assembly collects — deliberately. The bundle is a
  * per-crawl-task artifact bounded by construction (top-k keywords, 3
  * sentiment rows, ≤20 forums, capped summary), so this is a display
  * shim over already-reduced data. The keyword-frequency SCAN, by
  * contrast, runs over the full replies table and stays distributed: a
  * single streamed aggregation pass with one foldable-regex counter per
  * (≤10) search term.
  */
object ChartDisplay {

  val UrlTemplate = "https://tieba.baidu.com/p/%s#post_content_%s"
  val MaxSearchTerms = 10
  val MaxForums = 20

  /** Distributed keyword-frequency core: (keyword, cnt) per search term,
    * zero-count terms preserved. ONE streamed aggregation pass over
    * replies with a per-term `sum(when(rlike(literal), 1))` column — the
    * ≤10 patterns are FOLDABLE literals, so each regex compiles once per
    * task instead of once per evaluated row (the r3 shape joined on a
    * non-foldable `content RLIKE keyword` column, recompiling the Pattern
    * rows × terms times across the full replies scan). No join at all:
    * the result is the one-row aggregate unpivoted to (keyword, cnt),
    * which preserves zero-count terms by construction. Matching is regex
    * containment, exactly pandas `str.contains(term, na=False)` on
    * non-null content. */
  def keywordFrequencyDF(replies: DataFrame, keywords: Seq[String]): DataFrame = {
    val spark = replies.sparkSession
    import spark.implicits._
    val terms = dedupCap(keywords)
    if (terms.isEmpty)
      return Seq.empty[(String, Long)].toDF("keyword", "cnt")
    val content = replies
      .filter(col("content").isNotNull && col("content") =!= "")
      .select(col("content"))
    val aggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("content").rlike(t), 1L).otherwise(0L)).as(s"c$i")
    }
    val counts = content.agg(aggs.head, aggs.tail: _*)
    // empty content ⇒ sums are null ⇒ zero-fill
    val pairs = terms.zipWithIndex.flatMap { case (t, i) =>
      Seq(lit(t), coalesce(col(s"c$i"), lit(0L)))
    }
    counts.select(explode(map(pairs: _*)).as(Seq("keyword", "cnt")))
  }

  /** API-shaped result: term → count in input order (python dict
    * insertion order), from one collect of the ≤10-row aggregate. */
  def keywordFrequency(replies: DataFrame, searchInput: String): Seq[(String, Long)] = {
    val terms = dedupCap(searchInput.trim.split("\\s+").toSeq)
    if (terms.isEmpty) return Seq.empty
    val counts = keywordFrequencyDF(replies, terms).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.map(t => t -> counts.getOrElse(t, 0L))
  }

  /** list(dict.fromkeys(input.split()))[:10] — order-preserving dedup
    * then cap (views.py:311-313). */
  def dedupCap(keywords: Seq[String]): Seq[String] =
    keywords.filter(_.nonEmpty).distinct.take(MaxSearchTerms)

  /** The ChartData payload as the JSON document the endpoint serves.
    * Reads the analysis bundle (and optionally tieba_count.csv) from
    * `dir` via the byte-compat CSV surface and shapes it exactly as
    * views.py:289-297 does. */
  def chartDataJson(spark: SparkSession, dir: String,
                    tiebaCountPath: Option[String] = None): String = {
    val b = CsvCompat.readAnalysisBundle(spark, dir)
    val summary = b.summary
      .orderBy(col("post_id"), col("reply_id"), col("summary"))
      .collect()
      .map(r => jarr(Seq(
        jstr(r.getString(0)),
        jstr(UrlTemplate.format(r.getString(1), r.getString(2))))))
    val keywords = b.keywords.orderBy(col("cnt").desc, col("keyword"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toString)
    val sentOrder = when(col("label") === "positive", 0)
      .when(col("label") === "negative", 1).otherwise(2)
    val sentiments = b.sentiments.orderBy(sentOrder)
      .collect().map(r => r.getString(0) -> r.getLong(1).toString)
    val stats = b.stats.orderBy(col("key"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val forums = tiebaCountPath.map { p =>
      CsvCompat.readTiebaCount(spark, p)
        .orderBy(col("cnt").desc, col("tieba"))
        .limit(MaxForums)
        .collect().map(r => r.getString(0) -> r.getInt(1).toString)
    }
    jobj(Seq(
      "summary" -> jarr(summary.toSeq),
      "keywords" -> jobj(keywords.toSeq.map { case (k, v) => k -> jstr(v) }),
      "sentiments" -> jobj(sentiments.toSeq.map { case (k, v) => k -> jstr(v) }),
      "stats" -> jobj(stats.toSeq.map { case (k, v) => k -> jstr(v) }),
      "forums" -> forums.map(f =>
        jobj(f.toSeq.map { case (k, v) => k -> jstr(v) })).getOrElse("null")))
  }

  // minimal JSON encoding (keys/values are engine-produced strings)
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  private def jarr(items: Seq[String]): String =
    items.mkString("[", ",", "]")
  private def jobj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
}
