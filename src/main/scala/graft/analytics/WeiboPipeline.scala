package graft.analytics

import graft.core.WeiboClean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Weibo crawl+display pipeline re-expressed relationally
  * (reference: /root/reference/weibocrawler/weibo_crawler.py:88-163 and
  * /root/reference/main/weibo_processing/weibo_processing.py:54-71):
  *
  *  - S5: paged REST scan → a DataFrame of API-shaped card rows
  *  - P8: card_type == 9 filter
  *  - F8: the 9-step regex clean chain (byte-identical contract,
  *        graft.core.WeiboClean — exposed both as a UDF and as the
  *        equivalent chain of codegen'd regexp_replace columns)
  *  - S11/S12: one-record-per-file JSON sink shape and its read-back
  *    projection with the Chinese→english key rename (P13)
  */
object WeiboPipeline {

  val cleanUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => WeiboClean.clean(s))

  /** F8 as pure Column algebra (same patterns/order as the reference;
    * stays inside WholeStageCodegen, no UDF). */
  def cleanCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val steps: Seq[(String, String)] = Seq(
      "<br\\s*/>" -> "",
      "<img alt=\\[(.*?)\\](.*?)>" -> "[$1]",
      "<a\\s+href(.*?)>" -> "",
      "</\\s*a>" -> "",
      "<span(.*?)>" -> "",
      "</\\s*span>" -> "",
      "<a\\s+data-url(.*?)>" -> "[视频]",
      "<img(.*?)>" -> "",
      "\\\\t|:|：" -> "")
    steps.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
  }

  /** Filter + clean + project: the get_weibo loop body as one plan
    * (weibo_crawler.py:112-147). Input columns: card_type int, scheme,
    * mblog struct(id, created_at, text, attitudes_count, comments_count,
    * reposts_count), page int, idx int. */
  def processCards(cards: DataFrame): DataFrame =
    cards.filter(col("card_type") === 9)
      .select(
        col("page").cast("string").as("page"),
        col("idx").cast("string").as("weibo_idx"),
        col("scheme"),
        col("mblog.created_at").as("created_at"),
        col("mblog.id").cast("string").as("weibo_id"),
        col("mblog.text").as("raw_text"),
        cleanCol(col("mblog.text")).as("cleaned"),
        col("mblog.attitudes_count").cast("string").as("attitudes"),
        col("mblog.comments_count").cast("string").as("comments"),
        col("mblog.reposts_count").cast("string").as("reposts"))

  /** S11: the reference writes one JSON file per post named
    * `id-page-idx.json`; the logical content is preserved as a JSON-lines
    * dataset keyed by the same triple (file-per-record is an anti-pattern
    * on a distributed store; the key layout is the compat surface). */
  def toJsonRecords(processed: DataFrame): DataFrame =
    processed.select(
      concat_ws("-", col("weibo_id"), col("page"), col("weibo_idx"))
        .as("record_key"),
      to_json(struct(processed.columns.map(col): _*)).as("json"))

  /** S12/P13: read-back projection with english keys
    * (weibo_processing.py:69-70). */
  def displayProjection(records: DataFrame, spark: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("weibo_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("created_at",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cleaned",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("attitudes",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("comments",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("reposts",
        org.apache.spark.sql.types.StringType)))
    records.select(from_json(col("json"), schema).as("r"))
      .select(col("r.cleaned").as("text"), col("r.created_at").as("time"),
        col("r.attitudes").as("likes"), col("r.comments").as("comments"),
        col("r.reposts").as("reposts"), col("r.weibo_id").as("id"))
  }

  /** Deterministic API-shaped card table (S5 stand-in: no network in the
    * sandbox; shapes match m.weibo.cn getIndex cards). */
  def syntheticCards(spark: SparkSession, nPages: Int,
                     cardsPerPage: Int): DataFrame = {
    import spark.implicits._
    val rows = for {
      p <- 1 to nPages
      i <- 0 until cardsPerPage
    } yield {
      val h = graft.core.XxHash64.hashLong(p.toLong * 1000 + i)
      val cardType = if (math.floorMod(h, 4L) == 0L) 11 else 9
      val id = math.abs(h % 1000000000L)
      val text = s"""测试<span class="url-icon"><img alt=[赞] src="x.png"></span>""" +
        s"""<a href="/u/$id">@user</a>内容$id<br/>第${p}页:${i}条"""
      (cardType, s"https://m.weibo.cn/status/$id",
        (id.toString, s"2019-0${1 + (i % 9)}-1$i", text,
          (h % 100).toInt.abs, (h % 50).toInt.abs, (h % 25).toInt.abs),
        p, i)
    }
    rows.toDF("card_type", "scheme", "mblog_t", "page", "idx")
      .select(col("card_type"), col("scheme"), col("page"), col("idx"),
        struct(col("mblog_t._1").as("id"), col("mblog_t._2").as("created_at"),
          col("mblog_t._3").as("text"), col("mblog_t._4").as("attitudes_count"),
          col("mblog_t._5").as("comments_count"),
          col("mblog_t._6").as("reposts_count")).as("mblog"))
  }
}
