package graft.round

import graft.core.{Crawl, UrlCanon}
import graft.frontier.{BloomSeen, FrontierEntry, PartitionLineage}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One crawl round as a declarative Dataset pipeline (north_rule):
  *
  *   canonicalize → (already canonical on insert) → per-host window rank ≤
  *   politeness budget → fetch (broadcast-join the bounded frontier slice
  *   against the pages table — ONE scan of pages, no shuffle of the big
  *   side) → extract via the shared pure [[Crawl.process]] → write item
  *   deltas → explode discovered links → Bloom pre-filter + exact anti-join
  *   vs the seen set → append to frontier.
  *
  * Scale notes (the 100 TB story):
  *  - the per-host `row_number` window shuffles ONLY the frontier (bounded
  *    by politeness budget × #hosts per round), never the pages table;
  *  - the fetch is `pages ⋈ broadcast(selected)` on (host_bucket, url):
  *    inner join with the small side broadcast, so Catalyst streams the
  *    pages scan with no shuffle, and when `pages` is disk-partitioned by
  *    `host_bucket` dynamic partition pruning skips every partition that
  *    holds no selected host;
  *  - discovered-link dedup is a groupBy on url (map-side partial agg),
  *    then a Bloom broadcast probe drops the overwhelmingly-seen majority
  *    before the exact anti-join touches the seen table (no false
  *    negatives ⇒ correctness unaffected — frontier/BloomSeen.scala).
  */
object CrawlRound {

  val NumHostBuckets = 64

  // UDF-facing DTOs (Seq-of-case-class is encoder-friendly)
  final case class LinkDto(url: String, depth: Int, priority: Int)
  final case class ProcessedPage(posts: Seq[Crawl.PostItem],
                                 replies: Seq[Crawl.ReplyItem],
                                 comments: Seq[Crawl.CommentItem],
                                 tieba_names: Seq[String],
                                 links: Seq[LinkDto],
                                 text: String)

  final case class RoundResult(newFrontier: DataFrame,
                               seenDelta: DataFrame,
                               posts: DataFrame,
                               replies: DataFrame,
                               comments: DataFrame,
                               tiebaNames: DataFrame,
                               fetchLog: DataFrame,
                               selectedCount: Long,
                               fetchedCount: Long,
                               errorCount: Long,
                               dedupedCount: Long,
                               lineage: Seq[PartitionLineage],
                               cleanup: () => Unit)

  def hostBucketOf(hostHash: Long): Int =
    (((hostHash % NumHostBuckets) + NumHostBuckets) % NumHostBuckets).toInt

  private val hostBucketUdf = udf((url: String) =>
    hostBucketOf(UrlCanon.hostHash(UrlCanon.host(url))))

  /** pages with a host_bucket column: pass-through when the corpus writer
    * already partitioned by it; derived otherwise (input_hint tables have
    * exactly the 5 contract columns). */
  def withHostBucket(pages: DataFrame): DataFrame =
    if (pages.columns.contains("host_bucket")) pages
    else pages.withColumn("host_bucket", hostBucketUdf(col("url")))

  def run(spark: SparkSession,
          frontier: Dataset[FrontierEntry],
          pages: DataFrame,
          seen: DataFrame, // single column url_hash: Long (exact set)
          bloom: Array[Byte],
          cfg: Crawl.CrawlConfig,
          round: Int): RoundResult = {
    import spark.implicits._

    // ---- politeness: per-host budget via window rank (W1) --------------
    val orderCols = Seq(col("priority"), col("warc_ts"), col("url_hash"))
    val w = Window.partitionBy(col("host_hash")).orderBy(orderCols: _*)
    val ranked = frontier.toDF().withColumn("rn", row_number().over(w))
    var selected = ranked.filter(col("rn") <= cfg.perHostBudget).drop("rn")
    var deferred = ranked.filter(col("rn") > cfg.perHostBudget).drop("rn")
    if (cfg.globalBudget > 0) {
      val capped = selected.orderBy(orderCols: _*).limit(cfg.globalBudget)
        .persist(StorageLevel.MEMORY_AND_DISK)
      deferred = deferred.unionByName(
        selected.join(capped.select("url_hash"), Seq("url_hash"), "left_anti"))
      selected = capped
    }
    val selectedP = selected
      .withColumn("host_bucket", pmod(col("host_hash"), lit(NumHostBuckets.toLong)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val selectedCount = selectedP.count()

    // ---- fetch: pages ⋈ broadcast(selected) on (host_bucket, url) ------
    val pagesB = withHostBucket(pages).select(
      col("host_bucket"), col("url"), col("warc_ts").as("page_warc_ts"),
      col("html"), col("text").as("page_text"))
    val hits = pagesB.join(
      broadcast(selectedP.select("host_bucket", "url", "url_hash",
        "host", "host_hash", "depth", "priority")),
      Seq("host_bucket", "url"))

    // ---- extract + emit via the shared pure function --------------------
    val cfgB = spark.sparkContext.broadcast(cfg)
    val processUdf = udf { (url: String, html: Array[Byte]) =>
      val o = Crawl.process(url, html, cfgB.value)
      ProcessedPage(o.posts, o.replies, o.comments, o.tiebaNames,
        o.links.map(l => LinkDto(l.url, l.depth, l.priority)), o.text)
    }
    val fetchedRows = hits
      .withColumn("out", processUdf(col("url"), col("html")))
      .withColumn("text_match", col("out.text") === col("page_text"))
      .withColumn("partition_id", spark_partition_id())
      .drop("html", "page_text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fetchedCount = fetchedRows.count()

    val misses = selectedP
      .join(broadcast(fetchedRows.select("url_hash")), Seq("url_hash"), "left_anti")
    val errorCount = selectedCount - fetchedCount

    // ---- item deltas ----------------------------------------------------
    val posts = fetchedRows.select(explode(col("out.posts")).as("p")).select(col("p.*"))
    val replies = fetchedRows.select(explode(col("out.replies")).as("r")).select(col("r.*"))
    val comments = fetchedRows.select(explode(col("out.comments")).as("c")).select(col("c.*"))
    val tiebaNames = fetchedRows
      .select(col("url").as("user_url"), explode(col("out.tieba_names")).as("tieba"))

    val fetchLog = fetchedRows.select(lit(round).as("round"), col("url"),
        col("url_hash"), col("host"), col("depth"),
        lit("fetched").as("status"), col("text_match"))
      .unionByName(misses.select(lit(round).as("round"), col("url"),
        col("url_hash"), col("host"), col("depth"), lit("miss").as("status"),
        lit(false).as("text_match")))

    // ---- frontier expansion ---------------------------------------------
    val urlHashUdf = udf((u: String) => UrlCanon.urlHash(u))
    val hostUdf = udf((u: String) => UrlCanon.host(u))
    val hostHashUdf = udf((h: String) => UrlCanon.hostHash(h))
    val rawLinks = fetchedRows.select(col("url").as("parent_url"),
        col("page_warc_ts").as("warc_ts"), explode(col("out.links")).as("l"))
      .select(col("l.url").as("url"), col("l.depth").as("depth"),
        col("l.priority").as("priority"), col("parent_url"), col("warc_ts"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val discoveredCount = rawLinks.count()

    // in-round dedup: one deterministic representative per url (min struct)
    val candidates = rawLinks
      .groupBy(col("url"))
      .agg(min(struct(col("priority"), col("warc_ts"), col("depth"),
        col("parent_url"))).as("m"))
      .select(col("url"), col("m.priority").as("priority"),
        col("m.warc_ts").as("warc_ts"), col("m.depth").as("depth"),
        col("m.parent_url").as("parent_url"))
      .withColumn("url_hash", urlHashUdf(col("url")))
      .withColumn("host", hostUdf(col("url")))
      .withColumn("host_hash", hostHashUdf(col("host")))
      .withColumn("discovered_round", lit(round))

    // Bloom pre-filter (broadcast probe), exact anti-join confirms suspects
    val probed = candidates.withColumn("maybe_seen",
      BloomSeen.mightContainCol(bloom, col("url_hash")))
    val definitelyNew = probed.filter(!col("maybe_seen")).drop("maybe_seen")
    val confirmedNew = probed.filter(col("maybe_seen")).drop("maybe_seen")
      .join(seen, Seq("url_hash"), "left_anti")
    val feCols = Seq("url", "url_hash", "host", "host_hash", "priority",
      "depth", "parent_url", "discovered_round", "warc_ts").map(col)
    val newEntries = definitelyNew.select(feCols: _*)
      .unionByName(confirmedNew.select(feCols: _*))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val newCount = newEntries.count()
    val dedupedCount = discoveredCount - newCount

    val newFrontier = deferred.select(feCols: _*).unionByName(newEntries)
    val seenDelta = newEntries.select(col("url_hash"))

    // ---- per-partition lineage ------------------------------------------
    val perPartition = fetchedRows.groupBy(col("partition_id"))
      .agg(count(lit(1)).as("fetched")).collect()
      .map(r => PartitionLineage(round, r.getInt(0), r.getLong(1), 0L, 0L))
      .toSeq
    val lineage = perPartition :+
      PartitionLineage(round, -1, 0L, dedupedCount, errorCount)

    val cleanup = () => {
      selectedP.unpersist(); fetchedRows.unpersist()
      rawLinks.unpersist(); newEntries.unpersist()
      ()
    }

    RoundResult(newFrontier, seenDelta, posts, replies, comments, tiebaNames,
      fetchLog, selectedCount, fetchedCount, errorCount, dedupedCount,
      lineage, cleanup)
  }
}
