package graft.round

import graft.core.{Crawl, UrlCanon}
import graft.frontier.{BloomSeen, FrontierEntry, PartitionLineage, Snapshots}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One crawl round as a declarative Dataset pipeline (north_rule):
  *
  *   canonicalize → (already canonical on insert) → per-host window rank ≤
  *   politeness budget → fetch (broadcast-join the bounded frontier slice
  *   against the pages table — ONE scan of pages, adaptively
  *   partition-pruned to the active host buckets) → extract via the shared
  *   pure [[Crawl.process]] → ONE `fetched` working-set write (item tables
  *   are views derived on read — see [[Snapshots]]) → explode discovered
  *   links → Bloom pre-filter + exact confirm vs the seen set → append
  *   to frontier.
  *
  * Scale/latency notes (the 100 TB story):
  *  - the per-host `row_number` window shuffles ONLY the frontier (bounded
  *    by politeness budget × #hosts per round), never the pages table;
  *  - the fetch is `pages ⋈ broadcast(selected)` on (host_bucket, url):
  *    inner join with the small side broadcast, pages streamed with no
  *    shuffle; when the frontier is small the scan is statically pruned to
  *    the disk partitions holding a selected host (literal IN);
  *  - the round's CRITICAL PATH is two jobs — the fetch+extract write and
  *    the frontier write. Everything else (lineage agg, miss log, seen
  *    delta, Bloom delta build, selected count) runs as concurrent Spark
  *    jobs off the critical path, and all bookkeeping counts are derived
  *    arithmetically (frontier' = frontier - selected + new), never by
  *    extra count jobs;
  *  - discovered-link dedup is a groupBy on url (map-side partial agg),
  *    then a Bloom broadcast probe drops the overwhelmingly-seen majority;
  *    suspects are confirmed WITHOUT shuffling the seen table (broadcast
  *    semi-join against a streaming seen scan — no false negatives ⇒
  *    correctness unaffected; see frontier/BloomSeen.scala).
  */
object CrawlRound {

  val NumHostBuckets = 64

  /** Static bucket pruning pays a small pre-job; only worth it when the
    * frontier is small enough that buckets are plausibly sparse. */
  val PruneThreshold = 100000L

  // UDF-facing DTOs (Seq-of-case-class is encoder-friendly)
  final case class LinkDto(url: String, depth: Int, priority: Int)
  final case class ProcessedPage(posts: Seq[Crawl.PostItem],
                                 replies: Seq[Crawl.ReplyItem],
                                 comments: Seq[Crawl.CommentItem],
                                 tieba_names: Seq[String],
                                 links: Seq[LinkDto],
                                 text: String)

  final case class RoundResult(selectedCount: Long,
                               fetchedCount: Long,
                               errorCount: Long,
                               discoveredCount: Long,
                               newCount: Long,
                               dedupedCount: Long,
                               frontierCount: Long,
                               deltaBloom: Option[Array[Byte]],
                               lineage: Seq[PartitionLineage])

  def hostBucketOf(hostHash: Long): Int =
    (((hostHash % NumHostBuckets) + NumHostBuckets) % NumHostBuckets).toInt

  /** pages with a host_bucket column: pass-through when the corpus writer
    * already partitioned by it; derived otherwise (input_hint tables have
    * exactly the 5 contract columns) via the native codegen'd expression —
    * no UDF on the pages scan. */
  def withHostBucket(pages: DataFrame): DataFrame =
    if (pages.columns.contains("host_bucket")) pages
    else {
      graft.expressions.UrlExpressions.registerHostBucket(
        pages.sparkSession, NumHostBuckets)
      pages.withColumn("host_bucket", expr("graft_host_bucket(url)"))
    }

  /** Runs the round and writes `fetched` / `misses` / `frontier` /
    * `seen_delta` into the round's snapshot dir (manifest is the caller's
    * commit). `prevFrontierCount` lets all output counts be derived without
    * count jobs; `expectedUrls` sizes the delta Bloom (same geometry as the
    * cumulative filter so the driver can OR-merge). */
  def run(spark: SparkSession,
          frontier: Dataset[FrontierEntry],
          pages: DataFrame,
          seen: DataFrame, // single column url_hash: Long (exact set)
          bloom: Array[Byte],
          cfg: Crawl.CrawlConfig,
          round: Int,
          warehouse: String,
          prevFrontierCount: Long,
          expectedUrls: Long,
          robots: Map[String, Vector[String]] = Map.empty): RoundResult = {

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    def path(table: String): String =
      Snapshots.tablePath(warehouse, round, table)

    val doLog = sys.env.contains("GRAFT_ROUND_LOG")
    var tPhase = System.nanoTime()
    def lap(tag: String): Unit = if (doLog) {
      val now = System.nanoTime()
      println(f"    [phase] $tag%-14s ${(now - tPhase) / 1e9}%6.2fs")
      tPhase = now
    }

    // ---- politeness: per-host budget via window rank (W1) --------------
    val orderCols = Seq(col("priority"), col("warc_ts"), col("url_hash"))
    val w = Window.partitionBy(col("host_hash")).orderBy(orderCols: _*)
    val ranked = frontier.toDF().withColumn("rn", row_number().over(w))
      .persist(StorageLevel.MEMORY_AND_DISK) // one window shuffle, reused
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
      .withColumn("host_bucket",
        pmod(col("host_hash"), lit(NumHostBuckets.toLong)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // adaptive static bucket pruning: one tiny pre-job when the frontier is
    // small (sparse buckets likely); full scan + join otherwise
    val pagesBase = withHostBucket(pages)
    val pagesPruned =
      if (prevFrontierCount >= 0 && prevFrontierCount < PruneThreshold) {
        val activeBuckets = selectedP.select("host_bucket").distinct()
          .collect().map(_.getInt(0)).sorted
        pagesBase.filter(
          col("host_bucket").isin(activeBuckets.map(Int.box).toSeq: _*))
      } else pagesBase
    lap("rank")

    // ---- fetch: pages ⋈ broadcast(selected) ----------------------------
    val pagesB = pagesPruned.select(
      col("host_bucket"), col("url"), col("warc_ts").as("page_warc_ts"),
      col("html"), col("text").as("page_text"))
    val hits = pagesB.join(
      broadcast(selectedP.select("host_bucket", "url", "url_hash",
        "host", "host_hash", "depth", "priority")),
      Seq("host_bucket", "url"))

    // ---- extract + emit via the shared pure function -------------------
    val cfgB = spark.sparkContext.broadcast(cfg)
    val processUdf = udf { (url: String, html: Array[Byte]) =>
      val o = Crawl.process(url, html, cfgB.value)
      ProcessedPage(o.posts, o.replies, o.comments, o.tiebaNames,
        o.links.map(l => LinkDto(l.url, l.depth, l.priority)), o.text)
    }
    // critical-path job #1: scan+join+extract, written exactly once;
    // every downstream consumer re-reads this bounded working set.
    // (dictionary encoding off: text/urls are unique per row — the encoder
    // would only buffer and fall back, the hottest write frame in JFR)
    hits
      .withColumn("out", processUdf(col("url"), col("html")))
      .withColumn("text_match", col("out.text") === col("page_text"))
      .withColumn("partition_id", spark_partition_id())
      .withColumn("round", lit(round))
      .drop("html", "page_text")
      .write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .parquet(path("fetched"))
    lap("fetch+extract")

    val fetched = spark.read.parquet(path("fetched"))

    // off-critical-path concurrent jobs
    val selectedCountF = Future { selectedP.count() }
    val lineageF = Future {
      fetched.groupBy(col("partition_id"))
        .agg(count(lit(1)).as("fetched"),
          sum(size(col("out.links"))).as("links")).collect()
    }
    val missesF = Future {
      selectedP
        .join(broadcast(fetched.select("url_hash")), Seq("url_hash"), "left_anti")
        .select(lit(round).as("round"), col("url"), col("url_hash"),
          col("host"), col("depth"))
        .write.mode("overwrite").parquet(path("misses"))
    }

    // ---- frontier expansion ---------------------------------------------
    // native Catalyst expressions (codegen'd, same kernels as the oracle)
    // for the per-link hot path — see graft.expressions.UrlExpressions
    graft.expressions.UrlExpressions.register(spark)
    val rawLinks = fetched.select(col("url").as("parent_url"),
        col("page_warc_ts").as("warc_ts"), explode(col("out.links")).as("l"))
      .select(col("l.url").as("url"), col("l.depth").as("depth"),
        col("l.priority").as("priority"), col("parent_url"), col("warc_ts"))

    // robots gate (T3) at ENQUEUE time: blocked urls never enter the
    // frontier or the seen set (default off — ROBOTSTXT_OBEY=False in the
    // reference); gating here keeps the frontier-count arithmetic exact.
    // Native codegen'd expression, not a UDF — this sits on the per-link
    // hot path when enabled.
    val gatedLinks =
      if (cfg.obeyRobots && robots.nonEmpty) {
        graft.expressions.UrlExpressions.registerRobots(spark, robots)
        rawLinks.filter(expr("graft_robots_allowed(url)"))
      } else rawLinks

    // in-round dedup: one deterministic representative per url (min struct)
    val candidates = gatedLinks
      .groupBy(col("url"))
      .agg(min(struct(col("priority"), col("warc_ts"), col("depth"),
        col("parent_url"))).as("m"))
      .select(col("url"), col("m.priority").as("priority"),
        col("m.warc_ts").as("warc_ts"), col("m.depth").as("depth"),
        col("m.parent_url").as("parent_url"))
      .withColumn("url_hash", expr("graft_url_hash(url)"))
      .withColumn("host", expr("graft_url_host(url)"))
      .withColumn("host_hash", expr("graft_url_hash(host)"))
      .withColumn("discovered_round", lit(round))

    // Bloom pre-filter (broadcast probe); suspects confirmed WITHOUT
    // shuffling the seen table (see class Scaladoc)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val probed = candidates.withColumn("maybe_seen",
      BloomSeen.mightContainCol(bloomBc, col("url_hash")))
    val definitelyNew = probed.filter(!col("maybe_seen")).drop("maybe_seen")
    val suspects = probed.filter(col("maybe_seen")).drop("maybe_seen")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // no forced broadcast hints: AQE picks broadcast when the suspect set
    // is small (the steady-state crawl case — the Bloom already dropped
    // the novel majority) and falls back to a shuffled join when a burst
    // round produces millions of suspects (forcing a driver-side
    // broadcast there serializes the round on the driver)
    val matchedSeen = seen
      .join(suspects.select("url_hash"), Seq("url_hash"), "left_semi")
    val confirmedNew = suspects
      .join(matchedSeen, Seq("url_hash"), "left_anti")
    val feCols = Seq("url", "url_hash", "host", "host_hash", "priority",
      "depth", "parent_url", "discovered_round", "warc_ts").map(col)
    val newEntries = definitelyNew.select(feCols: _*)
      .unionByName(confirmedNew.select(feCols: _*))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // critical-path job #2
    deferred.select(feCols: _*).unionByName(newEntries)
      .write.mode("overwrite").parquet(path("frontier"))
    lap("frontier-write")

    // delta Bloom + new count in ONE small job over the cached delta;
    // seen_delta persisted sorted for parquet min/max range pruning at scale
    val bloomCountF = Future {
      val agg = BloomSeen.bloomBuildUdaf(expectedUrls)
      val row = newEntries
        .agg(agg(col("url_hash")).as("b"), count(lit(1)).as("n")).collect()(0)
      (if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0)),
        row.getLong(1))
    }
    val seenWriteF = Future {
      newEntries.select(col("url_hash")).sortWithinPartitions(col("url_hash"))
        .write.mode("overwrite").parquet(path("seen_delta"))
    }

    val lineageRows = Await.result(lineageF, Duration.Inf)
    val selectedCount = Await.result(selectedCountF, Duration.Inf)
    val (deltaBloom, newCount) = Await.result(bloomCountF, Duration.Inf)
    Await.result(missesF, Duration.Inf)
    Await.result(seenWriteF, Duration.Inf)
    lap("await-side")

    val fetchedCount = lineageRows.map(_.getLong(1)).sum
    val discoveredCount = lineageRows.map(_.getLong(2)).sum
    // Contract: `pages` has unique (host_bucket, url) rows — the corpus
    // writer guarantees it and the generator derives urls from unique ids.
    // A duplicate page row would multiply join hits and drive this
    // negative, silently corrupting the driver loop's termination
    // arithmetic, so fail loudly instead (ADVICE r1).
    val errorCount = selectedCount - fetchedCount
    require(errorCount >= 0,
      s"round $round: fetched ($fetchedCount) > selected ($selectedCount); " +
        "pages table violates the unique-(host_bucket,url) contract")
    val dedupedCount = discoveredCount - newCount
    // frontier' = frontier - selected + new: no count job
    val frontierCount = prevFrontierCount - selectedCount + newCount

    val lineage = lineageRows.map(r =>
      PartitionLineage(round, r.getInt(0), r.getLong(1), 0L, 0L)).toSeq :+
      PartitionLineage(round, -1, 0L, dedupedCount, errorCount)

    ranked.unpersist(); selectedP.unpersist(); newEntries.unpersist()
    suspects.unpersist()

    RoundResult(selectedCount, fetchedCount, errorCount, discoveredCount,
      newCount, dedupedCount, frontierCount, deltaBloom, lineage)
  }
}
