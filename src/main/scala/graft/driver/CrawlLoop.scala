package graft.driver

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.core.Crawl
import graft.frontier.{BloomSeen, FrontierEntry, Snapshots, TieredFrontier}
import graft.round.CrawlRound
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-side fixpoint loop replacing the reference's Twisted reactor
  * (SURVEY.md §3.1 step 4): bounded iterative BFS = batch rounds with a
  * global barrier, NOT Structured Streaming.
  *
  * Every round commits an Iceberg-style snapshot (frontier, seen delta,
  * item deltas, cumulative Bloom, manifest-with-lineage). Reading the next
  * round's frontier back from the committed snapshot both breaks Spark
  * lineage (no ever-growing plan across iterations) and makes
  * cancel ≡ stop-after-round and resume ≡ load-latest-snapshot (T6/T7).
  */
object CrawlLoop {

  final case class CrawlSummary(rounds: Int, totalFetched: Long,
                                totalErrors: Long, totalDeduped: Long,
                                seenCount: Long)

  val CancelMarker = "CANCEL"

  /** Expected total URL count used to size the Bloom filter. At the 10^10
    * design point a single 1%-fpp Bloom is ~12 GB — too big for one
    * broadcast; the production layout shards the seen set by url_hash
    * range with one Bloom per shard and probes the matching shard
    * (documented in BASELINE.md); locally one filter suffices. */
  def run(spark: SparkSession,
          pages: DataFrame,
          seedUrls: Seq[String],
          cfg: Crawl.CrawlConfig,
          warehouse: String,
          expectedUrls: Long = 1L << 20,
          resume: Boolean = false,
          robots: Map[String, Vector[String]] = Map.empty): CrawlSummary = {
    import spark.implicits._

    val headCap = cfg.perHostBudget * TieredFrontier.HeadFactor

    val startRound: Int = Snapshots.latestCommittedRound(warehouse) match {
      case Some(r) if resume => r + 1
      case Some(_) =>
        sys.error(s"warehouse $warehouse already has snapshots; pass resume=true")
      case None =>
        // snapshot 0: seeds only (mirrors start_urls, PostSpider.py:40),
        // split into head (per-host top-headCap) and backlog overflow
        val epoch = new Timestamp(0L)
        // canonical-identity dedupe BEFORE gating (the oracle simulator
        // dedupes seeds via seen.add — duplicate or alias-canonical seeds
        // must not double-enqueue; ADVICE r1)
        val canonSeeds = seedUrls
          .map(u => graft.core.UrlCanon.canonicalize(u)).distinct
        val gatedSeeds =
          if (cfg.obeyRobots && robots.nonEmpty)
            canonSeeds.filter(u => graft.core.Robots.isAllowed(robots, u))
          else canonSeeds
        val seedEntries = gatedSeeds.map(u =>
          FrontierEntry.fromUrl(u, 0, 0, "", 0, epoch))
          .distinctBy(_.url_hash)
        import org.apache.spark.sql.functions.{col, lit, pmod, struct}
        val byHost = seedEntries.groupBy(_.host_hash).view.mapValues(
          _.sortBy(e => (e.priority, e.warc_ts.getTime, e.url_hash))).toMap
        val headSeeds = byHost.values.flatMap(_.take(headCap)).toSeq
        val overflowByHost = byHost.view.mapValues(_.drop(headCap))
          .filter(_._2.nonEmpty).toMap
        val overflowSeeds = overflowByHost.values.flatten.toSeq
        spark.createDataset(headSeeds).write.mode("overwrite")
          .parquet(TieredFrontier.headPath(warehouse, 0))
        if (overflowSeeds.nonEmpty)
          spark.createDataset(overflowSeeds)
            .withColumn("host_bucket", pmod(col("host_hash"),
              lit(CrawlRound.NumHostBuckets.toLong)).cast("int"))
            .write.mode("overwrite").partitionBy("host_bucket")
            .parquet(TieredFrontier.addPath(warehouse, 0))
        // host_state rows carry the backlog's per-host minimum key (the
        // head/backlog ordering invariant — see TieredFrontier)
        val hostState = overflowByHost.map { case (hh, ov) =>
          (hh, ov.size.toLong, ov.head.priority, ov.head.warc_ts,
            ov.head.url_hash)
        }.toSeq
        spark.createDataset(hostState)
          .toDF("host_hash", "backlog_count", "p", "t", "h")
          .select(col("host_hash"), col("backlog_count"),
            struct(col("p").as("priority"), col("t").as("warc_ts"),
              col("h").as("url_hash")).as("bmin"))
          .coalesce(1).write.mode("overwrite")
          .parquet(TieredFrontier.hostStatePath(warehouse, 0))
        spark.createDataset(seedEntries).select("url_hash")
          .write.mode("overwrite")
          .parquet(Snapshots.tablePath(warehouse, 0, "seen_delta"))
        val bloom = BloomSeen.empty(expectedUrls)
        seedEntries.foreach(e => BloomSeen.put(bloom, e.url_hash))
        Snapshots.writeBloom(warehouse, 0, bloom)
        Snapshots.writeManifest(warehouse, Snapshots.Manifest(0, -1,
          seedEntries.size.toLong, seedEntries.size.toLong, 0, 0, 0, Nil,
          headCount = headSeeds.size.toLong,
          backlogPending = overflowSeeds.size.toLong,
          backlogPhysRows = overflowSeeds.size.toLong, baseRound = -1))
        1
    }

    var round = startRound
    var totalFetched = 0L
    var totalErrors = 0L
    var totalDeduped = 0L
    // derived arithmetically per round: pending' = pending - selected + new
    var state: CrawlRound.FrontierState =
      Snapshots.readManifest(warehouse, round - 1) match {
        case Some(m) => CrawlRound.FrontierState(m.frontierCount, m.headCount,
          m.backlogPending, m.backlogPhysRows, m.baseRound)
        case None => CrawlRound.FrontierState(-1L, 0L, 0L, 0L, -1)
      }

    // the cumulative Bloom lives in driver memory across rounds (it is
    // merged here anyway); the per-round file write remains the resume
    // source of truth, but steady-state rounds never re-read it from disk
    var bloomBytes: Array[Byte] = null

    while (state.pending != 0L && round <= cfg.maxRounds &&
      !Files.exists(Paths.get(warehouse, CancelMarker))) {
      val prev = round - 1
      val head = TieredFrontier.readHead(spark, warehouse, prev)
      val seen = Snapshots.readTable(spark, warehouse, "seen_delta", prev)
        .getOrElse(spark.emptyDataset[Long].toDF("url_hash"))
      val bloom =
        if (bloomBytes != null) bloomBytes
        else Snapshots.readBloom(warehouse, prev)

      // the round writes fetched/misses/head/backlog deltas/host_state/
      // seen_delta itself; manifest below is the commit marker
      val tRound = System.nanoTime()
      val res = CrawlRound.run(spark, head, pages, seen, bloom, cfg,
        round, warehouse, state, expectedUrls, robots)
      if (sys.env.contains("GRAFT_ROUND_LOG"))
        println(f"[round $round%3d] fetched=${res.fetchedCount}%7d " +
          f"new=${res.newCount}%7d deduped=${res.dedupedCount}%7d " +
          f"ovfl=${res.overflowCount}%6d refill=${res.refillCount}%6d " +
          f"sec=${(System.nanoTime() - tRound) / 1e9}%6.1f")

      // incremental Bloom merge (north_rule "merge deltas at round
      // boundaries"): the round built this delta's Bloom DISTRIBUTED with
      // the cumulative filter's geometry; one bitwise OR here — the driver
      // never sees raw hashes, only two bitsets.
      val merged = res.deltaBloom match {
        case Some(delta) => BloomSeen.mergeInto(bloom, delta)
        case None        => bloom
      }
      Snapshots.writeBloom(warehouse, round, merged)
      bloomBytes = merged
      state = res.state

      // amortized backlog compaction: rewrite pending as a fresh base once
      // tombstones dominate (keeps refill scans and reader anti-joins
      // bounded without any per-round rewrite)
      val tombstones = state.backlogPhysRows - state.backlogPending
      if (state.backlogPhysRows > TieredFrontier.CompactMinRows &&
        tombstones > TieredFrontier.CompactFraction * state.backlogPhysRows) {
        val physAfter = TieredFrontier.compact(spark, warehouse, round,
          state.baseRound)
        state = state.copy(backlogPhysRows = physAfter, baseRound = round)
      }

      Snapshots.writeManifest(warehouse, Snapshots.Manifest(round, prev,
        state.pending, res.newCount, res.fetchedCount, res.errorCount,
        res.dedupedCount, res.lineage, headCount = state.headCount,
        backlogPending = state.backlogPending,
        backlogPhysRows = state.backlogPhysRows, baseRound = state.baseRound))

      totalFetched += res.fetchedCount
      totalErrors += res.errorCount
      totalDeduped += res.dedupedCount
      round += 1
    }

    val lastRound = round - 1
    // arithmetic, not a count job: seen = Σ per-round seen_delta counts
    // (an O(seen) scan here would grow with crawl age for a summary field)
    val seenCount = (0 to lastRound)
      .flatMap(Snapshots.readManifest(warehouse, _))
      .map(_.seenDeltaCount).sum
    CrawlSummary(lastRound, totalFetched, totalErrors, totalDeduped, seenCount)
  }

  /** Final item tables (union of per-round deltas at the latest snapshot). */
  def outputs(spark: SparkSession, warehouse: String): Map[String, DataFrame] =
    Snapshots.Tables.flatMap(t =>
      Snapshots.readLatestTable(spark, warehouse, t).map(t -> _)).toMap
}
