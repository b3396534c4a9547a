package graft

import java.time.YearMonth

import graft.core.Crawl
import graft.corpus.{CorpusWriter, SyntheticWeb, WebSpec}
import graft.driver.CrawlLoop
import graft.frontier.{BloomSeen, ShardedBloom, Snapshots}
import graft.sim.ReferenceSimulator
import org.scalatest.funsuite.AnyFunSuite

class ShardedBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shard routing covers the space and put/probe agree") {
    val shards = ShardedBloom.empty(40000, 0.01, numShards = 4)
    val vs = (0 until 10000).map(i =>
      graft.core.XxHash64.hashLong(i.toLong))
    vs.foreach(ShardedBloom.put(shards, _))
    assert(vs.forall(ShardedBloom.mightContain(shards, _)))
    // top-bit routing hits every shard on uniform hashes
    val used = vs.map(ShardedBloom.shardOf(_, 4)).toSet
    assert(used == Set(0, 1, 2, 3))
    // negative hashes route in range (unsigned top bits)
    assert((0 to 3).contains(ShardedBloom.shardOf(Long.MinValue, 4)))
    assert(ShardedBloom.shardOf(-1L, 4) == 3)
  }

  test("numShardsFor grows as powers of two past the shard-size cap") {
    assert(ShardedBloom.numShardsFor(1000) == 1)
    val singleBytes = BloomSeen.geometry(1L << 30, 0.01)._1 / 8 + 8
    assert(singleBytes > ShardedBloom.DefaultMaxShardBytes)
    val s = ShardedBloom.numShardsFor(1L << 30)
    assert(s > 1 && Integer.bitCount(s) == 1)
  }

  test("distributed shard build equals local build; merge equals union") {
    import spark.implicits._
    val hashes = (0 until 5000).map(i => graft.core.XxHash64.hashLong(i.toLong))
    val (a, na) = ShardedBloom.buildShardsWithCount(
      hashes.take(2500).toDF("url_hash"), "url_hash", 10000, numShards = 4)
    val (b, nb) = ShardedBloom.buildShardsWithCount(
      hashes.drop(2500).toDF("url_hash"), "url_hash", 10000, numShards = 4)
    assert(na == 2500 && nb == 2500)
    val local = ShardedBloom.empty(10000, 0.01, numShards = 4)
    hashes.foreach(ShardedBloom.put(local, _))
    val merged = ShardedBloom.mergeInto(a, b)
    assert(hashes.forall(ShardedBloom.mightContain(merged, _)))
    merged.zip(local).foreach { case (m, l) => assert(m.sameElements(l)) }
  }

  test("multi-shard crawl ≡ single-shard crawl (full engine parity)") {
    val spec = WebSpec(nForums = 2, indexPagesPerForum = 2,
      postsPerIndexPage = 4, maxRepliesPerPost = 2, commentsPerPage = 2,
      maxCommentPages = 1, nHosts = 3, nUsers = 20)
    val cfg = Crawl.CrawlConfig(
      startMonth = YearMonth.of(2019, 3), endMonth = YearMonth.of(2019, 8),
      today = YearMonth.of(2019, 6), indexPageBudget = 2, perHostBudget = 3,
      maxRounds = 30)
    val seeds = SyntheticWeb.seeds(spec, 2)
    val pagesPath = TestSpark.tmpDir("sb-pages")
    CorpusWriter.write(spark, spec, pagesPath, numPartitions = 2)
    val pages = CorpusWriter.read(spark, pagesPath)

    def crawlSeen(wh: String): Set[Long] = {
      CrawlLoop.run(spark, pages, seeds, cfg, wh, expectedUrls = 1L << 16)
      Snapshots.readLatestTable(spark, wh, "seen_delta")
        .get.collect().map(_.getLong(0)).toSet
    }
    val single = crawlSeen(TestSpark.tmpDir("sb-wh1"))
    val saved = sys.props.get("graft.bloom.maxShardBytes")
    val multiWh = TestSpark.tmpDir("sb-wh4")
    try {
      // force tiny shards: expectedUrls 2^16 at fpp 1% ≈ 78 KB of filter
      // → cap at 16 KB forces S = 8
      System.setProperty("graft.bloom.maxShardBytes", (16 * 1024).toString)
      assert(ShardedBloom.numShardsFor(1L << 16) >= 4)
      val multi = crawlSeen(multiWh)
      assert(multi == single)
      // snapshot carries one file per shard
      val dir = java.nio.file.Paths.get(Snapshots.snapDir(multiWh, 0))
      val stream = java.nio.file.Files.list(dir)
      val blooms = try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("bloom")).toSeq
      } finally stream.close()
      assert(blooms.size >= 4 && blooms.forall(_.matches("bloom-\\d{3}\\.bin")))
    } finally {
      saved match {
        case Some(v) => System.setProperty("graft.bloom.maxShardBytes", v)
        case None    => System.clearProperty("graft.bloom.maxShardBytes")
      }
    }
    // and it matches the oracle too
    val sim = ReferenceSimulator.run(spec, seeds, cfg)
    assert(single == sim.seen)
  }
}
