package graft

import java.time.YearMonth

import graft.core.Crawl
import graft.corpus.{CorpusWriter, SyntheticWeb, WebSpec}
import graft.driver.CrawlLoop
import org.apache.spark.sql.SparkSession

/** Profiling helper: crawl-only run at a given parallelism over a
  * pre-generated corpus (generate with GRAFT_GEN=1). */
object CrawlOnly {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("GRAFT_CORES", "32").toInt
    val nForums = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORUMS", "300").toInt
    val pagesPath = sys.env.getOrElse("GRAFT_PAGES", "/tmp/graft-pages")
    // GRAFT_MASTER=spark://host:port runs against a real (standalone)
    // cluster — executor count/cores then come from spark-submit conf and
    // GRAFT_CORES only labels the report line.
    // GRAFT_CLUSTER=NxCxM boots local-cluster[N,C,M] via ClusterHarness
    // (the bench's real-executor-JVM mode) for deployment-shaped profiling.
    val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]")
    lazy val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE", cores.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("GRAFT_WSCG", "true"))
      .config("spark.sql.codegen.factoryMode",
        sys.env.getOrElse("GRAFT_CODEGEN", "FALLBACK"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAXPART", "16m"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_PQ_CODEC", "snappy"))
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("GRAFT_BATCH", "4096"))
      .getOrCreate()
    val s = sys.env.get("GRAFT_CLUSTER") match {
      case Some(cspec) =>
        val Array(n, c, m) = cspec.split('x').map(_.trim.toInt)
        ClusterHarness.clusterSession(n, c, m, "graft-crawlonly")
      case None => spark
    }
    s.sparkContext.setLogLevel("WARN")
    val spec = WebSpec(nForums = nForums, indexPagesPerForum = 2,
      postsPerIndexPage = 50,
      maxRepliesPerPost = sys.env.getOrElse("GRAFT_REPLIES", "4").toInt,
      commentsPerPage = 5, maxCommentPages = 1, nHosts = 64, nUsers = 20000,
      contentScale = sys.env.getOrElse("GRAFT_CONTENT", "1").toInt,
      hostSkew = sys.env.getOrElse("GRAFT_SKEW", "true").toBoolean)
    val cfg = Crawl.CrawlConfig(YearMonth.of(2019, 1), YearMonth.of(2019, 12),
      YearMonth.of(2019, 6), indexPageBudget = spec.indexPagesPerForum - 1,
      perHostBudget = sys.env.getOrElse("GRAFT_BUDGET", "16384").toInt,
      maxRounds = sys.env.getOrElse("GRAFT_MAXROUNDS", "12").toInt,
      verifyText = sys.env.getOrElse("GRAFT_VERIFY_TEXT", "true").toBoolean)
    if (sys.env.contains("GRAFT_GEN"))
      CorpusWriter.write(s, spec, pagesPath, numPartitions = 64)
    val pages = CorpusWriter.read(s, pagesPath)
    val wh = sys.env.get("GRAFT_WH") match {
      case Some(base) => java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "graft-crawlonly").toString
      case None => java.nio.file.Files.createTempDirectory("graft-crawlonly").toString
    }
    import scala.jdk.CollectionConverters._
    def cpuSec: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getProcessCpuTime / 1e9
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val (cpu0, gc0) = (cpuSec, gcMs)
    val t0 = System.nanoTime()
    val sum = CrawlLoop.run(s, pages, SyntheticWeb.seeds(spec, nForums),
      cfg, wh, expectedUrls = 1L << 22)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[crawlonly] cores=$cores fetched=${sum.totalFetched} " +
      f"sec=$sec%.1f pps=${sum.totalFetched / sec}%.1f " +
      f"cpu=${cpuSec - cpu0}%.1f gc_stw=${(gcMs - gc0) / 1000.0}%.1f")
    s.stop()
  }
}
