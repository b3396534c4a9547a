package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: a full crawl of a small deterministic synthetic web —
    * corpus synthesis → N rounds of (politeness-ranked fetch → extract →
    * frontier expansion with Bloom+exact seen filtering) → snapshot
    * commits — returning the crawled posts table. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.core.Crawl
    import graft.corpus.{CorpusWriter, SyntheticWeb, WebSpec}
    import graft.driver.CrawlLoop
    import java.time.YearMonth

    val spec = WebSpec(nForums = 2, indexPagesPerForum = 2,
      postsPerIndexPage = 5, maxRepliesPerPost = 3, commentsPerPage = 3,
      maxCommentPages = 2, nHosts = 4, nUsers = 30)
    val cfg = Crawl.CrawlConfig(
      startMonth = YearMonth.of(2019, 3), endMonth = YearMonth.of(2019, 8),
      today = YearMonth.of(2019, 6), indexPageBudget = 2, perHostBudget = 8,
      maxRounds = 30)
    val work = java.nio.file.Files.createTempDirectory("graft-entry").toString
    CorpusWriter.write(spark, spec, s"$work/pages")
    val pages = CorpusWriter.read(spark, s"$work/pages")
    CrawlLoop.run(spark, pages, SyntheticWeb.seeds(spec, 2), cfg,
      s"$work/warehouse", expectedUrls = 1L << 16)
    CrawlLoop.outputs(spark, s"$work/warehouse")("posts")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
